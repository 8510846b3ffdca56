package graft

import graft.llm.FrameDecoder

/** Test SPI decoder: "decodes" the synthetic GRAFTVID container (ASCII
  * magic + one frame-count byte + payload) — the stand-in for a real
  * codec plugin (JCodec/ffmpeg), registered the way a deployment would:
  * `src/test/resources/META-INF/services/graft.llm.FrameDecoder`.
  * Declines (None) anything without the magic, per the SPI contract. */
class FakeVideoDecoder extends FrameDecoder {
  private val Magic = "GRAFTVID".getBytes("US-ASCII")

  override def decodeFrames(bytes: Array[Byte], n: Int)
      : Option[Seq[FrameDecoder.Frame]] = {
    if (bytes.length < Magic.length + 1 ||
        !bytes.take(Magic.length).sameElements(Magic)) None
    else {
      val fc = math.max(1, bytes(Magic.length) & 0xFF)
      Some((0 until n).map { i =>
        val fi = (i.toLong * fc / n).toInt
        FrameDecoder.Frame(fc, fi, fi.toFloat / fc)
      })
    }
  }
}
