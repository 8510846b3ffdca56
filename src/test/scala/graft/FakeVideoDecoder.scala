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

  /** The clip-fingerprint hook: deterministic per-(frame, band)
    * luminance derived from the frame index — enough structure for
    * [[graft.llm.Multimodal.videoFingerprints]] to produce a stable,
    * content-dependent fingerprint through the SPI path. */
  override def decodeFrameBands(bytes: Array[Byte], n: Int, bands: Int)
      : Option[Seq[FrameDecoder.FrameBands]] = {
    if (bytes.length < Magic.length + 1 ||
        !bytes.take(Magic.length).sameElements(Magic)) None
    else {
      val fc = math.max(1, bytes(Magic.length) & 0xFF)
      Some((0 until n).map { i =>
        val fi = (i.toLong * fc / n).toInt
        FrameDecoder.FrameBands(fc, fi, Array.tabulate(bands)(b =>
          java.lang.Math.floorMod((fi * 31L + b) * 2654435761L, 1000L)
            / 1000.0f))
      })
    }
  }
}
