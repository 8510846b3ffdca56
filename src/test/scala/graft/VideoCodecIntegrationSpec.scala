package graft

import org.apache.spark.sql.functions._

import graft.llm.{FrameDecoder, Multimodal}

/** Real-codec SPI integration proof (docs/frame-decoder-plugin.md §5).
  *
  * Runs GREEN by default since round 12: the in-tree MJPEG-in-MP4
  * decoder ([[graft.examples.Mp4MjpegFrameDecoder]] — a real ISO-BMFF
  * container parser over the JDK's JPEG reader, registered through the
  * same `META-INF/services` entry a deployment ships) decodes a
  * generated real mp4 fixture end-to-end through the Spark plumbing
  * with `decode_ok = true`. A deployment proving ITS codec/container
  * (H.264, webm, …) still points `GRAFT_TEST_VIDEO` at a sample file
  * with its plugin jar on the test classpath — the same assertions then
  * run against that container instead of the fixture. */
class VideoCodecIntegrationSpec extends SparkSpec {

  private def testVideo(): String =
    sys.env.get("GRAFT_TEST_VIDEO").getOrElse {
      val p = java.nio.file.Files.createTempFile("graft-codec", ".mp4")
      graft.examples.Mp4MjpegFixture.write(p,
        Seq(16, 48, 80, 112, 144, 176, 208, 240))
      p.toString
    }

  test("a real codec plugin decodes a real mp4 container with decode_ok=true") {
    val path = testVideo()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    // the plugin must claim the container directly (SPI contract) …
    val direct = FrameDecoder.registered
      .flatMap(_.decodeFrames(bytes, 4)).headOption
    assert(direct.nonEmpty,
      s"no registered FrameDecoder handles $path — is the plugin " +
        "jar on the test classpath with its META-INF/services entry?")
    // … and the frames must flow through the full Spark path
    import spark.implicits._
    val mm = Multimodal.asMedia(
      Seq((1L, bytes)).toDF("id", "bin"), "id", "bin", "video", "video/mp4")
    val out = Multimodal.sampleFrames(mm, n = 4)
      .orderBy("frame_index").collect()
    assert(out.length == 4)
    assert(out.forall(_.getBoolean(3)), "decode_ok must be true for all frames")
    val idx = out.map(_.getInt(2)).toSeq
    assert(idx == idx.sorted && idx.distinct.size == idx.size,
      s"frame indices must ascend without repeats, got $idx")
    assert(out.forall(r => r.getFloat(4) >= 0f && r.getFloat(4) <= 1f),
      "luminance must lie in [0,1]")
    assert(out.forall(_.getInt(1) == direct.get.head.frameCount),
      "frame_count must match the decoder's own report")
  }

  test("Mp4MjpegFrameDecoder parses the ISO-BMFF sample tables directly") {
    val p = java.nio.file.Files.createTempFile("graft-mp4-direct", ".mp4")
    graft.examples.Mp4MjpegFixture.write(p,
      Seq(16, 48, 80, 112, 144, 176, 208, 240))
    val bytes = java.nio.file.Files.readAllBytes(p)
    val frames = new graft.examples.Mp4MjpegFrameDecoder()
      .decodeFrames(bytes, 4)
    assert(frames.nonEmpty, "decoder must claim its own container")
    val fs = frames.get
    assert(fs.map(_.frameCount) == Seq(8, 8, 8, 8))
    assert(fs.map(_.frameIndex) == Seq(0, 2, 4, 6))
    // uniform-gray frames brighten monotonically; the JPEG round-trip
    // moves levels slightly but preserves order and rough magnitude
    val lums = fs.map(_.luminance)
    assert(lums == lums.sorted && lums.distinct.size == 4, lums.toString)
    fs.zip(Seq(16, 80, 144, 208)).foreach { case (f, g) =>
      assert(math.abs(f.luminance - g / 255.0f) < 0.08f,
        s"frame ${f.frameIndex}: luminance ${f.luminance} vs gray $g")
    }
    // SPI contract: foreign bytes are declined, not errored
    val dec = new graft.examples.Mp4MjpegFrameDecoder()
    assert(dec.decodeFrames("RIFF not an mp4 at all".getBytes, 4).isEmpty)
    assert(dec.decodeFrames(Array.emptyByteArray, 4).isEmpty)
    // … including a structurally-valid mp4 whose video is NOT MJPEG:
    // flip the stsd sample-entry format fourcc to avc1 and re-offer
    val avc1 = bytes.clone()
    val jpegAt = {
      // find the 'jpeg' sample-entry fourcc inside moov (after mdat, so
      // the search from the mdat end cannot hit JPEG payload bytes)
      val s = new String(avc1.map(b => (b & 0x7f).toChar))
      s.lastIndexOf("jpeg")
    }
    assert(jpegAt > 0)
    "avc1".getBytes("US-ASCII").copyToArray(avc1, jpegAt)
    assert(dec.decodeFrames(avc1, 4).isEmpty,
      "a non-MJPEG mp4 must be declined to the stub, not decoded")
  }
}
