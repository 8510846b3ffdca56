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

  test("videoFingerprints through the real mp4 codec plugin: a rescaled " +
      "re-encode pairs, time-reversed content lands far") {
    import spark.implicits._
    def mp4(grays: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val p = java.nio.file.Files.createTempFile("graft-vfp", ".mp4")
      graft.examples.Mp4MjpegFixture.write(p, grays, w, h)
      java.nio.file.Files.readAllBytes(p)
    }
    val grays = Seq(30, 60, 90, 120, 150, 180, 210, 240)
    val rows = Seq(
      (1L, mp4(grays, 64, 48)),
      (2L, mp4(grays, 128, 96)), // same content, re-encoded at 2× size
      (3L, mp4(grays.reverse, 64, 48))) // time-reversed: distinct
    val mm = Multimodal.asMedia(rows.toDF("id", "bin"),
      "id", "bin", "video", "video/mp4")
    val fps = Multimodal.videoFingerprints(mm).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert((1L to 3L).forall(fps(_)._2),
      s"plugin must fingerprint real mp4: $fps")
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L)._1, fps(2L)._1) <= 3,
      s"rescaled mp4 moved ${ham(fps(1L)._1, fps(2L)._1)} bits")
    assert(ham(fps(1L)._1, fps(3L)._1) >= 16,
      s"reversed mp4 only ${ham(fps(1L)._1, fps(3L)._1)} bits apart")
    val pairs = Multimodal.videoNearDupPairs(mm, maxHamming = 3)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"expected exactly (1,2): $pairs")
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
