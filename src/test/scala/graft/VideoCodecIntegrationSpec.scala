package graft

import org.apache.spark.sql.functions._

import graft.llm.{FrameDecoder, Multimodal}

/** Real-codec SPI integration proof (docs/frame-decoder-plugin.md §5).
  *
  * Ignored by default: the core build is dependency-free, so no real
  * video codec exists on the CI classpath. A deployment proves its
  * plugin end-to-end by putting the plugin jar on the test classpath
  * and pointing `GRAFT_TEST_VIDEO` at a real container file (mp4/webm)
  * its decoder handles — the spec then asserts true decoded frames flow
  * through the full Spark plumbing with `decode_ok = true` and the
  * frame invariants every decoder must uphold. Without the env var the
  * test cancels (reported as canceled, never green-by-accident). */
class VideoCodecIntegrationSpec extends SparkSpec {

  test("a real codec plugin decodes GRAFT_TEST_VIDEO with decode_ok=true") {
    val path = sys.env.get("GRAFT_TEST_VIDEO")
    assume(path.nonEmpty,
      "set GRAFT_TEST_VIDEO=/path/to/sample.mp4 (with the codec plugin " +
        "jar on the test classpath) to run the real-codec integration proof")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path.get))
    // the plugin must claim the container directly (SPI contract) …
    val direct = FrameDecoder.registered
      .flatMap(_.decodeFrames(bytes, 4)).headOption
    assume(direct.nonEmpty,
      s"no registered FrameDecoder handles ${path.get} — is the plugin " +
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
}
