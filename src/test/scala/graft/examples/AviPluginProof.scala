package graft.examples

import org.apache.spark.sql.SparkSession

import graft.llm.Multimodal

/** Forked-JVM half of FrameDecoderPluginSpec: a fresh Spark session that
  * receives the plugin jar the DEPLOYMENT way (`SparkContext.addJar` →
  * executor mutable classloader → task-thread context classloader; the
  * jar is NOT on this JVM's system classpath, and the SPI registration
  * file exists nowhere else) and asserts real decoded frames flow out of
  * [[Multimodal.sampleFrames]]. Exits non-zero on any failure; prints
  * the marker line only after every assertion passed. */
object AviPluginProof {

  def main(args: Array[String]): Unit = {
    val Array(jarPath, aviPath) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      spark.sparkContext.addJar(jarPath)
      // precondition probe, run BEFORE anything can initialize the
      // per-JVM FrameDecoder.registered lazy: the first task fetches the
      // added jar into the executor's mutable classloader, and this
      // asserts the SPI registration is visible from a task thread's
      // CONTEXT loader — the exact lookup the library performs. If this
      // fails, the environment never delivered the jar and the
      // decode_ok assertion below would misdiagnose the classloader fix.
      // count only registrations naming THIS plugin's decoder: the test
      // resources ship a static services file (FakeVideoDecoder + the
      // mp4 example) that rides the forked classpath, so a bare
      // resource count would pass without the addJar'd jar
      val services = spark.sparkContext.parallelize(Seq(1), 1).map { _ =>
        val res = Thread.currentThread().getContextClassLoader
          .getResources("META-INF/services/graft.llm.FrameDecoder")
        var n = 0
        while (res.hasMoreElements) {
          val s = new String(res.nextElement().openStream().readAllBytes(),
            "UTF-8")
          if (s.contains("AviMjpegFrameDecoder")) n += 1
        }
        n
      }.collect().head
      assert(services >= 1,
        "addJar'd plugin jar not visible to the task context classloader")
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(aviPath))
      import spark.implicits._
      val mm = Multimodal.asMedia(Seq((1L, bytes)).toDF("id", "bin"),
        "id", "bin", "video", "video/avi")
      val out = Multimodal.sampleFrames(mm, n = 4)
        .orderBy("frame_index").collect()
      assert(out.length == 4, s"expected 4 sampled frames, got ${out.length}")
      assert(out.forall(_.getBoolean(3)),
        "decode_ok must be true — the SPI plugin did not engage")
      assert(out.forall(_.getInt(1) == 8),
        s"frame_count must be the container's 8, got ${out.map(_.getInt(1)).toSeq}")
      assert(out.map(_.getInt(2)).toSeq == Seq(0, 2, 4, 6),
        s"even 4-of-8 sampling expected, got ${out.map(_.getInt(2)).toSeq}")
      val lums = out.map(_.getFloat(4)).toSeq
      assert(lums == lums.sorted && lums.distinct.size == lums.size,
        s"fixture frames brighten monotonically; decoded $lums")
      assert(lums.head > 0.0f && lums.last < 1.0f, s"luminance range: $lums")
      println("PLUGIN-PROOF-OK")
    } finally spark.stop()
  }
}
