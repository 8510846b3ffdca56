package graft.tools

import org.apache.spark.sql.SparkSession

import graft.llm.Multimodal

/** Regenerates the reviewed golden parquet for the real image decoder
  * (`golden/decode_images.parquet`): [[Multimodal.decodeImages]] over the
  * reference's shipped fixture images, one row per file, keyed by
  * basename. Run + review + copy per golden/README.md — the golden file
  * is a pinned artifact, not a build output.
  *
  * Usage: `sbt "runMain graft.tools.GoldenDecode /tmp/golden_decode"`
  */
object GoldenDecode {

  /** The fixture images pinned by the golden parquet: every format family
    * the JDK decodes (JPEG/GIF/TIFF×2) plus the two deliberate
    * decode_ok=false fallbacks (WebP/JP2 — no JDK codec). */
  val FixtureFiles: Seq[String] = Seq(
    "regression_jpg.jpg", "regression_gif.gif", "regression_tiff.tiff",
    "hello_world_tiff.tif", "multipage_tiff_example.tif",
    "regression_webp.webp", "regression_openjpeg.jp2")

  val SrcDir = "/root/reference/tests/fixtures/src"

  def decodeFixtures(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = FixtureFiles.zipWithIndex.map { case (name, i) =>
      (i.toLong, name,
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(SrcDir, name)))
    }
    val media = Multimodal.asMedia(rows.toDF("id", "key", "bin"),
      "id", "bin", "image", "application/octet-stream")
    val keys = rows.map { case (i, k, _) => (i, k) }.toDF("media_id", "key")
    Multimodal.decodeImages(media, featureDim = 8)
      .join(keys, "media_id")
      .select("key", "width", "height", "n_channels", "decode_ok", "feature")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/golden_decode")
    val spark = graft.GraftSession.builder().getOrCreate()
    decodeFixtures(spark).coalesce(1).write.mode("overwrite").parquet(out)
    println(s"golden decode rows written to $out")
    spark.stop()
  }
}
