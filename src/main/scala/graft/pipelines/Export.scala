package graft.pipelines

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset export / serving surfaces — SURVEY.md S12 (zip sink) and
  * J5/S13 (point lookup behind the API).
  */
object Export {

  /** Zip-export a dataset: every blob re-keyed under `{dataset}/…` inside
    * one zip file. Inherently a sequential single-writer sink (the
    * reference pins it to 1 thread, ftm_datalake/export.py:13-36) — so the
    * rows are streamed through the driver with `toLocalIterator`, never
    * collected wholesale; the data plane stays distributed up to the sink.
    */
  def exportZip(files: DataFrame, dataset: String, zipPath: String): Long = {
    val out = new java.io.FileOutputStream(zipPath)
    val zip = new ZipOutputStream(new java.io.BufferedOutputStream(out))
    var n = 0L
    try {
      val it = files.select(col("key"), col("content")).toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        zip.putNextEntry(new ZipEntry(s"$dataset/${r.getString(0)}"))
        zip.write(r.getAs[Array[Byte]](1))
        zip.closeEntry()
        n += 1
      }
    } finally zip.close()
    n
  }

  /** Re-import a zip export as a (key, content) DataFrame (driver-side
    * listing, used for round-trip verification). */
  def readZip(spark: SparkSession, zipPath: String, dataset: String): DataFrame = {
    val zf = new java.util.zip.ZipFile(zipPath)
    import scala.jdk.CollectionConverters._
    val rows =
      try zf.entries().asScala.filterNot(_.isDirectory).map { e =>
        val in = zf.getInputStream(e)
        val bytes = in.readAllBytes()
        in.close()
        (e.getName.stripPrefix(s"$dataset/"), bytes)
      }.toSeq
      finally zf.close()
    spark.createDataFrame(rows).toDF("key", "content")
  }
}

/** Point-lookup serving surface (J5/S13): the API's `GET /{dataset}/{key}`
  * metadata contract (ftm_datalake/api/util.py:19-31,60-67) over the
  * documents table. Not a Spark workload at runtime — a real deployment
  * fronts this with a KV projection — but the semantics live here.
  */
object PointLookup {

  /** Metadata headers for one key; None ⇒ 404 (errors collapse to not-found
    * for information hiding, api/util.py:44-57). */
  def lookupHeaders(documents: DataFrame, dataset: String,
                    key: String): Option[Map[String, String]] = {
    val rows = documents.filter(col("key") === key)
      .select("key", "content_hash", "size", "mimetype").limit(1).collect()
    rows.headOption.map { r =>
      Map(
        "x-graft-dataset" -> dataset,
        "x-graft-key" -> r.getString(0),
        "x-graft-sha1" -> r.getString(1),
        "x-graft-name" -> r.getString(0).split("/").last,
        "x-graft-size" -> r.getLong(2).toString,
        "content-type" -> Option(r.getString(3)).getOrElse("application/octet-stream"))
    }
  }
}
