package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Dataset statistics / index rollups — SURVEY.md §2.4.
  *
  * A1 total size (ftm_datalake/archive/documents.py:125-127,
  * dataset.py:192-196), A2 per-schema entity counts (dataset.py:180-185,
  * golden oracle tests/fixtures/.../index.json), A7 catalog rollup
  * (archive/base.py:75-83).
  *
  * All are single-pass partial+final aggregations; at 100 TB they are one
  * shuffle of pre-aggregated per-partition rows (bytes, not data).
  */
object Stats {

  /** Sum of file sizes (A1). */
  def totalFileSize(documents: DataFrame): Long = {
    val r = documents.agg(sum("size").as("total")).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Per-FTM-schema document counts derived from mimetypes (A2). */
  def schemaCounts(documents: DataFrame): DataFrame =
    documents
      .withColumn("schema", GraftFunctions.mimeToSchema(col("mimetype")))
      .groupBy("schema")
      .agg(count(lit(1)).as("count"))
      .orderBy("schema")

  /** One index row: entity count, total size, per-schema counts as a sorted
    * map (A2+A1 rollup → the index.json `things.schemata` shape,
    * dataset.py:177-190, golden fixture tests/fixtures/.../index.json). */
  def datasetIndex(documents: DataFrame): DataFrame =
    documents
      .withColumn("schema", GraftFunctions.mimeToSchema(col("mimetype")))
      .groupBy("schema")
      .agg(count(lit(1)).as("cnt"), sum("size").as("sz"))
      .agg(
        sum("cnt").as("entity_count"),
        sum("sz").as("total_file_size"),
        map_from_entries(sort_array(collect_list(struct(col("schema"), col("cnt")))))
          .as("schemata"))

  /** Serialize the index row to the RFC `index.json` shape (driver-side —
    * it is one small object, not a data-plane write). */
  def writeIndexJson(documents: DataFrame, name: String, path: String): Unit = {
    val row = datasetIndex(documents).collect()(0)
    val schemata = row.getMap[String, Long](2).toSeq.sortBy(_._1)
      .map { case (s, c) => s"""{"name":"$s","count":$c}""" }
      .mkString("[", ",", "]")
    val json =
      s"""{"name":"$name","updated_at":"${java.time.Instant.now()}",""" +
        s""""things":{"total":${row.getLong(0)},"schemata":$schemata},""" +
        s""""entity_count":${row.getLong(0)},""" +
        s""""total_file_size":${row.getLong(1)}}"""
    writeString(documents.sparkSession, path, json)
  }

  /** Small-object write through the Hadoop FS (so index/catalog JSON land
    * on s3a://hdfs:// lakes the same as local ones). */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Catalog rollup (A7): per-dataset aggregate row over a multi-dataset
    * documents table carrying a `dataset` column. */
  def catalog(documents: DataFrame): DataFrame =
    documents
      .groupBy("dataset")
      .agg(
        count(lit(1)).as("file_count"),
        sum("size").as("total_file_size"),
        countDistinct("content_hash").as("distinct_blobs"),
        max("updated_at").as("updated_at"))
      .orderBy("dataset")
}
