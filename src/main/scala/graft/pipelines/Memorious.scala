package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Memorious crawler-output import — SURVEY.md S6/J4/P8/F8.
  *
  * Reference (ftm_datalake/sync/memorious.py): a store of `{sha1}.json`
  * metadata files, each referencing a sibling blob via `_file_name`; records
  * missing `content_hash` or `_file_name` are skipped; the archive key is
  * derived from the source URL by a pluggable key function.
  */
object Memorious {

  /** S6: scan the metadata JSONs and pair each with its blob path (J4). */
  def scan(spark: SparkSession, dir: String): DataFrame = {
    val meta = spark.read
      .option("multiLine", "true")
      .json(s"${dir.stripSuffix("/")}/*.json")
    val blobs = spark.read.format("binaryFile")
      .load(dir)
      .filter(!col("path").endsWith(".json"))
      .select(
        GraftFunctions.basename(col("path")).as("_file_name"),
        col("path").as("blob_path"),
        col("length").as("size"))
    meta
      .filter(col("content_hash").isNotNull && col("_file_name").isNotNull) // P8
      .join(blobs, Seq("_file_name"), "inner") // J4
  }

  sealed trait KeyStrategy
  case object UrlPath extends KeyStrategy
  case object NameOnly extends KeyStrategy
  final case class StripPrefix(prefix: String) extends KeyStrategy
  final case class Template(tmpl: String, fields: Seq[String]) extends KeyStrategy

  /** F8: derive the archive key from the record. */
  def deriveKey(df: DataFrame, strategy: KeyStrategy): DataFrame = {
    val key = strategy match {
      case UrlPath => GraftFunctions.KeyFunc.urlPath(col("url"))
      case NameOnly => GraftFunctions.KeyFunc.nameOnly(col("url"))
      case StripPrefix(p) => GraftFunctions.KeyFunc.stripPrefix(col("url"), p)
      case Template(tmpl, fields) =>
        GraftFunctions.templateKeyUdf(
          lit(tmpl),
          map_from_arrays(
            array(fields.map(lit): _*),
            array(fields.map(f => col(f).cast("string")): _*)))
    }
    df.withColumn("key", key)
  }

  /** Full import projection → documents-shaped rows. */
  def importRecords(spark: SparkSession, dir: String,
                    strategy: KeyStrategy = UrlPath): DataFrame =
    deriveKey(scan(spark, dir), strategy).select(
      col("key"),
      col("content_hash"),
      col("size"),
      Crawl.guessMimetype(col("key")).as("mimetype"),
      current_timestamp().as("created_at"),
      current_timestamp().as("updated_at"))
}
