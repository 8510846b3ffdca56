package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Make pipeline — reconcile source blobs against metadata (SURVEY.md §3.2).
  *
  * Reference (ftm_datalake/make.py): two task streams — source keys and
  * metadata records — processed per-key with an implicit full-outer
  * reconcile; behavioral spec in tests/test_make.py (add missing metadata,
  * delete metadata whose blob is gone, flag/heal checksum mismatches).
  *
  * Spark shape: ONE `full_outer` join on `key` (J3) with case logic:
  *   right-null  → ADD      (source file lacks metadata)
  *   left-null   → DELETE   (metadata lacks a source blob)
  *   both        → VERIFY   (recompute checksum; mismatch → INTEGRITY_ERROR)
  *
  * At 100 TB this is a sort-merge join on high-cardinality `key`; the
  * integrity branch is the only stage that touches blob bytes, and only for
  * keys present on both sides.
  */
object Make {

  val ActionAdd = "added"
  val ActionDelete = "deleted"
  val ActionVerify = "verify"
  val ActionIntegrityError = "integrity_error"

  /** The reconcile plan. `source` needs (key, content_hash, size, …) as
    * produced by [[Crawl.hashAndDescribe]] (checksums already computed);
    * `meta` is the current documents table. Returns every key tagged with
    * an `action` column plus the merged row (source wins for adds/updates).
    */
  def reconcile(source: DataFrame, meta: DataFrame): DataFrame = {
    val s = source.select(
      col("key"),
      col("content_hash").as("src_hash"),
      col("size").as("src_size"),
      col("mimetype").as("src_mimetype"),
      col("created_at").as("src_created_at"),
      col("updated_at").as("src_updated_at"))
    val m = meta.select(
      col("key"),
      col("content_hash").as("meta_hash"),
      col("size").as("meta_size"),
      col("mimetype").as("meta_mimetype"),
      col("created_at").as("meta_created_at"),
      col("updated_at").as("meta_updated_at"))
    s.join(m, Seq("key"), "full_outer")
      .withColumn("action",
        when(col("meta_hash").isNull, lit(ActionAdd))
          .when(col("src_hash").isNull, lit(ActionDelete))
          .when(col("src_hash") =!= col("meta_hash"), lit(ActionIntegrityError))
          .otherwise(lit(ActionVerify)))
  }

  /** Post-reconcile healed documents table: adds + verified + healed
    * integrity errors (source wins); deletes dropped. */
  def healed(reconciled: DataFrame): DataFrame =
    reconciled
      .filter(col("action") =!= ActionDelete)
      .select(
        col("key"),
        coalesce(col("src_hash"), col("meta_hash")).as("content_hash"),
        coalesce(col("src_size"), col("meta_size")).as("size"),
        coalesce(col("meta_mimetype"), col("src_mimetype")).as("mimetype"),
        coalesce(col("meta_created_at"), col("src_created_at")).as("created_at"),
        when(col("action") === ActionVerify, col("meta_updated_at"))
          .otherwise(coalesce(col("src_updated_at"), col("meta_updated_at")))
          .as("updated_at"))

  /** Status counters (A4) — deterministic post-hoc aggregation over the
    * reconcile result instead of racy in-flight counters. */
  def status(reconciled: DataFrame): DataFrame =
    reconciled.groupBy("action").agg(count(lit(1)).as("n")).orderBy("action")
}
