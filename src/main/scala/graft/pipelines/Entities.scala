package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** FollowTheMoney entity projection — SURVEY.md F6/J7, FIXTURES.md §6.
  *
  * Reference: File.to_proxy (ftm_datalake/model.py:37-46) builds one FTM
  * entity per file — id (F3), schema from mimetype (F4), multi-valued
  * properties contentHash/fileName/fileSize/mimeType. Pure column
  * expressions; no UDF.
  */
object Entities {

  /** documents(+dataset col) → entities with the FIXTURES.md §6 schema. */
  def fromDocuments(documents: DataFrame, dataset: String,
                    algorithm: String = "sha1"): DataFrame =
    documents.select(
      GraftFunctions.fileEntityId(lit(dataset), col("key"), col("content_hash"),
        algorithm).as("id"),
      GraftFunctions.mimeToSchema(col("mimetype")).as("schema"),
      array(lit(dataset)).as("datasets"),
      map(
        lit("contentHash"), array(col("content_hash")),
        lit("fileName"), array(GraftFunctions.basename(col("key"))),
        lit("fileSize"), array(col("size").cast("string")),
        lit("mimeType"), array(col("mimetype"))
      ).as("properties"))

  /** Flat single-valued variant (oracle-friendly; same information). */
  def fromDocumentsFlat(documents: DataFrame, dataset: String,
                        algorithm: String = "sha1"): DataFrame =
    documents.select(
      GraftFunctions.fileEntityId(lit(dataset), col("key"), col("content_hash"),
        algorithm).as("id"),
      GraftFunctions.mimeToSchema(col("mimetype")).as("schema"),
      col("content_hash").as("contentHash"),
      GraftFunctions.basename(col("key")).as("fileName"),
      col("size").cast("string").as("fileSize"),
      col("mimetype").as("mimeType"))

  /** J7: entities ↔ blobs via content checksum (docs/rfc.md:10). */
  def joinBlobs(entities: DataFrame, files: DataFrame): DataFrame =
    entities.join(files,
      entities("contentHash") === files("content_hash"), "inner")

  /** J6: the distinct ancestor-folder set for a key column, ordered
    * shallowest-first — replaces the reference's per-key recursion + lock
    * (ftm_datalake/sync/aleph.py:95-107) with one dataframe pass. */
  def ancestorFolders(documents: DataFrame): DataFrame =
    documents
      .select(explode(GraftFunctions.pathAncestors(col("key"))).as("folder"))
      .distinct()
      .withColumn("depth", size(split(col("folder"), "/")))
      .orderBy(col("depth"), col("folder"))

  /** I5: push entities to an external sink in bounded batches (reference
    * batches 1000/request, sync/aleph_entities.py:58-76). The `send`
    * callback runs on executors once per batch. */
  def foreachBatch(entities: DataFrame, batchSize: Int = 1000)(
      send: Seq[org.apache.spark.sql.Row] => Unit): Unit =
    entities.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      it.grouped(batchSize).foreach(g => send(g.toSeq))
    }
}
