package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core data model — SURVEY.md §1, FIXTURES.md.
  *
  * Mirrors the reference's pydantic models (ftm_datalake/model.py) as case
  * classes + explicit StructTypes. `DataFrame` is the working currency;
  * the case classes give typed `Dataset[T]` views where compile-time safety
  * pays (File/Document, the two core models).
  */
object Model {

  /** One row of the documents table — the core relation
    * (ftm_datalake/archive/documents.py:4-5, model.py:94-118). */
  final case class DocumentRow(
      key: String,
      content_hash: String,
      size: Long,
      mimetype: String,
      created_at: Timestamp,
      updated_at: Timestamp
  )

  /** Per-file metadata record (`info.json`; ftm_datalake/model.py:55-91). */
  final case class FileMeta(
      key: String,
      name: String,
      store: String,
      uri: String,
      size: Long,
      mimetype: String,
      created_at: Timestamp,
      updated_at: Timestamp,
      dataset: String,
      content_hash: String,
      processed: Option[Timestamp] = None,
      origin: String = "original",
      source_file: Option[String] = None,
      extra: Map[String, String] = Map.empty
  )

  val documentsSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mimetype", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)
  ))

  val fileMetaSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("name", StringType),
    StructField("store", StringType),
    StructField("uri", StringType),
    StructField("size", LongType, nullable = false),
    StructField("mimetype", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("dataset", StringType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("processed", TimestampType),
    StructField("origin", StringType),
    StructField("source_file", StringType),
    StructField("extra", MapType(StringType, StringType))
  ))

  /** FollowTheMoney entity (entities.ftm.json line; FIXTURES.md §6). */
  val entitySchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("schema", StringType, nullable = false),
    StructField("datasets", ArrayType(StringType)),
    StructField("properties", MapType(StringType, ArrayType(StringType)))
  ))
}
