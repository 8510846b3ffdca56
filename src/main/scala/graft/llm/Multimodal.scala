package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The decode kernels are STUBS (this container ships no image/audio codecs):
  * each is a clearly-marked deterministic fake keyed on the content bytes, so
  * the Spark-side contract — schema, batch shape, partitioning, executor-side
  * iteration — is real and testable, and a production build swaps only the
  * kernel body (e.g. JNI to libjpeg / a Python `mapInPandas` worker).
  */
object Multimodal {

  /** Typed media row: content plus metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType),
    StructField("mime_type", StringType),
    StructField("byte_size", LongType)))

  /** Wrap any (id, binary) pair into the media schema. */
  def asMedia(df: DataFrame, idCol: String, binCol: String,
              modality: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(binCol).cast("binary").as("content"),
      lit(mime).as("mime_type"),
      octet_length(col(binCol).cast("binary")).cast("long").as("byte_size"))

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB image decode + feature extraction.
    *
    * Production kernel: decode bytes → HxWxC, pool to an embedding. Here the
    * "decode" derives (width, height, feature) deterministically from a hash
    * of the bytes, preserving schema/shape/partitioning. Runs mapPartitions
    * so a real kernel can amortize per-partition model/codec setup — the
    * same batch shape a `mapInPandas` UDF would see.
    */
  def decodeImagesStub(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      // >>> STUB KERNEL — replace with a real codec; everything else stands.
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val h = java.util.Arrays.hashCode(bytes)
        val w = 64 + math.abs(h % 512)
        val ht = 64 + math.abs((h / 512) % 512)
        val feat = Array.tabulate(featureDim)(i =>
          (((h.toLong * 2654435761L + i * 40503L) % 1000L) / 1000.0f))
        Row(id, w, ht, 3, feat.toSeq)
      }
      // <<< STUB KERNEL
    }
    spark.createDataFrame(rdd, imageFeatureSchema)
  }

  /** STUB resize: records the target geometry; a real kernel re-encodes the
    * bytes. Pure-column metadata math stays real. */
  def resizeStub(features: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    features
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Deterministic frame sampling for video rows: emit `n` evenly-spaced
    * frame indices per media item given a (stub-derived) frame count. The
    * explode IS the real operator — a decoder only fills in pixels.
    * The stub frame count derives from the byte size (portable arithmetic,
    * so the operator is oracle-checkable end to end). */
  def sampleFramesStub(media: DataFrame, n: Int = 4): DataFrame = {
    val frameCount = (pmod(col("byte_size"), lit(500L)) + 10).cast("int")
    media
      .withColumn("frame_count", frameCount)
      .select(col("media_id"), col("frame_count"),
        explode(transform(sequence(lit(0), lit(n - 1)),
          i => floor(i * col("frame_count") / lit(n.toDouble)).cast("int")))
          .as("frame_index"))
  }
}
