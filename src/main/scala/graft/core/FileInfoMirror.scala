package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-file `info.json` mirror — the RFC-interop sink the reference
  * maintains at `<meta>/meta/<key>/info.json` (archive/dataset.py:85-86,
  * written at :161 on archive, deleted at :156 on delete).
  *
  * OFF by default in [[graft.GraftDataset]]: at 100 TB this is millions of
  * tiny JSON objects — exactly the write pattern object stores hate — and
  * the documents parquet table already carries every field. It exists for
  * interop with reference deployments that point-read `info.json` without
  * a query engine. When enabled, writes are driven by the publish DIFF, so
  * an incremental publish touches only changed keys, distributed across
  * executors (never a driver loop).
  *
  * JSON shape follows model.py's File dump with null fields dropped
  * (F10 clean_dict): key, name, size, mimetype, created_at, updated_at,
  * dataset, content_hash.
  */
object FileInfoMirror {

  private def infoPath(metaRoot: String, key: String) =
    s"$metaRoot/meta/$key/info.json"

  /** Write one mirror object per row of `docs` (documents schema). */
  def write(docs: DataFrame, metaRoot: String, dataset: String): Long = {
    val spark = docs.sparkSession
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val written = spark.sparkContext.longAccumulator("file_info_written")
    val payload = docs.select(
      col("key"),
      to_json(struct(
        col("key"),
        graft.functions.GraftFunctions.basename(col("key")).as("name"),
        col("size"),
        col("mimetype"),
        date_format(col("created_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("created_at"),
        date_format(col("updated_at"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("updated_at"),
        lit(dataset).as("dataset"),
        col("content_hash")), Map("ignoreNullFields" -> "true")).as("json"))
    payload.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val conf = confBc.value.value
      it.foreach { r =>
        val p = new org.apache.hadoop.fs.Path(infoPath(metaRoot, r.getString(0)))
        val fs = p.getFileSystem(conf)
        val out = fs.create(p, true)
        try out.write(r.getString(1).getBytes("UTF-8")) finally out.close()
        written.add(1)
      }
    }
    written.value
  }

  /** Delete the mirror objects for removed keys (dataset.py:156). */
  def delete(keys: DataFrame, metaRoot: String): Long = {
    val spark = keys.sparkSession
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val deleted = spark.sparkContext.longAccumulator("file_info_deleted")
    keys.select("key").foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val conf = confBc.value.value
      it.foreach { r =>
        // remove the whole <meta>/meta/<key>/ directory (info.json + dir)
        val p = new org.apache.hadoop.fs.Path(
          s"$metaRoot/meta/${r.getString(0)}")
        val fs = p.getFileSystem(conf)
        if (fs.delete(p, true)) deleted.add(1)
      }
    }
    deleted.value
  }

  /** Scan all mirror objects back as a DataFrame (the S3 read path). */
  def read(spark: org.apache.spark.sql.SparkSession, metaRoot: String): DataFrame =
    spark.read.schema(Model.fileMetaSchema)
      .option("recursiveFileLookup", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(s"$metaRoot/meta")
}
