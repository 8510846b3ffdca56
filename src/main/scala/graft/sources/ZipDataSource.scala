package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch reader for zip archives — SURVEY.md S7 ("zip =
  * custom table provider"): a zipped RFC dataset (`export.py` output, or any
  * zip) reads as a DataFrame of its members without a driver-side unzip
  * staging step.
  *
  * {{{
  *   spark.read.format("graft-zip").load("/lake/export.zip")
  *     // => key string, size long, content binary (one row per member)
  * }}}
  *
  * Scale shape: one InputPartition per zip FILE (zip's central directory
  * makes member-level splits impractical); a directory/glob of N zips reads
  * with N-way parallelism. Members stream through the executor-side
  * ZipInputStream — bytes never pass through the driver.
  */
class ZipDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-zip"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    SourceOptions.requireSchema(ZipTable.schema, schema, "graft-zip")
    val paths = Option(properties.get("paths"))
      .map(SourceOptions.parseJsonStringArray) // multi-path load() → JSON array
      .orElse(Option(properties.get("path")).map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException("graft-zip: path required"))
    new ZipTable(paths)
  }

  override def supportsExternalMetadata(): Boolean = true
}

object ZipTable {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("content", BinaryType)))
}

class ZipTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-zip(${paths.mkString(",")})"
  override def schema(): StructType = ZipTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = ZipTable.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        // resolve globs/directories to concrete zip files (driver-side
        // listing — metadata only)
        val conf = org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration
        val resolved = paths.flatMap { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(conf)
          val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Nil)
          if (matched.isEmpty)
            throw new java.io.FileNotFoundException(s"graft-zip: no files match $p")
          matched.flatMap { st =>
            if (st.isDirectory)
              fs.listStatus(st.getPath).toSeq
                .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".zip"))
                .map(_.getPath.toString)
            else Seq(st.getPath.toString)
          }
        }
        resolved.map(ZipFilePartition(_): InputPartition).toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        // serialize the session's Hadoop conf into the factory so executor
        // readers see the same FS credentials/endpoints (s3a etc.) as the
        // driver — a bare `new Configuration()` on the executor would not
        new ZipReaderFactory(new org.apache.spark.util.SerializableConfiguration(
          org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
    }
}

case class ZipFilePartition(path: String) extends InputPartition

class ZipReaderFactory(conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[ZipFilePartition].path
    new PartitionReader[InternalRow] {
      private val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(conf.value)
      private val in = new java.util.zip.ZipInputStream(
        fs.open(new org.apache.hadoop.fs.Path(path)))
      private var current: InternalRow = _

      override def next(): Boolean = {
        var e = in.getNextEntry
        while (e != null && e.isDirectory) e = in.getNextEntry
        if (e == null) false
        else {
          val bytes = in.readAllBytes()
          current = InternalRow(
            UTF8String.fromString(e.getName), bytes.length.toLong, bytes)
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}
