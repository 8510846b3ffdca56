package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch reader for WebDataset tar shards — the read half
  * of [[graft.llm.Corpus.writeWebDatasetShards]]'s loader contract: one
  * row per SAMPLE (all tar entries sharing the name up to the first dot,
  * which WebDataset requires to be ADJACENT in the stream), with the
  * per-extension payloads as a map.
  *
  * {{{
  *   spark.read.format("graft-wds").load("/shards")   // dir, glob, or file
  *     // => key string, entries map<string, binary> (ext → bytes)
  * }}}
  *
  * Scale shape: one InputPartition per tar FILE (tar has no central
  * directory, so member-level splits would re-scan from the start
  * anyway); a directory of N shards reads with N-way parallelism —
  * exactly the parallelism the shard writer laid down. Samples stream
  * through the executor-side TarArchiveInputStream; bytes never pass
  * through the driver. Adjacency grouping is O(1) memory per sample —
  * one sample's entries, never a shard index.
  */
class TarDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wds"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    SourceOptions.requireSchema(TarTable.schema, schema, "graft-wds")
    val paths = Option(properties.get("paths"))
      .map(SourceOptions.parseJsonStringArray) // multi-path load() → JSON array
      .orElse(Option(properties.get("path")).map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException("graft-wds: path required"))
    new TarTable(paths)
  }

  override def supportsExternalMetadata(): Boolean = true
}

object TarTable {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("entries",
      MapType(StringType, BinaryType, valueContainsNull = false),
      nullable = false)))
}

class TarTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-wds(${paths.mkString(",")})"
  override def schema(): StructType = TarTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = TarTable.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        // resolve globs/directories to concrete tar files (driver-side
        // listing — metadata only), mirroring ZipDataSource
        val conf = org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration
        val resolved = paths.flatMap { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(conf)
          val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Nil)
          if (matched.isEmpty)
            throw new java.io.FileNotFoundException(s"graft-wds: no files match $p")
          matched.flatMap { st =>
            if (st.isDirectory)
              fs.listStatus(st.getPath).toSeq
                .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".tar"))
                .map(_.getPath.toString)
            else Seq(st.getPath.toString)
          }
        }
        resolved.map(TarFilePartition(_): InputPartition).toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        // executor readers must see the driver's FS credentials/endpoints
        new TarReaderFactory(new org.apache.spark.util.SerializableConfiguration(
          org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
    }
}

case class TarFilePartition(path: String) extends InputPartition

class TarReaderFactory(conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[TarFilePartition].path
    new PartitionReader[InternalRow] {
      import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
      private val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(conf.value)
      private val in = new TarArchiveInputStream(
        fs.open(new org.apache.hadoop.fs.Path(path)))
      private var current: InternalRow = _
      // one read-ahead entry: the first member of the NEXT sample
      private var pending: (String, String, Array[Byte]) = _

      /** Next file entry as (base key, extension, bytes), null at EOF.
        * The split is at the FIRST dot — the WebDataset grouping rule
        * the shard writer enforces on its keys. */
      private def readEntry(): (String, String, Array[Byte]) = {
        var e = in.getNextEntry
        while (e != null && !e.isFile) e = in.getNextEntry
        if (e == null) null
        else {
          val name = e.getName
          val dot = name.indexOf('.')
          val (base, ext) =
            if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
          (base, ext, in.readAllBytes())
        }
      }

      override def next(): Boolean = {
        val first = if (pending != null) pending else readEntry()
        pending = null
        if (first == null) return false
        val exts = ArrayBuffer(first._2)
        val bytes = ArrayBuffer(first._3)
        var e = readEntry()
        while (e != null && e._1 == first._1) {
          exts += e._2; bytes += e._3; e = readEntry()
        }
        pending = e
        current = InternalRow(
          UTF8String.fromString(first._1),
          ArrayBasedMapData(
            exts.map(UTF8String.fromString).toArray[Any],
            bytes.toArray[Any]))
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}
