package graft.pipelines

import org.apache.commons.compress.archivers.sevenz.SevenZFile
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.archivers.zip.ZipArchiveInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.commons.compress.utils.SeekableInMemoryByteChannel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Archive extraction during crawl — the reference's `--extract` mode
  * (ftm_datalake/crawl.py crawl_child + docs/crawl.md "Extract"): archives
  * are not stored; their members are, keeping the archived directory
  * structure; `ensureSubdir` nests members under a directory named for the
  * source archive; `keepSource` keeps the archive row too. Extracted
  * members carry `origin="extracted"` and `source_file=<archive key>`.
  *
  * This is the engine's one generator-shaped operator (SURVEY §2.8): one
  * archive row → many member rows, implemented as a flatMap over the binary
  * content (commons-compress ships with Spark). Supports zip, tar,
  * tar.gz/tgz, and 7z.
  */
object Extract {

  /** Hard cap on a single extracted member's bytes (512 MiB). Archives are
    * extracted in executor memory (the whole-archive byte[] is how they
    * arrive from binaryFile / the crawl path), so an unbounded member is an
    * executor OOM; beyond the cap we fail loudly rather than corrupt or
    * OOM. Members ≥2 GiB could not be held in a byte[] at all (the earlier
    * `getSize.toInt` cast silently overflowed). */
  val MaxMemberBytes: Long = 512L * 1024 * 1024

  private def checkMemberSize(name: String, size: Long, cap: Long): Unit =
    if (size > cap)
      throw new IllegalArgumentException(
        s"archive member '$name' is $size bytes, above the " +
          s"$cap-byte extraction limit (Extract.MaxMemberBytes)")

  val outputSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("content", BinaryType),
    StructField("size", LongType),
    StructField("origin", StringType),
    StructField("source_file", StringType)))

  def isArchiveKey(key: String): Boolean = {
    val k = key.toLowerCase
    k.endsWith(".zip") || k.endsWith(".tar") || k.endsWith(".tar.gz") ||
      k.endsWith(".tgz") || k.endsWith(".7z")
  }

  /** Read a member stream fully, failing once it exceeds
    * [[MaxMemberBytes]] (instead of buffering without bound). */
  private def readBounded(in: java.io.InputStream, name: String,
                          cap: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n > 0) {
      out.write(buf, 0, n)
      checkMemberSize(name, out.size().toLong, cap)
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Extract members of one archive as (memberPath, bytes). Member sizes
    * are bounded by [[MaxMemberBytes]]; a member stream ending before its
    * declared size is an error (not silently zero-padded). */
  def extractBytes(key: String, bytes: Array[Byte],
                   maxMemberBytes: Long = MaxMemberBytes): Seq[(String, Array[Byte])] = {
    val k = key.toLowerCase
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    if (k.endsWith(".zip")) {
      val in = new ZipArchiveInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        var e = in.getNextEntry
        while (e != null) {
          if (!e.isDirectory) out += ((e.getName, readBounded(in, e.getName, maxMemberBytes)))
          e = in.getNextEntry
        }
      } finally in.close()
    } else if (k.endsWith(".tar") || k.endsWith(".tar.gz") || k.endsWith(".tgz")) {
      val raw = new java.io.ByteArrayInputStream(bytes)
      val stream =
        if (k.endsWith(".tar")) raw else new GzipCompressorInputStream(raw)
      val in = new TarArchiveInputStream(stream)
      try {
        var e = in.getNextEntry
        while (e != null) {
          if (!e.isDirectory) out += ((e.getName, readBounded(in, e.getName, maxMemberBytes)))
          e = in.getNextEntry
        }
      } finally in.close()
    } else if (k.endsWith(".7z")) {
      val sz = new SevenZFile(new SeekableInMemoryByteChannel(bytes))
      try {
        var e = sz.getNextEntry
        while (e != null) {
          if (!e.isDirectory) {
            checkMemberSize(e.getName, e.getSize, maxMemberBytes) // 7z declares exact sizes
            val buf = new Array[Byte](e.getSize.toInt)
            var off = 0
            while (off < buf.length) {
              val n = sz.read(buf, off, buf.length - off)
              if (n <= 0) throw new java.io.EOFException(
                s"archive member '${e.getName}' ended at $off of ${buf.length} bytes")
              off += n
            }
            out += ((e.getName, buf))
          }
          e = sz.getNextEntry
        }
      } finally sz.close()
    }
    out.toSeq
  }

  private def parentDir(key: String): String = {
    val i = key.lastIndexOf('/')
    if (i < 0) "" else key.substring(0, i + 1)
  }

  /** Expand archive rows of a (key, content) frame into member rows;
    * non-archive rows pass through with `origin="original"`. */
  def extractArchives(files: DataFrame, ensureSubdir: Boolean = false,
                      keepSource: Boolean = false): DataFrame = {
    val spark = files.sparkSession
    val rdd = files.select("key", "content").rdd.flatMap { r =>
      val key = r.getString(0)
      val bytes = r.getAs[Array[Byte]](1)
      if (!isArchiveKey(key)) {
        Seq(Row(key, bytes, bytes.length.toLong, "original", null))
      } else {
        val members = extractBytes(key, bytes).map { case (name, b) =>
          val childKey =
            if (ensureSubdir) s"$key/$name" else parentDir(key) + name
          Row(childKey, b, b.length.toLong, "extracted", key)
        }
        if (keepSource)
          Row(key, bytes, bytes.length.toLong, "original", null) +: members
        else members
      }
    }
    spark.createDataFrame(rdd, outputSchema)
  }
}
