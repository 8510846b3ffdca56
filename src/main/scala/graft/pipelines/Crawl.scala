package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Crawl pipeline — ingest a source tree into a dataset (SURVEY.md §3.1).
  *
  * Reference lifecycle (ftm_datalake/crawl.py): key listing (S1) + glob
  * predicates (P2) → skip-existing (I2, a per-key existence RPC) → per-file
  * staging + sha1 + archive (S9) → documents rebuild + index.
  *
  * Spark shape: ONE declarative plan — `binaryFile` scan → glob filter →
  * anti-join against the existing documents table (set-at-a-time instead of
  * per-key RPCs) → checksum + metadata projection. The blob-copy stage is the
  * only imperative part and runs `foreachPartition` on executors.
  *
  * Scale: the binaryFile source distributes file reads across executors;
  * the anti-join on `key` is a shuffle of metadata only (never content);
  * prefix-shaped globs prune at the listing. At 100 TB of blobs the content
  * column flows scan→sha1→(copy) within one stage and is never shuffled.
  */
object Crawl {

  /** S1: recursive listing of a source tree as (key, size, modificationTime),
    * excluding the metadata subtree (P5). Content is NOT read here.
    *
    * Uses the Hadoop FileSystem listing directly instead of the `binaryFile`
    * source: Spark file sources silently skip zero-length files and
    * glob-special filenames, both of which are legitimate archive keys (the
    * reference corpus contains `empty.pdf`).
    *
    * Scale shape: the driver issues exactly ONE `listStatus` on the root;
    * top-level files become rows directly, and each top-level directory
    * becomes a listing task fanned out across executors, where the recursive
    * `listFiles` iterator streams (on S3, pages of 1000 keys) straight into
    * the partition iterator — no per-key state ever accumulates on the
    * driver. At millions of keys the driver holds only the top-level entries.
    */
  def listKeys(spark: SparkSession, sourceUri: String,
               metadataPrefix: String = ".ftm_datalake",
               listingParallelism: Int = 64): DataFrame = {
    import spark.implicits._
    val base = sourceUri.stripSuffix("/")
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = fs.makeQualified(basePath).toString + "/"
    val top = fs.listStatus(basePath)
    val topFiles = top.filter(_.isFile).map { st =>
      (st.getPath.toString.stripPrefix(prefix), st.getLen,
        new java.sql.Timestamp(st.getModificationTime))
    }.toSeq
    val dirUris = top.filter(_.isDirectory).map(_.getPath.toString).toSeq
    val fanned: DataFrame =
      if (dirUris.isEmpty) topFiles.toDF("key", "size", "updated_at").limit(0)
      else {
        val confBc = spark.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(
            spark.sparkContext.hadoopConfiguration))
        val slices = math.max(1, math.min(dirUris.length, listingParallelism))
        spark.sparkContext.parallelize(dirUris, slices)
          .mapPartitions { dirs =>
            val conf = confBc.value.value
            dirs.flatMap { dir =>
              val p = new org.apache.hadoop.fs.Path(dir)
              val dfs = p.getFileSystem(conf)
              val it = dfs.listFiles(p, true)
              new Iterator[(String, Long, java.sql.Timestamp)] {
                def hasNext: Boolean = it.hasNext
                def next(): (String, Long, java.sql.Timestamp) = {
                  val st = it.next()
                  (st.getPath.toString.stripPrefix(prefix), st.getLen,
                    new java.sql.Timestamp(st.getModificationTime))
                }
              }
            }
          }
          .toDF("key", "size", "updated_at")
      }
    topFiles.toDF("key", "size", "updated_at").union(fanned)
      .filter(!col("key").startsWith(metadataPrefix))
  }

  /** P2: include/exclude glob filter on keys. */
  def applyGlobs(keys: DataFrame, include: Option[String],
                 exclude: Option[String]): DataFrame =
    keys.filter(GraftFunctions.globFilter(col("key"), include, exclude))

  /** J2: drop candidates whose key is already archived (skip_existing). */
  def skipExisting(candidates: DataFrame, existing: DataFrame): DataFrame =
    candidates.join(existing.select("key"), Seq("key"), "left_anti")

  /** [[skipExisting]] with a broadcast Bloom pre-filter — the incremental
    * re-crawl shape at lake scale, where the anti-join would shuffle EVERY
    * candidate AND every archived key on every run. The existing key set
    * aggregates once into a Bloom filter (Spark's native
    * `BloomFilterAggregate`, tree-aggregated, driver holds only the bit
    * array); candidates the filter rejects are DEFINITELY new and bypass
    * the join entirely with zero shuffle, and only the `fpp` fraction of
    * false-positive residue (plus true existing keys) goes through the
    * exact anti-join. Result is IDENTICAL to [[skipExisting]] for any
    * `fpp` — the filter only routes rows, it never decides membership.
    *
    * Everything stays native/codegen (`BloomFilterMightContain` over
    * `xxhash64(key)` — the probe Spark's runtime row-level filtering
    * injects; the build is [[graft.expressions.BloomBuildAgg]], which
    * honors the requested geometry exactly where Spark's own aggregate
    * silently clamps it to the runtime-join-filter confs). Size the
    * filter honestly: ~1.2 bytes/key at fpp=0.01, so 10⁸ archived keys
    * broadcast ~120 MB; past the 8-Gbit build ceiling raise `fpp` (the
    * residue join stays exact) or fall back to [[skipExisting]]. */
  def skipExistingBloom(candidates: DataFrame, existing: DataFrame,
                        expectedKeys: Long = 10000000L,
                        fpp: Double = 0.01): DataFrame = {
    import graft.expressions.{GraftExpressions => GE}
    val bytes = existing
      .select(GE.bloomSketch(xxhash64(col("key")), expectedKeys, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (bytes == null) return candidates // empty existing set: all pass
    val might = GE.bloomMightContain(lit(bytes), xxhash64(col("key")))
    candidates.filter(!might) // definitely new — never shuffles
      .unionByName(candidates.filter(might)
        .join(existing.select("key"), Seq("key"), "left_anti"))
  }

  /** Read content and derive the new documents rows: checksum (F1), mimetype
    * guess, timestamps (F7). Executor-side streaming digest over Hadoop FS
    * (X3: bytes flow through a 64 KiB buffer into the digest and are never
    * materialized as a column, row, or shuffle payload — the reference's
    * chunked-IO invariant, dataset.py:47-48, at Spark scale). */
  def hashAndDescribe(spark: SparkSession, sourceUri: String, keys: DataFrame,
                      algorithm: String = "sha1"): DataFrame = {
    import spark.implicits._
    val base = sourceUri.stripSuffix("/")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val algoName = algorithm match {
      case "sha1" => "SHA-1"
      case "md5" => "MD5"
      case "sha256" => "SHA-256"
      case "sha512" => "SHA-512"
      case other => throw new IllegalArgumentException(s"unknown checksum algorithm: $other")
    }
    val hashed = keys
      .select(col("key"), col("size").cast("long"), col("updated_at"))
      .as[(String, Long, java.sql.Timestamp)]
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.map { case (key, size, mtime) =>
          val p = new org.apache.hadoop.fs.Path(s"$base/$key")
          val fs = p.getFileSystem(conf)
          val md = java.security.MessageDigest.getInstance(algoName)
          // retain the head for magic-byte sniffing — the digest already
          // streams every byte, so this adds no IO
          val head = new Array[Byte](MagicBytes.HeaderLen)
          var headLen = 0
          val in = fs.open(p)
          try {
            val buf = new Array[Byte](65536)
            var n = in.read(buf)
            while (n >= 0) {
              md.update(buf, 0, n)
              if (headLen < head.length && n > 0) {
                val c = math.min(n, head.length - headLen)
                System.arraycopy(buf, 0, head, headLen, c)
                headLen += c
              }
              n = in.read(buf)
            }
          } finally in.close()
          val hex = md.digest().map("%02x".format(_)).mkString
          (key, hex, size, mtime, MagicBytes.sniff(head, headLen).orNull)
        }
      }
      .toDF("key", "content_hash", "size", "mtime", "sniffed")
    hashed.select(
      col("key"), col("content_hash"), col("size"),
      coalesce(extMimetype(col("key")), col("sniffed"),
        lit("application/octet-stream")).as("mimetype"),
      col("mtime").as("created_at"),
      col("mtime").as("updated_at"))
  }

  /** Extension-based mimetype guess (the reference delegates to libmagic /
    * anystore Stats; extension mapping is the deterministic core we need
    * for schema stats). The per-extension values are pinned to what the
    * reference's detector actually produced on its shipped archive fixture
    * (`.leakrfc/documents.csv` — e.g. `.doc` → `application/vnd.ms-word`,
    * not `application/msword`), so schema rollups agree on real corpora
    * (ReferenceArchiveSpec). The crawl pipeline composes this with the
    * [[MagicBytes]] content sniff: extension first (the pinned behavior),
    * sniffed signature for keys the map cannot place, octet-stream last. */
  def guessMimetype(key: Column): Column =
    coalesce(extMimetype(key), lit("application/octet-stream"))

  /** The extension map alone: NULL for unknown/missing extensions, so
    * callers can layer content-based fallbacks ([[MagicBytes.sniff]]). */
  def extMimetype(key: Column): Column = {
    val ext = lower(element_at(split(GraftFunctions.basename(key), "\\."), -1))
    val m = Map(
      "pdf" -> "application/pdf",
      "doc" -> "application/vnd.ms-word",
      "docx" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
      "odt" -> "application/vnd.oasis.opendocument.text",
      "ods" -> "application/vnd.oasis.opendocument.spreadsheet",
      "ppt" -> "application/vnd.ms-powerpoint",
      "html" -> "text/html", "htm" -> "text/html", "xml" -> "text/xml",
      "csv" -> "text/csv", "xls" -> "application/vnd.ms-excel",
      "xlsx" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
      "png" -> "image/png", "gif" -> "image/gif", "jpg" -> "image/jpeg",
      "jpeg" -> "image/jpeg", "tif" -> "image/tiff", "tiff" -> "image/tiff",
      "jp2" -> "image/jp2", "svg" -> "image/svg+xml", "webp" -> "image/webp",
      "djvu" -> "image/vnd.djvu",
      "eml" -> "message/rfc822", "mbox" -> "application/mbox",
      "txt" -> "text/plain", "rtf" -> "application/rtf",
      "json" -> "application/json", "ics" -> "text/calendar",
      "vcf" -> "text/vcard", "dbf" -> "application/vnd.dbf",
      "mdb" -> "application/msaccess",
      "zip" -> "application/zip", "tar" -> "application/x-tar",
      "7z" -> "application/x-7z-compressed", "rar" -> "application/vnd.rar",
      "mp4" -> "video/mp4", "m4a" -> "audio/mp4",
      // deliberate octet-stream pins (reference-fixture parity,
      // .leakrfc/documents.csv): these extensions must NOT fall through to
      // the content sniff — e.g. the first chunk of a split 7z (`.001`)
      // carries the 7z magic, and `.ical` text would sniff as calendar.
      "msg" -> "application/octet-stream",
      "pst" -> "application/octet-stream",
      "ical" -> "application/octet-stream",
      "emlx" -> "application/octet-stream",
      "001" -> "application/octet-stream")
    m.foldLeft(lit(null).cast("string")) { case (acc, (e, mt)) =>
      when(ext === e, lit(mt)).otherwise(acc)
    }
  }

  /** End-to-end crawl: candidates → new document rows (no blob copy — the
    * archive-copy stage is [[ArchiveCopy.copyBlobs]]). An `http(s)://`
    * source dispatches to [[HttpCrawl]] (index-page listing + streaming
    * fetch), mirroring the reference's scheme-transparent `crawl(uri)`
    * (ftm_datalake/crawl.py:108-151); everything else goes through the
    * Hadoop FS (file://, s3a://, hdfs://, …). */
  def crawl(spark: SparkSession, sourceUri: String, existing: DataFrame,
            include: Option[String] = None, exclude: Option[String] = None): DataFrame =
    if (sourceUri.startsWith("http://") || sourceUri.startsWith("https://"))
      HttpCrawl.crawl(spark, sourceUri, existing, include, exclude)
    else {
      val keys = applyGlobs(listKeys(spark, sourceUri), include, exclude)
      val fresh = skipExisting(keys, existing)
      hashAndDescribe(spark, sourceUri, fresh)
    }
}

/** The blob-copy stage of archiving (S9): executor-side Hadoop FS copy into
  * the content-addressed layout `<lake>/<dataset>/<ab/cd/ef/hash>` (F2).
  * Kept out of the DataFrame plane — it is IO, not relational work.
  */
object ArchiveCopy {
  def copyBlobs(spark: SparkSession, rows: DataFrame, sourceBase: String,
                lakeBase: String): Long = {
    val base = sourceBase.stripSuffix("/")
    copyBlobPaths(spark,
      rows.select(concat(lit(base + "/"), col("key")).as("src_path"),
        col("content_hash")),
      lakeBase)
  }

  /** Same copy stage but with explicit source paths per row (memorious
    * imports, staged trees) instead of `<base>/<key>` derivation. */
  def copyBlobPaths(spark: SparkSession, rows: DataFrame,
                    lakeBase: String): Long = {
    val lake = lakeBase.stripSuffix("/")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val copied = spark.sparkContext.longAccumulator("blobs_copied")
    rows.select("src_path", "content_hash").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val conf = confBc.value.value
        it.foreach { r =>
          val ch = r.getString(1)
          val src = new org.apache.hadoop.fs.Path(r.getString(0))
          val shard = s"${ch.substring(0, 2)}/${ch.substring(2, 4)}/${ch.substring(4, 6)}/$ch"
          val dst = new org.apache.hadoop.fs.Path(s"$lake/$shard")
          val sfs = src.getFileSystem(conf); val dfs = dst.getFileSystem(conf)
          if (!dfs.exists(dst)) {
            org.apache.hadoop.fs.FileUtil.copy(sfs, src, dfs, dst, false, true, conf)
            copied.add(1)
          }
        }
    }
    copied.value
  }
}
