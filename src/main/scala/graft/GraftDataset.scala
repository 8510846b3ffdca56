package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Diff, DocumentsStore, Rebuild, Stats}
import graft.pipelines.{ArchiveCopy, Crawl, Entities, Export, Make, PointLookup}

/** The user-facing dataset lifecycle — what `ftm-datalake -d <ds> crawl/make/
  * export` does, as one Spark-native API (SURVEY.md §3).
  *
  * Lake layout per dataset under `<root>/<name>/`:
  * {{{
  *   blobs/ab/cd/ef/<sha1>          content-addressed blob store (F2)
  *   .graft/documents.parquet       documents table (system of record)
  *   .graft/versions/<ts>/          CSV snapshot per publish (RFC interop)
  *   .graft/versions/<ts>.diff/     +/- diff lines vs previous snapshot
  *   .graft/index.json              dataset stats index
  *   .graft/entities.ftm.json/      FTM entities (JSON lines)
  * }}}
  */
final class GraftDataset(val spark: SparkSession, val root: String,
                         val name: String,
                         val checksumAlgorithm: String = "sha1",
                         val bucketedLayout: Boolean = false,
                         val buckets: Int = 64,
                         val mirrorFileInfo: Boolean = false) {

  val datasetRoot = s"${root.stripSuffix("/")}/$name"
  val metaRoot = s"$datasetRoot/.graft"
  val blobRoot = s"$datasetRoot/blobs"

  /** Catalog name of the bucketed documents table (bucketed layout only). */
  val bucketedTableName: String =
    "graft_" + name.toLowerCase.replaceAll("[^a-z0-9_]", "_") + "_documents"

  def documents: DataFrame =
    if (bucketedLayout && spark.catalog.tableExists(bucketedTableName))
      spark.table(bucketedTableName)
    else
      DocumentsStore.readParquet(spark, s"$metaRoot/documents.parquet")

  /** Crawl a source tree: list → globs → skip-existing → hash → copy blobs
    * → rebuild → publish snapshot+diff+index. Returns the action counts.
    *
    * With `extract=true`, archive members replace their archives
    * (docs/crawl.md "Extract" semantics; see [[graft.pipelines.Extract]]) —
    * extracted blobs are written content-addressed from their bytes.
    */
  def crawl(sourceUri: String, include: Option[String] = None,
            exclude: Option[String] = None, extract: Boolean = false,
            versionTs: String = GraftDataset.nowTs()): Map[String, Long] = {
    val existing = documents
    val isHttp = sourceUri.startsWith("http://") || sourceUri.startsWith("https://")
    if (extract && isHttp)
      throw new IllegalArgumentException(
        "crawl(extract = true) over an http(s) source is not supported; " +
          "crawl without extract, or stage the tree onto a Hadoop-visible FS")
    val fresh0 = Crawl.crawl(spark, sourceUri, existing, include, exclude)
    val (fresh, copied) =
      if (!extract) {
        val f = fresh0.cache()
        val n =
          if (isHttp) graft.pipelines.HttpCrawl.copyBlobs(spark, f, sourceUri, blobRoot)
          else ArchiveCopy.copyBlobs(spark, f, sourceUri, blobRoot)
        (f, n)
      } else {
        val base = sourceUri.stripSuffix("/")
        val withBytes = spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true").load(base)
          .select(regexp_replace(col("path"),
            "^.*?" + java.util.regex.Pattern.quote(base) + "/", "").as("key"),
            col("content"))
          .join(fresh0.select("key"), Seq("key"), "left_semi")
        val extracted = graft.pipelines.Extract.extractArchives(withBytes).cache()
        val described = extracted.select(
          col("key"),
          graft.functions.GraftFunctions
            .checksum(col("content"), checksumAlgorithm).as("content_hash"),
          col("size"),
          Crawl.guessMimetype(col("key")).as("mimetype"),
          current_timestamp().as("created_at"),
          current_timestamp().as("updated_at")).cache()
        val copied = writeBlobsFromBytes(extracted)
        (described, copied)
      }
    val added = fresh.count()
    publish(Rebuild.rebuild(existing, fresh, fresh.limit(0)), versionTs)
    Map("added" -> added, "blobs_copied" -> copied)
  }

  /** Write (key, content) rows content-addressed from in-memory bytes
    * (extraction path — members have no source file to copy from). */
  private[graft] def writeBlobsFromBytes(rows: DataFrame): Long = {
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val algo = checksumAlgorithm match {
      case "sha1" => "SHA-1"
      case "md5" => "MD5"
      case other => other.toUpperCase
    }
    val lake = blobRoot
    val written = spark.sparkContext.longAccumulator("blobs_written")
    rows.select("content").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val conf = confBc.value.value
        it.foreach { r =>
          val bytes = r.getAs[Array[Byte]](0)
          val md = java.security.MessageDigest.getInstance(algo)
          val ch = md.digest(bytes).map("%02x".format(_)).mkString
          val shard = s"${ch.substring(0, 2)}/${ch.substring(2, 4)}/${ch.substring(4, 6)}/$ch"
          val dst = new org.apache.hadoop.fs.Path(s"$lake/$shard")
          val fs = dst.getFileSystem(conf)
          if (!fs.exists(dst)) {
            val out = fs.create(dst)
            try out.write(bytes) finally out.close()
            written.add(1)
          }
        }
    }
    written.value
  }

  /** Import a memorious crawler store (sync/memorious.py): scan json⋈blob
    * records, derive keys by the chosen strategy, skip already-archived
    * keys, copy blobs content-addressed from their store paths, publish. */
  def importMemorious(dir: String,
                      strategy: graft.pipelines.Memorious.KeyStrategy =
                        graft.pipelines.Memorious.UrlPath,
                      versionTs: String = GraftDataset.nowTs()): Map[String, Long] = {
    val existing = documents
    val scanned = graft.pipelines.Memorious.deriveKey(
      graft.pipelines.Memorious.scan(spark, dir), strategy)
    val fresh = Crawl.skipExisting(scanned, existing).cache()
    val records = fresh.select(
      col("key"), col("content_hash"), col("size"),
      Crawl.guessMimetype(col("key")).as("mimetype"),
      current_timestamp().as("created_at"),
      current_timestamp().as("updated_at"))
    val copied = ArchiveCopy.copyBlobPaths(spark,
      fresh.select(col("blob_path").as("src_path"), col("content_hash")),
      blobRoot)
    val added = records.count()
    publish(Rebuild.rebuild(existing, records, records.limit(0)), versionTs)
    fresh.unpersist()
    Map("added" -> added, "blobs_copied" -> copied)
  }

  /** Diff lines (`+`/`-` text) recorded for one published version. */
  def versionDiff(versionTs: String): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$metaRoot/versions/$versionTs.diff")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Nil
    else spark.read.textFile(dir.toString).collect().toSeq.sorted
  }

  /** Reconcile a source tree against the current documents table (make):
    * full-outer join → add/verify/heal/delete → publish. */
  def make(sourceUri: String,
           versionTs: String = GraftDataset.nowTs()): Map[String, Long] = {
    val source = Crawl.hashAndDescribe(spark, sourceUri,
      Crawl.listKeys(spark, sourceUri), checksumAlgorithm)
    val rec = Make.reconcile(source, documents).cache()
    val status = Make.status(rec).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    publish(Make.healed(rec), versionTs)
    status
  }

  /** Publish a new documents state: snapshot + diff vs previous + index.
    * With `bucketedLayout`, the parquet system of record is an external
    * key-bucketed table rooted in the lake, so every later lifecycle join
    * against `documents` (rebuild anti-join, reconcile full-outer,
    * skip-existing) reads pre-partitioned data and shuffles only the
    * incoming side. CSV snapshot / diff / index are layout-independent. */
  def publish(next: DataFrame, versionTs: String = GraftDataset.nowTs()): Unit = {
    // Eager localCheckpoints BEFORE any write: they materialize the new
    // state and the diff distributed across executors AND cut the lineage
    // back to the current table — the bucketed path drops and recreates
    // that table, which uncaches (cascade) every plan still referencing
    // it, so anything lazy here would recompute from deleted files.
    val prev = documents
    val nextOrdered = next.orderBy("key").localCheckpoint()
    val diff = Diff.snapshotDiff(
      prev.select("key", "content_hash", "size"),
      nextOrdered.select("key", "content_hash", "size")).localCheckpoint()
    val diffLines = Diff.toDiffLines(diff)
    if (mirrorFileInfo) {
      // RFC-interop per-file info.json mirror, diff-driven: only changed
      // keys write, removed keys (in "-" but not "+") delete
      val addedKeys = diff.filter(col("diff_op") === "+").select("key")
      graft.core.FileInfoMirror.write(
        nextOrdered.join(addedKeys, Seq("key"), "left_semi"), metaRoot, name)
      val removedKeys = diff.filter(col("diff_op") === "-").select("key")
        .except(addedKeys)
      graft.core.FileInfoMirror.delete(removedKeys, metaRoot)
    }
    if (bucketedLayout) {
      DocumentsStore.writeBucketedAt(nextOrdered, bucketedTableName,
        s"$metaRoot/documents.parquet", buckets)
      DocumentsStore.writeVersionCsv(nextOrdered, metaRoot, versionTs)
    } else {
      DocumentsStore.writeSnapshot(nextOrdered, metaRoot, versionTs)
    }
    DocumentsStore.writeDiff(diffLines, metaRoot, versionTs)
    Stats.writeIndexJson(nextOrdered, name, s"$metaRoot/index.json")
    nextOrdered.unpersist(); diff.unpersist()
  }

  def entities: DataFrame = Entities.fromDocuments(documents, name,
    checksumAlgorithm)

  def writeEntities(): Unit =
    entities.write.mode("overwrite").json(s"$metaRoot/entities.ftm.json")

  def versions: Seq[String] = DocumentsStore.versions(spark, metaRoot)

  def lookup(key: String): Option[Map[String, String]] =
    PointLookup.lookupHeaders(documents, name, key)

  /** Complete archive export (reference export.py:13-36: ZipStore over
    * EVERY storage key — metadata tree AND blob store — so the zip is a
    * re-mountable archive, tests/test_export.py:5-16). Listing fans out
    * across executors; the zip sink itself is the one sequential stage
    * (the reference pins it to 1 consumer thread for the same reason).
    * Entries are `<dataset>/<relative path>`; bytes stream through a
    * 64 KiB buffer. */
  def exportArchiveZip(zipPath: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val outPath = new org.apache.hadoop.fs.Path(zipPath)
    val fs = outPath.getFileSystem(conf)
    val out = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(fs.create(outPath, true)))
    var n = 0L
    val buf = new Array[Byte](65536)
    try {
      // a NUL (U+0000) prefix matches no real key → metadata tree included
      val it = Crawl.listKeys(spark, datasetRoot, metadataPrefix = "\u0000")
        .orderBy("key").toLocalIterator()
      while (it.hasNext) {
        val rel = it.next().getString(0)
        val src = new org.apache.hadoop.fs.Path(s"$datasetRoot/$rel")
        val sfs = src.getFileSystem(conf)
        out.putNextEntry(new java.util.zip.ZipEntry(s"$name/$rel"))
        val in = sfs.open(src)
        try {
          var read = in.read(buf)
          while (read >= 0) { out.write(buf, 0, read); read = in.read(buf) }
        } finally in.close()
        out.closeEntry()
        n += 1
      }
    } finally out.close()
    n
  }

  /** Read one blob's bytes straight from its content-addressed shard path —
    * pure FS IO, no Spark job. */
  private def blobBytes(contentHash: String): Array[Byte] = {
    val ch = contentHash
    val shard = s"${ch.substring(0, 2)}/${ch.substring(2, 4)}/${ch.substring(4, 6)}/$ch"
    val p = new org.apache.hadoop.fs.Path(s"$blobRoot/$shard")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  /** Open one blob by key: one pushed-filter metadata lookup resolves the
    * content hash, then the bytes stream from the FS (no second job). */
  def openBlob(key: String): Option[Array[Byte]] =
    documents.filter(col("key") === key).select("content_hash").limit(1)
      .collect().headOption.map(r => blobBytes(r.getString(0)))

  /** Zip export: EXACTLY ONE Spark job (the sorted metadata scan, streamed
    * through the driver with `toLocalIterator` — at no point do all keys,
    * let alone blobs, sit in driver memory); each blob then streams
    * FS→zip through a 64 KiB buffer via its content-addressed shard path.
    * Zip bytes go through the Hadoop FS so `zipPath` may be on any
    * supported scheme. Single-writer semantics mirror reference
    * export.py:13-36 (the zip format itself forces one writer). */
  def exportZip(zipPath: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val outPath = new org.apache.hadoop.fs.Path(zipPath)
    val fs = outPath.getFileSystem(conf)
    val out = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(fs.create(outPath, true)))
    var n = 0L
    val buf = new Array[Byte](65536)
    try {
      val it = documents.select("key", "content_hash")
        .orderBy("key").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val key = r.getString(0); val ch = r.getString(1)
        val shard = s"${ch.substring(0, 2)}/${ch.substring(2, 4)}/${ch.substring(4, 6)}/$ch"
        val bp = new org.apache.hadoop.fs.Path(s"$blobRoot/$shard")
        val bfs = bp.getFileSystem(conf)
        out.putNextEntry(new java.util.zip.ZipEntry(s"$name/$key"))
        val in = bfs.open(bp)
        try {
          var read = in.read(buf)
          while (read >= 0) { out.write(buf, 0, read); read = in.read(buf) }
        } finally in.close()
        out.closeEntry()
        n += 1
      }
    } finally out.close()
    n
  }
}

/** Archive root: a collection of datasets + the catalog rollup
  * (SURVEY §1 Archive/Catalog; archive/base.py:48-83). */
final class GraftArchive(val spark: SparkSession, val root: String) {

  def dataset(name: String, bucketedLayout: Boolean = false): GraftDataset =
    new GraftDataset(spark, root, name, bucketedLayout = bucketedLayout)

  /** Dataset names = child dirs containing a `.graft` marker DIRECTORY
    * (the metadata root). Hadoop FS listing (works on s3a://hdfs:// lake
    * roots, where java.io.File would silently see nothing). A stray
    * `.graft` *file* does not make a directory a dataset, and the
    * getFileStatus probe is one RPC per child (same as exists). */
  def datasetNames: Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(root)
    val fs = dir.getFileSystem(conf)
    def isMarkerDir(p: org.apache.hadoop.fs.Path): Boolean =
      try fs.getFileStatus(p).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory &&
        isMarkerDir(new org.apache.hadoop.fs.Path(st.getPath, ".graft")))
      .map(_.getPath.getName).sorted
  }

  /** Catalog rollup (A7): one row per dataset, plus catalog.json. */
  def makeCatalog(): DataFrame = {
    val perDs = datasetNames.map { n =>
      dataset(n).documents.withColumn("dataset", lit(n))
    }
    if (perDs.isEmpty)
      spark.emptyDataFrame
    else {
      val cat = Stats.catalog(perDs.reduce(_ unionByName _))
      val rows = cat.collect().map { r =>
        s"""{"name":"${r.getString(0)}","file_count":${r.getLong(1)},""" +
          s""""total_file_size":${r.getLong(2)}}"""
      }.mkString("[", ",", "]")
      Stats.writeString(spark, s"$root/catalog.json", s"""{"datasets":$rows}""")
      cat
    }
  }
}

object GraftDataset {
  def nowTs(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH-mm-ss.SSS")
      .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
}
