package graft.pipelines

import java.net.{HttpURLConnection, URI, URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7: crawl a remote HTTP location that supports directory listing
  * (an index-page server — the reference's `crawl https://…` path,
  * ftm_datalake/crawl.py:109-151; `docs/crawl.md` leads with it).
  *
  * The reference mounts an fsspec HTTP filesystem and forces a 24 h client
  * timeout (crawl.py:132-140) so very large single files survive. Spark
  * shape mirrors [[Crawl.listKeys]]: the driver fetches ONE index page (the
  * root); file links become rows, directory links fan out across executors,
  * each of which walks its subtree's index pages iteratively and streams
  * file bytes through a digest without ever materializing them
  * (X3 invariant). Read timeout on content fetches is 24 h to match the
  * reference's long-timeout concern; index pages use a short timeout.
  */
object HttpCrawl {

  private val IndexTimeoutMs = 60 * 1000
  private val ContentTimeoutMs = 24 * 3600 * 1000 // crawl.py:132-140

  /** Extract child hrefs from an HTML index page: skips parent links,
    * absolute URLs to other hosts, and query/fragment links. Directory
    * links keep their trailing slash. Absolute-PATH hrefs (Apache-style
    * indexes emit `/base/child` instead of `child`) are accepted when they
    * extend `pagePath` and are rebased to relative. */
  private[graft] def parseIndexLinks(html: String,
                                     pagePath: String = ""): Seq[String] = {
    val href = """(?i)href\s*=\s*"([^"]+)"""".r
    val prefix = if (pagePath.isEmpty) "/" else s"/${pagePath.stripSuffix("/")}/"
    href.findAllMatchIn(html).map(_.group(1)).toSeq
      .filterNot(h => h.startsWith("?") || h.startsWith("#"))
      .filterNot(h => h.contains("://") || h.startsWith("//"))
      .flatMap {
        case h if h.startsWith("/") =>
          // absolute path: keep only same-tree children, rebased relative
          if (h.startsWith(prefix) && h.length > prefix.length)
            Some(h.substring(prefix.length))
          else None
        case h => Some(h)
      }
      .filterNot(h => h == ".." || h == "../" || h.isEmpty)
      .filterNot(_.dropRight(1).contains("/")) // direct children only
  }

  /** Percent-encode one path segment (space → %20, not +). */
  private[graft] def encodeSegment(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8.name)
      .replace("+", "%20").replace("%2F", "/")

  /** Encode a slash-separated relative key for use in a URL path. */
  private[graft] def encodeKey(key: String): String =
    key.split("/", -1).map(encodeSegment).mkString("/")

  private def decodeSegment(s: String): String =
    URLDecoder.decode(s, StandardCharsets.UTF_8.name)

  private def openConn(url: String, readTimeoutMs: Int): HttpURLConnection = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(IndexTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setInstanceFollowRedirects(true)
    conn
  }

  /** Bounded retry with linear backoff for transient HTTP/IO failures
    * (the reference's worker layer retries tasks; per-request retry is the
    * equivalent at this granularity). Everything inside `f` must be
    * restartable — digests and sinks are constructed within it. */
  private def withRetries[T](what: => String, attempts: Int = 3,
                             backoffMs: Long = 500)(f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case e: java.io.IOException =>
          last = e; i += 1
          if (i < attempts) Thread.sleep(backoffMs * i)
      }
    }
    throw new java.io.IOException(s"giving up after $attempts attempts: $what",
      last)
  }

  private def fetchIndex(url: String): String = withRetries(s"list $url") {
    val conn = openConn(url, IndexTimeoutMs)
    try {
      val code = conn.getResponseCode
      if (code != 200)
        throw new java.io.IOException(s"HTTP $code listing $url")
      val in = conn.getInputStream
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    } finally conn.disconnect()
  }

  /** URL path component of a base URL, RAW (percent-encoded, matching how
    * hrefs appear in index pages), no surrounding slashes — the page-path
    * context for rebasing absolute hrefs. */
  private def basePathOf(base: String): String =
    new URI(base).getRawPath.stripPrefix("/").stripSuffix("/")

  /** Iteratively walk index pages under `base/prefix`, yielding decoded
    * relative keys. Runs on executors; the work-list holds directory
    * prefixes only, never file keys. */
  private def walkPrefix(base: String, prefix: String): Iterator[String] = {
    val basePath = basePathOf(base)
    val stack = scala.collection.mutable.Stack[String](prefix)
    new Iterator[String] {
      private var pending: List[String] = Nil
      private def refill(): Unit = {
        while (pending.isEmpty && stack.nonEmpty) {
          val dir = stack.pop()
          val url = if (dir.isEmpty) s"$base/" else s"$base/${encodeKey(dir)}/"
          val pagePath =
            Seq(basePath, encodeKey(dir)).filter(_.nonEmpty).mkString("/")
          val links = parseIndexLinks(fetchIndex(url), pagePath)
          val (dirs, files) = links.partition(_.endsWith("/"))
          dirs.foreach { d =>
            val name = decodeSegment(d.stripSuffix("/"))
            stack.push(if (dir.isEmpty) name else s"$dir/$name")
          }
          pending = files.map { f =>
            val name = decodeSegment(f)
            if (dir.isEmpty) name else s"$dir/$name"
          }.toList
        }
      }
      def hasNext: Boolean = { refill(); pending.nonEmpty }
      def next(): String = { refill(); val h = pending.head; pending = pending.tail; h }
    }
  }

  /** S1-over-HTTP: list all keys below `baseUrl`. The driver touches only
    * the root index page; subdirectory walks run on executors. */
  def listKeys(spark: SparkSession, baseUrl: String,
               metadataPrefix: String = ".ftm_datalake",
               listingParallelism: Int = 64): DataFrame = {
    import spark.implicits._
    val base = baseUrl.stripSuffix("/")
    val rootLinks = parseIndexLinks(fetchIndex(base + "/"), basePathOf(base))
    val (dirs, files) = rootLinks.partition(_.endsWith("/"))
    val topFiles = files.map(decodeSegment)
    val dirPrefixes = dirs.map(d => decodeSegment(d.stripSuffix("/")))
    val fanned =
      if (dirPrefixes.isEmpty) spark.emptyDataset[String]
      else {
        val slices = math.max(1, math.min(dirPrefixes.length, listingParallelism))
        spark.sparkContext.parallelize(dirPrefixes, slices)
          .mapPartitions(_.flatMap(p => walkPrefix(base, p)))
          .toDS()
      }
    (topFiles.toDS() union fanned).toDF("key")
      .filter(!col("key").startsWith(metadataPrefix))
  }

  /** Fetch each key's bytes on executors, streaming them through a digest
    * (64 KiB buffer, never materialized); size is counted from the stream
    * and mtime taken from the Last-Modified header (epoch default 0 when
    * the server omits it, matching filesystem-less sources). */
  def fetchAndDescribe(spark: SparkSession, baseUrl: String, keys: DataFrame,
                       algorithm: String = "sha1"): DataFrame = {
    import spark.implicits._
    val base = baseUrl.stripSuffix("/")
    val algoName = algorithm match {
      case "sha1" => "SHA-1"
      case "md5" => "MD5"
      case "sha256" => "SHA-256"
      case "sha512" => "SHA-512"
      case other => throw new IllegalArgumentException(s"unknown checksum algorithm: $other")
    }
    val fetched = keys.select("key").as[String].mapPartitions { it =>
      it.map { key =>
        withRetries(s"fetch $base/$key") {
          val conn = openConn(s"$base/${encodeKey(key)}", ContentTimeoutMs)
          try {
            val code = conn.getResponseCode
            if (code != 200)
              throw new java.io.IOException(s"HTTP $code fetching $base/$key")
            val mtime = new java.sql.Timestamp(conn.getLastModified)
            val md = java.security.MessageDigest.getInstance(algoName)
            var size = 0L
            // retain the head for magic-byte sniffing (same contract as
            // Crawl.hashAndDescribe — the digest streams every byte anyway)
            val head = new Array[Byte](MagicBytes.HeaderLen)
            var headLen = 0
            val in = conn.getInputStream
            try {
              val buf = new Array[Byte](65536)
              var n = in.read(buf)
              while (n >= 0) {
                md.update(buf, 0, n); size += n
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
          } finally conn.disconnect()
        }
      }
    }.toDF("key", "content_hash", "size", "mtime", "sniffed")
    fetched.select(
      col("key"), col("content_hash"), col("size"),
      coalesce(Crawl.extMimetype(col("key")), col("sniffed"),
        lit("application/octet-stream")).as("mimetype"),
      col("mtime").as("created_at"),
      col("mtime").as("updated_at"))
  }

  /** End-to-end remote crawl: same contract as [[Crawl.crawl]] but over an
    * HTTP index listing (tests/test_crawl.py:5-22 remote-vs-local parity). */
  def crawl(spark: SparkSession, baseUrl: String, existing: DataFrame,
            include: Option[String] = None,
            exclude: Option[String] = None): DataFrame = {
    val keys = Crawl.applyGlobs(listKeys(spark, baseUrl), include, exclude)
    val fresh = Crawl.skipExisting(keys, existing)
    fetchAndDescribe(spark, baseUrl, fresh)
  }

  /** S9 over HTTP: executor-side streaming copy of each key's bytes into
    * the content-addressed lake layout (the HTTP analog of
    * [[ArchiveCopy.copyBlobs]] — Hadoop ships no http:// FileSystem, so
    * the fetch side speaks HTTP and only the sink side goes through the
    * FS). Bytes stream through a 64 KiB buffer; existing blobs are
    * skipped. */
  def copyBlobs(spark: SparkSession, rows: DataFrame, baseUrl: String,
                lakeBase: String): Long = {
    val base = baseUrl.stripSuffix("/")
    val lake = lakeBase.stripSuffix("/")
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val copied = spark.sparkContext.longAccumulator("http_blobs_copied")
    rows.select("key", "content_hash").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val conf = confBc.value.value
        it.foreach { r =>
          val key = r.getString(0); val ch = r.getString(1)
          val shard = s"${ch.substring(0, 2)}/${ch.substring(2, 4)}/${ch.substring(4, 6)}/$ch"
          val dst = new org.apache.hadoop.fs.Path(s"$lake/$shard")
          val dfs = dst.getFileSystem(conf)
          if (!dfs.exists(dst)) {
            withRetries(s"copy $base/$key") {
              val conn = openConn(s"$base/${encodeKey(key)}", ContentTimeoutMs)
              try {
                if (conn.getResponseCode != 200)
                  throw new java.io.IOException(
                    s"HTTP ${conn.getResponseCode} fetching $base/$key")
                val in = conn.getInputStream
                val out = dfs.create(dst, true) // overwrite a failed partial
                try {
                  val buf = new Array[Byte](65536)
                  var n = in.read(buf)
                  while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
                } finally { in.close(); out.close() }
              } finally conn.disconnect()
            }
            copied.add(1)
          }
        }
    }
    copied.value
  }
}
