package graft

import java.net.InetSocketAddress
import java.sql.Timestamp
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row}

import graft.core.{DocumentsStore, MiniJson, Model}
import graft.pipelines.{AlephHttpConnector, AlephSync}

/** In-process mock of the alephclient HTTP surface the reference drives
  * (connectors/aleph.py:32-130): collection get-or-create, metadata-only
  * and multipart ingest, entity bulk writes — plus programmable 5xx
  * failures for the retry path. Single-JVM shared state so executor-side
  * requests land in the same buffers (same pattern as AlephRecorder). */
object MockAleph {
  final case class Ingest(collection: String, meta: Map[String, Any],
                          hasFile: Boolean, fileBytes: Int)
  val collections = new java.util.concurrent.ConcurrentHashMap[String, String]
  val ingests = new CopyOnWriteArrayList[Ingest]
  val bulks = new CopyOnWriteArrayList[(String, List[Any])]
  val failNext = new AtomicInteger(0) // ingest requests to 503 before serving
  val requests = new AtomicInteger(0)
  private val nextId = new AtomicInteger(1000)

  def reset(): Unit = {
    collections.clear(); ingests.clear(); bulks.clear()
    failNext.set(0); requests.set(0); nextId.set(1000)
  }

  def start(): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/2/", handle _)
    server.start()
    server
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
                      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.getResponseHeaders.set("content-type", "application/json")
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit = try {
    requests.incrementAndGet()
    val path = ex.getRequestURI.getPath.stripPrefix("/api/2").stripSuffix("/")
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    if (Option(ex.getRequestHeaders.getFirst("Authorization"))
        .forall(!_.startsWith("ApiKey "))) {
      respond(ex, 403, """{"status":"error","message":"no api key"}""")
      return
    }
    (ex.getRequestMethod, path) match {
      case ("GET", "/collections") =>
        val fid = query.split("&").collectFirst {
          case kv if kv.startsWith("filter:foreign_id=") =>
            java.net.URLDecoder.decode(
              kv.stripPrefix("filter:foreign_id="), "UTF-8")
        }
        val results = fid.flatMap(f => Option(collections.get(f))).map { id =>
          s"""{"id":${MiniJson.quote(id)},"foreign_id":${MiniJson.quote(fid.get)}}"""
        }.toSeq
        respond(ex, 200, s"""{"results":[${results.mkString(",")}]}""")

      case ("POST", "/collections") =>
        val fid = MiniJson.field(MiniJson.parse(body), "foreign_id")
          .collect { case s: String => s }.get
        val id = collections.computeIfAbsent(fid,
          _ => s"col-${nextId.incrementAndGet()}")
        respond(ex, 200,
          s"""{"id":${MiniJson.quote(id)},"foreign_id":${MiniJson.quote(fid)}}""")

      case ("POST", p) if p.matches("/collections/[^/]+/ingest") =>
        if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
          respond(ex, 503, """{"status":"error"}""",
            Map("Retry-After" -> "0"))
          return
        }
        val col = p.split("/")(2)
        val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
        val (meta, hasFile, fileBytes) =
          if (ct.startsWith("multipart/form-data")) {
            val boundary = ct.split("boundary=")(1)
            val parts = body.split(java.util.regex.Pattern.quote("--" + boundary))
              .filter(p => p.contains("Content-Disposition"))
            val metaPart = parts.find(_.contains("name=\"meta\"")).get
            val filePart = parts.find(_.contains("name=\"file\""))
            val metaJson = metaPart.split("\r\n\r\n", 2)(1).stripSuffix("\r\n")
            (MiniJson.parse(metaJson).asInstanceOf[Map[String, Any]],
              filePart.isDefined,
              filePart.map(_.split("\r\n\r\n", 2)(1).stripSuffix("\r\n").length)
                .getOrElse(0))
          } else {
            val metaJson = java.net.URLDecoder.decode(
              body.stripPrefix("meta="), "UTF-8")
            (MiniJson.parse(metaJson).asInstanceOf[Map[String, Any]], false, 0)
          }
        ingests.add(Ingest(col, meta, hasFile, fileBytes))
        val fid = meta.get("foreign_id").collect { case s: String => s }
          .getOrElse("?")
        respond(ex, 200, s"""{"id":${MiniJson.quote(s"ing-$fid")}}""")

      case ("POST", p) if p.matches("/collections/[^/]+/_bulk") =>
        val col = p.split("/")(2)
        bulks.add((col, MiniJson.parse(body).asInstanceOf[List[Any]]))
        respond(ex, 200, """{"status":"ok"}""")

      case _ =>
        respond(ex, 404, s"""{"status":"error","message":"no route $path"}""")
    }
  } catch {
    case e: Throwable =>
      respond(ex, 500, s"""{"status":"error","message":${MiniJson.quote(e.toString)}}""")
  }
}

/** End-to-end Aleph sync through REAL HTTP: the full syncDocuments /
  * syncEntities pipelines drive AlephHttpConnector (java.net.http) against
  * the in-process alephclient mock — the wire-level counterpart of
  * AlephSyncSpec's recorder tests. */
class AlephHttpSpec extends SparkSpec {
  import spark.implicits._

  private def docs(keys: String*): DataFrame = {
    val ts = Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = keys.map(k => Row(k, s"hash-$k", 1L, "text/plain", ts, ts))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Model.documentsSchema)
  }

  private def withServer(f: String => Unit): Unit = {
    MockAleph.reset()
    val server = MockAleph.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("collection get-or-create round-trips over HTTP") {
    withServer { host =>
      val c1 = new AlephHttpConnector(host, "k1", "ds_http")
      val id1 = c1.createFolder("a", None) // forces collection resolution
      assert(id1 == "ing-a")
      assert(MockAleph.collections.get("ds_http") != null)
      // a second connector instance resolves the SAME collection (GET path)
      val c2 = new AlephHttpConnector(host, "k1", "ds_http")
      c2.createFolder("b", None)
      assert(MockAleph.collections.size == 1)
    }
  }

  test("syncDocuments runs end-to-end over HTTP: folders nest, uploads carry metadata") {
    withServer { host =>
      val root = java.nio.file.Files.createTempDirectory("alephhttp").toString
      DocumentsStore.writeSnapshot(docs("top.txt", "a/b/one.txt"),
        s"$root/meta", "v1")
      val st = AlephSync.syncDocuments(spark, s"$root/meta", s"$root/ledger",
        "ds_http", new AlephHttpConnector(host, "k1", "ds_http"))
      assert(st == graft.pipelines.AlephSyncStatus(1, 2, 2))
      val ing = MockAleph.ingests.toArray.map(_.asInstanceOf[MockAleph.Ingest])
      val byFid = ing.map(i => i.meta("foreign_id") -> i).toMap
      // folder chain a → a/b with nested parent ids (aleph.py:62-73 shape)
      assert(byFid("a").meta.get("parent").isEmpty)
      assert(MiniJson.field(byFid("a/b").meta("parent"), "id")
        .contains("ing-a"))
      // document upload: file_name + nested parent {"id": ...}
      val up = byFid("a/b/one.txt")
      assert(up.meta("file_name") == "one.txt")
      assert(MiniJson.field(up.meta("parent"), "id").contains("ing-a/b"))
      assert(!up.hasFile) // no blob opener wired → metadata-only
      // re-run: ledger memoization ⇒ zero new HTTP ingests
      val before = MockAleph.ingests.size
      val st2 = AlephSync.syncDocuments(spark, s"$root/meta", s"$root/ledger",
        "ds_http", new AlephHttpConnector(host, "k1", "ds_http"))
      assert(st2 == graft.pipelines.AlephSyncStatus(0, 0, 0))
      assert(MockAleph.ingests.size == before)
    }
  }

  test("uploads stream blob bytes as multipart when an opener is wired") {
    withServer { host =>
      val conn = new AlephHttpConnector(host, "k1", "ds_blob",
        openBlob = AlephHttpSpec.FakeBlobs)
      conn.uploadDocument("x/data.bin", "h123",
        Map("file_name" -> "data.bin", "foreign_id" -> "x/data.bin"))
      val ing = MockAleph.ingests.toArray.map(_.asInstanceOf[MockAleph.Ingest])
      assert(ing.exists(i => i.hasFile && i.fileBytes == 11))
    }
  }

  test("transient 5xx retries until success (alephclient retry semantics)") {
    withServer { host =>
      MockAleph.failNext.set(2) // two 503s, then 200
      val conn = new AlephHttpConnector(host, "k1", "ds_retry",
        maxAttempts = 4, backoffMs = 1)
      val id = conn.createFolder("f", None)
      assert(id == "ing-f")
      // exhausted retries surface the failure
      MockAleph.failNext.set(99)
      val e = intercept[java.io.IOException] {
        new AlephHttpConnector(host, "k1", "ds_retry",
          maxAttempts = 2, backoffMs = 1).createFolder("g", None)
      }
      assert(e.getMessage.contains("failed after 2 attempts"))
    }
  }

  test("bad api key fails fast without retry") {
    withServer { host =>
      val before = MockAleph.requests.get()
      val e = intercept[java.io.IOException] {
        new AlephHttpConnector(host, "", "ds_auth").createFolder("f", None)
      }
      assert(e.getMessage.contains("HTTP 403"))
      // fail-fast: only the collection-resolution GET + one POST attempt...
      // actually the 403 hits the first GET; no retry storm
      assert(MockAleph.requests.get() - before <= 2)
    }
  }

  test("CLI aleph-sync crawls a lake and uploads blobs as multipart over HTTP") {
    withServer { host =>
      val lake = java.nio.file.Files.createTempDirectory("aleph-cli").toString
      val src = java.nio.file.Files.createTempDirectory("aleph-src")
      java.nio.file.Files.write(src.resolve("report.txt"),
        "file body here".getBytes("UTF-8"))
      def cli(args: String*): (Int, String) = {
        val buf = new java.io.ByteArrayOutputStream()
        val code = Cli.run(spark, args.toSeq,
          new java.io.PrintStream(buf, true, "UTF-8"))
        (code, new String(buf.toByteArray, "UTF-8"))
      }
      val base = Seq("--archive", lake, "-d", "cli_aleph")
      val (c1, _) = cli(base ++ Seq("crawl", src.toString): _*)
      assert(c1 == 0)
      val (c2, outStr) = cli(base ++ Seq("aleph-sync", "--host", host,
        "--api-key", "k1"): _*)
      assert(c2 == 0, outStr)
      assert(outStr.contains("\"uploaded\":1"))
      val ing = MockAleph.ingests.toArray.map(_.asInstanceOf[MockAleph.Ingest])
      val up = ing.find(_.meta.get("foreign_id").contains("report.txt")).get
      // the blob's bytes went up as a multipart file part
      assert(up.hasFile && up.fileBytes == "file body here".length)
      // memoized re-run uploads nothing new
      val before = MockAleph.ingests.size
      val (c3, out3) = cli(base ++ Seq("aleph-sync", "--host", host,
        "--api-key", "k1"): _*)
      assert(c3 == 0 && out3.contains("\"uploaded\":0"))
      assert(MockAleph.ingests.size == before)
    }
  }

  test("CLI aleph-load-dataset / load-catalog push entity sinks over HTTP") {
    withServer { host =>
      val lake = java.nio.file.Files.createTempDirectory("aleph-load").toString
      val src = java.nio.file.Files.createTempDirectory("aleph-load-src")
      java.nio.file.Files.write(src.resolve("a.txt"), "alpha".getBytes("UTF-8"))
      java.nio.file.Files.write(src.resolve("b.txt"), "beta".getBytes("UTF-8"))
      def cli(args: String*): (Int, String) = {
        val buf = new java.io.ByteArrayOutputStream()
        val code = Cli.run(spark, args.toSeq,
          new java.io.PrintStream(buf, true, "UTF-8"))
        (code, new String(buf.toByteArray, "UTF-8"))
      }
      assert(cli("--archive", lake, "-d", "ds_a", "crawl", src.toString)._1 == 0)
      // load-dataset publishes the entities sink when absent, then pushes
      val (c1, o1) = cli("--archive", lake, "-d", "ds_a",
        "aleph-load-dataset", "--host", host, "--api-key", "k1")
      assert(c1 == 0, o1)
      assert(o1.contains("\"resources\":1"))
      val sent = MockAleph.bulks.toArray
        .map(_.asInstanceOf[(String, List[Any])]).flatMap(_._2)
      assert(sent.size == 2) // one FTM entity per crawled file
      // memoized: identical content re-pushes nothing
      val (c2, o2) = cli("--archive", lake, "-d", "ds_a",
        "aleph-load-dataset", "--host", host, "--api-key", "k1")
      assert(c2 == 0 && o2.contains("\"resources\":0"), o2)
      // catalog sweep honors the exclude glob
      val (c3, o3) = cli("--archive", lake, "aleph-load-catalog",
        "--host", host, "--api-key", "k1", "--exclude", "ds_*")
      assert(c3 == 0 && o3.contains("\"resources\":0"), o3)
    }
  }

  test("load-catalog routes each dataset to its own collection (aleph.py:117)") {
    withServer { host =>
      val lake = java.nio.file.Files.createTempDirectory("aleph-cat").toString
      def cli(args: String*): (Int, String) = {
        val buf = new java.io.ByteArrayOutputStream()
        val code = Cli.run(spark, args.toSeq,
          new java.io.PrintStream(buf, true, "UTF-8"))
        (code, new String(buf.toByteArray, "UTF-8"))
      }
      for (ds <- Seq("cat_a", "cat_b")) {
        val src = java.nio.file.Files.createTempDirectory(s"src-$ds")
        java.nio.file.Files.write(src.resolve(s"$ds.txt"),
          ds.getBytes("UTF-8"))
        assert(cli("--archive", lake, "-d", ds, "crawl", src.toString)._1 == 0)
        assert(cli("--archive", lake, "-d", ds,
          "aleph-load-dataset", "--host", host, "--api-key", "k1")._1 == 0)
      }
      // one collection PER DATASET, foreign_id = dataset name — the
      // reference's load_catalog default (connectors/aleph.py:117)
      assert(MockAleph.collections.containsKey("cat_a"), "no cat_a collection")
      assert(MockAleph.collections.containsKey("cat_b"), "no cat_b collection")
      val colOf = Map(
        "cat_a" -> MockAleph.collections.get("cat_a"),
        "cat_b" -> MockAleph.collections.get("cat_b"))
      assert(colOf("cat_a") != colOf("cat_b"))
      // catalog sweep (fresh ledger root) without --foreign-id keeps the
      // per-dataset routing: each dataset's entities hit its own collection
      val lake2 = java.nio.file.Files.createTempDirectory("aleph-cat2").toString
      for (ds <- Seq("cat_a", "cat_b")) {
        val src = java.nio.file.Files.createTempDirectory(s"src2-$ds")
        java.nio.file.Files.write(src.resolve(s"$ds.txt"), ds.getBytes("UTF-8"))
        assert(cli("--archive", lake2, "-d", ds, "crawl", src.toString)._1 == 0)
        new graft.GraftArchive(spark, lake2).dataset(ds).writeEntities()
      }
      MockAleph.bulks.clear()
      val (cc, oc) = cli("--archive", lake2, "aleph-load-catalog",
        "--host", host, "--api-key", "k1")
      assert(cc == 0 && oc.contains("\"resources\":2"), oc)
      val hit = MockAleph.bulks.toArray
        .map(_.asInstanceOf[(String, List[Any])]._1).toSet
      assert(hit == Set(colOf("cat_a"), colOf("cat_b")),
        s"bulk writes hit $hit, expected per-dataset collections $colOf")
      // forcing --foreign-id still funnels everything into one collection
      val lake3 = java.nio.file.Files.createTempDirectory("aleph-cat3").toString
      for (ds <- Seq("cat_a", "cat_b")) {
        val src = java.nio.file.Files.createTempDirectory(s"src3-$ds")
        java.nio.file.Files.write(src.resolve(s"$ds.txt"), ds.getBytes("UTF-8"))
        assert(cli("--archive", lake3, "-d", ds, "crawl", src.toString)._1 == 0)
        new graft.GraftArchive(spark, lake3).dataset(ds).writeEntities()
      }
      MockAleph.bulks.clear()
      val (cf, of) = cli("--archive", lake3, "aleph-load-catalog",
        "--host", host, "--api-key", "k1", "--foreign-id", "one_pot")
      assert(cf == 0 && of.contains("\"resources\":2"), of)
      val hitF = MockAleph.bulks.toArray
        .map(_.asInstanceOf[(String, List[Any])]._1).toSet
      assert(hitF == Set(MockAleph.collections.get("one_pot")), s"$hitF")
    }
  }

  test("connect-level failures (possibly null-message IOExceptions) retry, not NPE") {
    // a raw socket that accepts and immediately resets produces low-level
    // IOExceptions from java.net.http; the retry loop must classify them
    // as transient by TYPE (not by message prefix — messages can be null)
    val srv = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val killer = new Thread(() => {
      try while (true) srv.accept().close()
      catch { case _: java.io.IOException => () }
    })
    killer.setDaemon(true); killer.start()
    try {
      val conn = new AlephHttpConnector(
        s"http://127.0.0.1:${srv.getLocalPort}", "k1", "ds_reset",
        maxAttempts = 3, backoffMs = 1)
      val e = intercept[java.io.IOException] {
        conn.createFolder("f", None)
      }
      // exhausted retries: the wrapper carries the transient cause — the
      // old message-prefix guard NPE'd here when getMessage was null
      assert(e.getMessage.contains("failed after 3 attempts"), e.toString)
      assert(e.getCause != null)
      assert(!e.getCause.isInstanceOf[NullPointerException])
    } finally srv.close()
  }

  test("syncEntities pushes FTM batches over the bulk endpoint") {
    withServer { host =>
      val root = java.nio.file.Files.createTempDirectory("alephent").toString
      val lines = (1 to 25).map(i => s"""{"id":"e$i","schema":"Thing"}""")
      java.nio.file.Files.write(java.nio.file.Paths.get(root, "ents.json"),
        lines.mkString("\n").getBytes("UTF-8"))
      val resources = Seq(
        ("ds_ent", s"$root/ents.json", AlephSync.FtmMimeType, "chk1"))
        .toDF("dataset", "url", "mime_type", "checksum")
      val st = AlephSync.syncEntities(spark, resources, s"$root/ledger",
        new AlephHttpConnector(host, "k1", "ds_ent"),
        url => spark.read.textFile(url).toDF(), batchSize = 10)
      assert(st == graft.pipelines.AlephEntitiesStatus(1, 25))
      val bulks = MockAleph.bulks.toArray
        .map(_.asInstanceOf[(String, List[Any])])
      assert(bulks.map(_._2.size).sum == 25)
      assert(bulks.forall(_._2.size <= 10))
      // entities arrive as parsed JSON objects with their ids intact
      val ids = bulks.flatMap(_._2).flatMap(e =>
        MiniJson.field(e, "id").collect { case s: String => s }).toSet
      assert(ids == (1 to 25).map(i => s"e$i").toSet)
    }
  }
}

object AlephHttpSpec {
  /** Serializable blob opener for the multipart test. */
  val FakeBlobs: (String, String) => Option[Array[Byte]] =
    new ((String, String) => Option[Array[Byte]]) with Serializable {
      override def apply(k: String, h: String): Option[Array[Byte]] =
        Some("hello bytes".getBytes("UTF-8"))
    }
}
