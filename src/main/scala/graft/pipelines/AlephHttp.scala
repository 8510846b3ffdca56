package graft.pipelines

import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.core.MiniJson

/** [[AlephConnector]] over real HTTP, speaking the alephclient wire
  * surface the reference drives (connectors/aleph.py:32-130 via
  * `alephclient.api.AlephAPI`):
  *
  *   - collection get-or-create:
  *     `GET  /api/2/collections?filter:foreign_id=<fid>` then
  *     `POST /api/2/collections` (`load_collection_by_foreign_id`);
  *   - folder create / document upload:
  *     `POST /api/2/collections/<id>/ingest` — form-encoded `meta` JSON
  *     for metadata-only (folder) ingests, multipart `meta` + `file` when
  *     blob bytes are supplied (`ingest_upload`'s two branches);
  *   - entity batches: `POST /api/2/collections/<id>/_bulk` with a JSON
  *     array body (`write_entities`).
  *
  * Auth is the `Authorization: ApiKey <key>` header. Transient failures
  * (HTTP 429/5xx, connection errors) retry up to `maxAttempts` with
  * exponential backoff, honoring a numeric `Retry-After` when the server
  * sends one — mirroring alephclient's retryable `AlephException`
  * semantics. Other 4xx fail fast with the response body in the error.
  *
  * Serializable by construction (uploads run from executor partitions):
  * the HttpClient is rebuilt lazily per JVM; state is strings + a
  * serializable blob-opener. The resolved collection id is cached per
  * instance (the reference caches `get_or_create_collection_id`).
  *
  * @param openBlob optional (key, contentHash) → bytes for the multipart
  *                 file part; None uploads metadata-only, which is also
  *                 how folders are created.
  */
final class AlephHttpConnector(
    host: String,
    apiKey: String,
    foreignId: String,
    openBlob: (String, String) => Option[Array[Byte]] =
      AlephHttpConnector.NoBlobs,
    maxAttempts: Int = 5,
    backoffMs: Long = 50L) extends AlephConnector {

  private val base = host.stripSuffix("/") + "/api/2"

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .build()

  // resolved once per (deserialized) instance, like the reference's cached
  // get_or_create_collection_id
  @transient private lazy val collectionId: String = {
    val fid = URLEncoder.encode(foreignId, "UTF-8")
    val listed = request("GET", s"$base/collections?filter%3Aforeign_id=$fid",
      None, None)
    val existing = MiniJson.field(MiniJson.parse(listed), "results")
      .collect { case rs: List[_] => rs }.getOrElse(Nil)
      .find(r => MiniJson.field(r, "foreign_id").contains(foreignId))
      .flatMap(r => MiniJson.field(r, "id").flatMap(MiniJson.idString))
    existing.getOrElse {
      val body = MiniJson.write(Map(
        "foreign_id" -> foreignId, "label" -> foreignId,
        "casefile" -> false, "category" -> "other"))
      val created = request("POST", s"$base/collections",
        Some(("application/json", body.getBytes(UTF_8))), None)
      idOf(MiniJson.parse(created), s"create collection $foreignId")
    }
  }

  override def createFolder(path: String, parentId: Option[String]): String = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val meta: Map[String, Any] = Map(
      "file_name" -> name, "foreign_id" -> path) ++
      parentId.map(p => "parent" -> Map("id" -> p))
    idOf(ingest(meta, None), s"create folder $path")
  }

  override def uploadDocument(key: String, contentHash: String,
                              metadata: Map[String, String]): String = {
    // flat pipeline metadata → wire shape: parent_id nests as
    // {"parent": {"id": ...}} (sync/aleph.py:103-123)
    val meta: Map[String, Any] =
      (metadata - "parent_id").map { case (k, v) => k -> (v: Any) } ++
        metadata.get("parent_id").map(p => "parent" -> Map("id" -> p))
    val fileName = metadata.getOrElse("file_name",
      key.substring(key.lastIndexOf('/') + 1))
    val blob = openBlob(key, contentHash)
    idOf(ingest(meta, blob.map(b => (fileName, b))), s"upload $key")
  }

  override def writeEntities(batch: Seq[String]): Unit =
    if (batch.nonEmpty) {
      // entity lines are already JSON objects (the S4 JSON-lines sink) —
      // the bulk body is their array
      val body = batch.mkString("[", ",", "]")
      request("POST", s"$base/collections/$collectionId/_bulk",
        Some(("application/json", body.getBytes(UTF_8))), None)
      ()
    }

  // ------------------------------------------------------------- wire
  private def ingest(meta: Map[String, Any],
                     file: Option[(String, Array[Byte])]): Any = {
    val metaJson = MiniJson.write(meta)
    val url = s"$base/collections/$collectionId/ingest"
    val resp = file match {
      case None =>
        // alephclient sends metadata-only ingests as a form body
        val body = "meta=" + URLEncoder.encode(metaJson, "UTF-8")
        request("POST", url,
          Some(("application/x-www-form-urlencoded", body.getBytes(UTF_8))),
          None)
      case Some((name, bytes)) =>
        val boundary = "graft-" + java.util.UUID.randomUUID().toString
        request("POST", url,
          Some((s"multipart/form-data; boundary=$boundary",
            multipart(boundary, metaJson, name, bytes))), None)
    }
    MiniJson.parse(resp)
  }

  private def multipart(boundary: String, metaJson: String,
                        fileName: String, bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    w(s"--$boundary\r\n")
    w("Content-Disposition: form-data; name=\"meta\"\r\n\r\n")
    w(metaJson); w("\r\n")
    w(s"--$boundary\r\n")
    w("Content-Disposition: form-data; name=\"file\"; " +
      s"""filename="${fileName.replace("\"", "")}"\r\n""")
    w("Content-Type: application/octet-stream\r\n\r\n")
    out.write(bytes); w("\r\n")
    w(s"--$boundary--\r\n")
    out.toByteArray
  }

  private def idOf(parsed: Any, what: String): String =
    MiniJson.field(parsed, "id").flatMap(MiniJson.idString)
      .getOrElse(throw new java.io.IOException(
        s"no id in response for $what: $parsed"))

  /** One HTTP exchange with bounded retry on transient failures. */
  private def request(method: String, url: String,
                      body: Option[(String, Array[Byte])],
                      accept: Option[String]): String = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val b = HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofSeconds(60))
          .header("Authorization", s"ApiKey $apiKey")
        body match {
          case Some((ct, bytes)) => b.header("Content-Type", ct)
            .method(method, HttpRequest.BodyPublishers.ofByteArray(bytes))
          case None => b.method(method, HttpRequest.BodyPublishers.noBody())
        }
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code >= 200 && code < 300) return resp.body()
        if (code == 429 || code >= 500) {
          // retryable, alephclient-style; honor a numeric Retry-After
          val ra = resp.headers().firstValue("Retry-After")
          val retryAfter: Long =
            if (ra.isPresent && ra.get().matches("[0-9]+"))
              ra.get().toLong * 1000L
            else -1L
          lastErr = new java.io.IOException(s"HTTP $code from $url")
          if (attempt < maxAttempts)
            Thread.sleep(if (retryAfter >= 0) retryAfter
              else backoffMs << (attempt - 1))
        } else {
          throw new AlephHttpConnector.ClientError(
            s"HTTP $code from $url: ${resp.body().take(500)}")
        }
      } catch {
        case e: AlephHttpConnector.ClientError => throw e
        case e: InterruptedException => throw e
        case e: java.io.IOException =>
          // transient (connect/socket-level errors may carry null messages)
          lastErr = e
          if (attempt < maxAttempts) Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new java.io.IOException(
      s"$method $url failed after $maxAttempts attempts", lastErr)
  }
}

object AlephHttpConnector {
  /** Non-retryable request failure (4xx other than 429): the server
    * understood and rejected the request, so retrying cannot help —
    * distinguished by type, not by message prefix, because transient
    * IOExceptions (connect/socket) may carry null messages. */
  final class ClientError(msg: String) extends java.io.IOException(msg)

  /** Default blob opener: metadata-only uploads. */
  val NoBlobs: (String, String) => Option[Array[Byte]] =
    new ((String, String) => Option[Array[Byte]]) with Serializable {
      override def apply(k: String, h: String): Option[Array[Byte]] = None
    }

  /** Serializable opener over the dataset's content-addressed blob layout
    * (`blobs/ab/cd/ef/<hash>`) — uploads run on executors, so the opener
    * carries only the root string and resolves the FS per call. */
  def contentAddressedBlobs(blobRoot: String)
      : (String, String) => Option[Array[Byte]] =
    new ((String, String) => Option[Array[Byte]]) with Serializable {
      override def apply(key: String, ch: String): Option[Array[Byte]] = {
        if (ch == null || ch.length < 6) return None
        val shard =
          s"${ch.substring(0, 2)}/${ch.substring(2, 4)}/${ch.substring(4, 6)}/$ch"
        val p = new org.apache.hadoop.fs.Path(s"$blobRoot/$shard")
        try {
          val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          if (!fs.exists(p)) None
          else {
            val in = fs.open(p)
            try Some(in.readAllBytes()) finally in.close()
          }
        } catch { case _: java.io.IOException => None }
      }
    }
}
