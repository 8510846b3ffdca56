package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.GraftArchive

/** Minimal HS256 JWT codec for the API's bearer tokens
  * (ftm_datalake/api/auth.py:43-68): the subject is `<dataset>/<key>` and
  * `exp` is a unix-seconds expiry. Standard JWS compact serialization
  * (base64url(header).base64url(payload).base64url(hmac)) — no external
  * dependency, constant-time signature compare.
  */
object Jwt {

  private val enc = Base64.getUrlEncoder.withoutPadding
  private val dec = Base64.getUrlDecoder

  private def hmac(secret: String, data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8),
      "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** Create a token with subject `<dataset>/<key>` expiring at
    * `expEpochSec` (auth.py:43-48). */
  def create(dataset: String, key: String, expEpochSec: Long,
             secret: String): String = {
    def b64(s: String) = enc.encodeToString(s.getBytes(StandardCharsets.UTF_8))
    val header = b64("""{"alg":"HS256","typ":"JWT"}""")
    val sub = s"$dataset/$key".flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }
    val payload = b64(s"""{"sub":"$sub","exp":$expEpochSec}""")
    val sig = enc.encodeToString(hmac(secret, s"$header.$payload"))
    s"$header.$payload.$sig"
  }

  /** Verify signature + expiry and split the subject at its FIRST slash
    * into (dataset, key) — keys may contain slashes (auth.py:36-40).
    * None on any failure (information hiding: the caller answers 404). */
  def verify(token: String, secret: String,
             nowEpochSec: Long): Option[(String, String)] = {
    token.split('.') match {
      case Array(h, p, s) =>
        try {
          val expected = hmac(secret, s"$h.$p")
          val got = dec.decode(s)
          if (!java.security.MessageDigest.isEqual(expected, got)) None
          else {
            val payload = new String(dec.decode(p), StandardCharsets.UTF_8)
            val expR = """"exp"\s*:\s*(\d+)""".r
            val subR = """"sub"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
            for {
              expM <- expR.findFirstMatchIn(payload)
              if expM.group(1).toLong > nowEpochSec
              subM <- subR.findFirstMatchIn(payload)
              sub = subM.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
              ix = sub.indexOf('/')
              if ix > 0
            } yield (sub.substring(0, ix), sub.substring(ix + 1))
          }
        } catch { case _: Exception => None }
      case _ => None
    }
  }
}

/** The serving surface (S13) — re-expresses ftm_datalake/api/main.py:54-94
  * over the library API:
  *
  *   - `HEAD /{dataset}/{key}`       public metadata headers
  *   - `GET  /{dataset}/{key}`       public bytes + headers
  *   - `HEAD /file`, `GET /file`     private, `Authorization: Bearer <jwt>`
  *                                   or `?token=` (auth.py subject lookup)
  *   - `GET  /{dataset}/{key}/token` debug-mode token mint (main.py:38-52)
  *
  * Every failure — missing key, bad token, expired token, bad path —
  * answers plain 404 for information hiding (api/util.py:44-57).
  *
  * Serving is driver-side library IO (a point lookup + a blob stream); a
  * production deployment fronts the documents table with a KV projection,
  * as the PointLookup docs note — this server IS that contract, made
  * drivable end-to-end.
  */
final class ApiService(archive: GraftArchive, secret: String,
                       debug: Boolean = false,
                       tokenTtlSeconds: Long = 300) { // 5 min, settings.py:58-59

  private var server: HttpServer = _

  def port: Int = server.getAddress.getPort

  def start(port: Int = 0): ApiService = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.start()
    this
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def now(): Long = System.currentTimeMillis() / 1000

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch { case _: Exception => notFound(ex) }
    finally ex.close()

  private def route(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod.toUpperCase
    val rawPath = ex.getRequestURI.getRawPath
    val path = java.net.URLDecoder.decode(rawPath, "UTF-8").stripPrefix("/")
    if (method != "GET" && method != "HEAD") { notFound(ex); return }

    if (path == "file") {
      // private lookup: Authorization: Bearer or ?token=
      val token = bearerToken(ex).orElse(queryParam(ex, "token"))
      token.flatMap(Jwt.verify(_, secret, now())) match {
        case Some((dataset, key)) => serve(ex, method, dataset, key)
        case None => notFound(ex)
      }
    } else if (debug && path.endsWith("/token") && method == "GET") {
      // GET /{dataset}/{key}/token — development only (main.py:35-52)
      val sub = path.stripSuffix("/token")
      val ix = sub.indexOf('/')
      if (ix <= 0) { notFound(ex); return }
      val (dataset, key) = (sub.substring(0, ix), sub.substring(ix + 1))
      lookup(dataset, key) match {
        case Some(headers) =>
          val exp = now() + queryParam(ex, "exp").map(_.toLong * 60)
            .getOrElse(tokenTtlSeconds)
          val tok = Jwt.create(dataset, key, exp, secret)
          val body =
            s"""{"access_token":"$tok","token_type":"Bearer"}"""
              .getBytes(StandardCharsets.UTF_8)
          headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
          ex.getResponseHeaders.set("content-type", "application/json")
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
        case None => notFound(ex)
      }
    } else {
      val ix = path.indexOf('/')
      if (ix <= 0 || ix == path.length - 1) { notFound(ex); return }
      serve(ex, method, path.substring(0, ix), path.substring(ix + 1))
    }
  }

  private def lookup(dataset: String, key: String): Option[Map[String, String]] =
    archive.dataset(dataset).lookup(key)

  private def serve(ex: HttpExchange, method: String, dataset: String,
                    key: String): Unit =
    lookup(dataset, key) match {
      case None => notFound(ex)
      case Some(headers) =>
        headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
        if (method == "HEAD") ex.sendResponseHeaders(200, -1)
        else archive.dataset(dataset).openBlob(key) match {
          case Some(bytes) =>
            ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
            if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
          case None => notFound(ex)
        }
    }

  private def bearerToken(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.regionMatches(true, 0, "Bearer ", 0, 7)).map(_.substring(7))

  private def queryParam(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getRawQuery).flatMap {
      _.split('&').collectFirst {
        case kv if kv.startsWith(name + "=") =>
          java.net.URLDecoder.decode(kv.substring(name.length + 1), "UTF-8")
      }
    }

  private def notFound(ex: HttpExchange): Unit =
    ex.sendResponseHeaders(404, -1)
}
