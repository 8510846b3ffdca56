package graft.examples

import graft.llm.FrameDecoder

/** A REAL video codec plugin, dependency-free: Motion-JPEG in an AVI
  * (RIFF) container, parsed by hand and decoded frame-by-frame with the
  * JDK's own JPEG reader. MJPEG-AVI is a genuine interchange format
  * (USB cameras, OpenCV's `MJPG` writer, ffmpeg `-c:v mjpeg`), so this
  * is the proof-of-SPI plugin the recipe in docs/frame-decoder-plugin.md
  * promises — exercised end-to-end by FrameDecoderPluginSpec, which
  * packages THIS class (compiled in-tree) plus its
  * `META-INF/services/graft.llm.FrameDecoder` registration into a plugin
  * jar, ships it to a fresh JVM via `SparkContext.addJar`, and asserts
  * real decoded frames flow out of [[graft.llm.Multimodal.sampleFrames]]
  * with `decode_ok = true`.
  *
  * SPI contract compliance: sniffs the RIFF/`AVI ` magic and returns
  * `None` for foreign bytes; stateless, hence thread-safe across Spark
  * task threads; public no-arg constructor for `ServiceLoader`.
  *
  * Container walk: RIFF chunks are `fourcc | u32 size (LE) | payload`
  * padded to even length; `LIST` chunks nest (list type in the first 4
  * payload bytes). Video frames sit in the `movi` list as `##dc`/`##db`
  * chunks (compressed/uncompressed stream data — MJPEG frames are
  * standalone JPEGs either way). Frame sampling and the 32×32-grid
  * Rec.601 mean luminance mirror the built-in imageio path, so plugin
  * rows are comparable with GIF rows in a mixed corpus. */
class AviMjpegFrameDecoder extends FrameDecoder {

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (offset, length) of every video-frame chunk in `movi` lists between
    * `from` (first subchunk) and `until`. */
  private def frameChunks(b: Array[Byte], from: Int, until: Int,
                          inMovi: Boolean): Vector[(Int, Int)] = {
    var out = Vector.empty[(Int, Int)]
    var p = from
    while (p + 8 <= until) {
      val cc = fourcc(b, p)
      val size = u32(b, p + 4)
      if (size < 0 || p + 8 + size > until) return out // truncated: stop
      val sz = size.toInt
      if (cc == "LIST" && sz >= 4) {
        val listType = fourcc(b, p + 8)
        out ++= frameChunks(b, p + 12, p + 8 + sz,
          inMovi || listType == "movi")
      } else if (inMovi && cc.length == 4 &&
          (cc.endsWith("dc") || cc.endsWith("db")) && sz > 0) {
        out :+= ((p + 8, sz))
      }
      p += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    out
  }

  private def meanLuminance(im: java.awt.image.BufferedImage): Float = {
    val grid = 32
    var sum = 0.0
    var gy = 0
    while (gy < grid) {
      val y = (gy.toLong * im.getHeight / grid).toInt
      var gx = 0
      while (gx < grid) {
        val x = (gx.toLong * im.getWidth / grid).toInt
        val rgb = im.getRGB(x, y)
        sum += (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)) / 255.0
        gx += 1
      }
      gy += 1
    }
    (sum / (grid * grid)).toFloat
  }

  override def decodeFrames(bytes: Array[Byte],
                            n: Int): Option[Seq[FrameDecoder.Frame]] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
    try {
      val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
      val frames = frameChunks(bytes, 12, riffEnd, inMovi = false)
      if (frames.isEmpty) return None
      val fc = frames.length
      Some((0 until n).map { i =>
        val fi = (i.toLong * fc / n).toInt
        val (off, len) = frames(fi)
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, len))
        if (im == null)
          throw new java.io.IOException(s"frame $fi: not ImageIO-decodable")
        FrameDecoder.Frame(fc, fi, meanLuminance(im))
      })
    } catch {
      // a RIFF/AVI container we failed to decode is still OURS — but the
      // SPI has no error channel besides None, and None correctly hands
      // the bytes to the next decoder / the stub (decode_ok = false)
      case _: Exception => None
    }
  }

  /** The clip-fingerprint hook: same chunk walk as [[decodeFrames]],
    * top-to-bottom luminance bands per frame instead of one mean (the
    * 32×32-grid kernel mirrored from the built-in imageio path). */
  override def decodeFrameBands(bytes: Array[Byte], n: Int, bands: Int)
      : Option[Seq[FrameDecoder.FrameBands]] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
    try {
      val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
      val frames = frameChunks(bytes, 12, riffEnd, inMovi = false)
      if (frames.isEmpty) return None
      val fc = frames.length
      Some((0 until n).map { i =>
        val fi = (i.toLong * fc / n).toInt
        val (off, len) = frames(fi)
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, len))
        if (im == null)
          throw new java.io.IOException(s"frame $fi: not ImageIO-decodable")
        val grid = 32
        val sums = new Array[Double](bands)
        val counts = new Array[Int](bands)
        var gy = 0
        while (gy < grid) {
          val y = (gy.toLong * im.getHeight / grid).toInt
          val band = math.min(bands - 1, gy * bands / grid)
          var gx = 0
          while (gx < grid) {
            val x = (gx.toLong * im.getWidth / grid).toInt
            val rgb = im.getRGB(x, y)
            sums(band) += (0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)) / 255.0
            counts(band) += 1
            gx += 1
          }
          gy += 1
        }
        FrameDecoder.FrameBands(fc, fi, Array.tabulate(bands)(b =>
          if (counts(b) == 0) 0f else (sums(b) / counts(b)).toFloat))
      })
    } catch { case _: Exception => None }
  }
}

/** Minimal MJPEG-AVI writer for fixtures: real `RIFF/AVI ` structure
  * (avih + strl headers, movi list of `00dc` JPEG chunks) that ffmpeg
  * and this plugin both parse. Test-scoped tooling, not a product
  * sink — WebDataset/tar is the multimodal interchange sink. */
object AviMjpegFixture {

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    cc.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload ++ pad
  }

  private def list(listType: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes("US-ASCII") ++ payload)

  /** Uniform-gray frames at the given levels (0-255), `w`×`h`, JPEG-in-AVI. */
  def write(path: java.nio.file.Path, grayLevels: Seq[Int], w: Int = 64,
            h: Int = 48): Unit = {
    val jpegs = grayLevels.map { g =>
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = im.createGraphics()
      gfx.setColor(new java.awt.Color(g, g, g))
      gfx.fillRect(0, 0, w, h)
      gfx.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    val avih = chunk("avih", le32(40000L) ++ le32(0L) ++ le32(0L) ++
      le32(0L) ++ le32(jpegs.length.toLong) ++ le32(0L) ++ le32(1L) ++
      le32(0L) ++ le32(w.toLong) ++ le32(h.toLong) ++
      Array.fill(16)(0.toByte))
    val strh = chunk("strh", "vids".getBytes("US-ASCII") ++
      "MJPG".getBytes("US-ASCII") ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      le32(1L) ++ le32(25L) ++ le32(0L) ++ le32(jpegs.length.toLong) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++ Array.fill(8)(0.toByte))
    val strf = chunk("strf", le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++
      Array(1.toByte, 0.toByte) ++ Array(24.toByte, 0.toByte) ++
      "MJPG".getBytes("US-ASCII") ++ le32(w.toLong * h * 3) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val riffPayload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    java.nio.file.Files.write(path,
      "RIFF".getBytes("US-ASCII") ++ le32(riffPayload.length.toLong) ++
        riffPayload)
  }
}
