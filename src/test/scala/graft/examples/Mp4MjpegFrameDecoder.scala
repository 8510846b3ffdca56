package graft.examples

import graft.llm.FrameDecoder

/** A REAL ISO-BMFF (mp4) codec plugin, dependency-free: Motion-JPEG
  * video samples in an MP4 container, parsed by hand and decoded
  * frame-by-frame with the JDK's own JPEG reader. MJPEG-in-MP4 is a
  * genuine interchange shape (QuickTime's `jpeg` sample entry; ffmpeg
  * muxes it with `-c:v mjpeg out.mp4`), so together with
  * [[AviMjpegFrameDecoder]] this closes the "mp4 decodes only via an
  * out-of-tree plugin" residual: a real mp4 container decodes green in
  * the default test run (VideoCodecIntegrationSpec), registered through
  * the identical `META-INF/services` SPI path a deployment uses.
  *
  * Container walk (ISO/IEC 14496-12): boxes are `u32 size (BE) |
  * fourcc | payload` (`size==1` → 64-bit largesize follows; `size==0` →
  * to EOF). The video track is `moov/trak` whose `mdia/hdlr` handler is
  * `vide`; its sample table `mdia/minf/stbl` gives sample→byte mapping:
  * `stsd` (sample description — accepted formats `jpeg`/`mjpa`), `stsz`
  * (sample sizes), `stsc` (samples-per-chunk runs), `stco`/`co64`
  * (chunk offsets). Sample offsets are reconstructed by walking chunks
  * and accumulating sizes — the general mapping, not a fixture-shaped
  * shortcut, so ffmpeg-muxed MJPEG mp4s parse too.
  *
  * SPI contract compliance: sniffs the `ftyp`+`moov` structure and
  * returns `None` for foreign or non-MJPEG mp4 bytes; stateless, hence
  * thread-safe across Spark task threads; public no-arg constructor for
  * `ServiceLoader`. Frame sampling and the 32×32-grid Rec.601 mean
  * luminance mirror the built-in imageio path. */
class Mp4MjpegFrameDecoder extends FrameDecoder {

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Child boxes of `[from, until)` as (type, payloadFrom, boxEnd). */
  private def boxes(b: Array[Byte], from: Int,
                    until: Int): Vector[(String, Int, Int)] = {
    var out = Vector.empty[(String, Int, Int)]
    var p = from
    while (p + 8 <= until) {
      var size = u32(b, p)
      val tp = fourcc(b, p + 4)
      var payload = p + 8
      if (size == 1 && p + 16 <= until) { size = u64(b, p + 8); payload = p + 16 }
      else if (size == 0) size = (until - p).toLong
      if (size < (payload - p).toLong || p + size > until) return out // corrupt: stop
      out :+= ((tp, payload, p + size.toInt))
      p += size.toInt
    }
    out
  }

  private def child(b: Array[Byte], from: Int, until: Int,
                    tp: String): Option[(Int, Int)] =
    boxes(b, from, until).find(_._1 == tp).map(c => (c._2, c._3))

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

  /** Top-to-bottom mean-luminance bands on the same bounded 32×32 grid
    * — the spatial axis of the clip fingerprint (mirrors the built-in
    * imageio path so plugin rows are grid-comparable). */
  private def luminanceBands(im: java.awt.image.BufferedImage,
                             n: Int): Array[Float] = {
    val grid = 32
    val sums = new Array[Double](n)
    val counts = new Array[Int](n)
    var gy = 0
    while (gy < grid) {
      val y = (gy.toLong * im.getHeight / grid).toInt
      val band = math.min(n - 1, gy * n / grid)
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
    Array.tabulate(n)(i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
  }

  /** The clip-fingerprint hook: same sample walk as [[decodeFrames]],
    * spatial bands instead of one mean — real mp4 uploads flow into
    * [[graft.llm.Multimodal.videoFingerprints]] with `decode_ok=true`. */
  override def decodeFrameBands(bytes: Array[Byte], n: Int, bands: Int)
      : Option[Seq[FrameDecoder.FrameBands]] = {
    if (bytes.length < 16) return None
    try {
      val frames = mjpegSamples(bytes).getOrElse(return None)
      val fc = frames.length
      Some((0 until n).map { i =>
        val fi = (i.toLong * fc / n).toInt
        val (off, len) = frames(fi)
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off.toInt, len.toInt))
        if (im == null)
          throw new java.io.IOException(s"sample $fi: not ImageIO-decodable")
        FrameDecoder.FrameBands(fc, fi, luminanceBands(im, bands))
      })
    } catch { case _: Exception => None }
  }

  /** (offset, size) of every sample in the first MJPEG video trak. */
  private def mjpegSamples(b: Array[Byte]): Option[Vector[(Long, Long)]] = {
    val top = boxes(b, 0, b.length)
    if (!top.exists(_._1 == "ftyp")) return None
    val moov = top.find(_._1 == "moov").getOrElse(return None)
    boxes(b, moov._2, moov._3).iterator.filter(_._1 == "trak")
      .flatMap { case (_, tf, tu) =>
        trakSamples(b, tf, tu)
      }.take(1).toVector.headOption
  }

  private def trakSamples(b: Array[Byte], tf: Int,
                          tu: Int): Option[Vector[(Long, Long)]] = {
    val (mdF, mdU) = child(b, tf, tu, "mdia").getOrElse(return None)
    val (hdF, _) = child(b, mdF, mdU, "hdlr").getOrElse(return None)
    // hdlr payload: version/flags(4) predefined(4) handler(4)
    if (fourcc(b, hdF + 8) != "vide") return None
    val (mnF, mnU) = child(b, mdF, mdU, "minf").getOrElse(return None)
    val (sbF, sbU) = child(b, mnF, mnU, "stbl").getOrElse(return None)
    // stsd: version/flags(4) entry_count(4) then sample entries
    val (sdF, _) = child(b, sbF, sbU, "stsd").getOrElse(return None)
    if (u32(b, sdF + 4) < 1) return None
    val format = fourcc(b, sdF + 12) // first entry: size(4) + format(4)
    if (format != "jpeg" && format != "mjpa") return None
    // stsz: version/flags(4) sample_size(4) sample_count(4) [sizes]
    val (szF, _) = child(b, sbF, sbU, "stsz").getOrElse(return None)
    val fixedSize = u32(b, szF + 4)
    val nSamples = u32(b, szF + 8).toInt
    if (nSamples <= 0 || nSamples > 1000000) return None
    val sizes: Vector[Long] =
      if (fixedSize != 0) Vector.fill(nSamples)(fixedSize)
      else (0 until nSamples).map(i => u32(b, szF + 12 + 4 * i)).toVector
    // stsc: version/flags(4) entry_count(4) then
    // (first_chunk, samples_per_chunk, sample_description_index) runs
    val (scF, _) = child(b, sbF, sbU, "stsc").getOrElse(return None)
    val nRuns = u32(b, scF + 4).toInt
    if (nRuns <= 0 || nRuns > 1000000) return None
    val runs = (0 until nRuns).map { i =>
      (u32(b, scF + 8 + 12 * i).toInt, u32(b, scF + 12 + 12 * i).toInt)
    }.toVector
    // stco (u32 offsets) or co64 (u64)
    val offsets: Vector[Long] =
      child(b, sbF, sbU, "stco") match {
        case Some((coF, _)) =>
          val n = u32(b, coF + 4).toInt
          if (n <= 0 || n > 1000000) return None
          (0 until n).map(i => u32(b, coF + 8 + 4 * i)).toVector
        case None =>
          val (coF, _) = child(b, sbF, sbU, "co64").getOrElse(return None)
          val n = u32(b, coF + 4).toInt
          if (n <= 0 || n > 1000000) return None
          (0 until n).map(i => u64(b, coF + 8 + 8 * i)).toVector
      }
    // chunk walk: sample offsets accumulate sizes within each chunk
    val out = Vector.newBuilder[(Long, Long)]
    var si = 0
    var run = 0
    var ci = 1
    while (ci <= offsets.length && si < sizes.length) {
      while (run + 1 < runs.length && runs(run + 1)._1 <= ci) run += 1
      var off = offsets(ci - 1)
      var k = 0
      while (k < runs(run)._2 && si < sizes.length) {
        if (off < 0 || off + sizes(si) > b.length) return None
        out += ((off, sizes(si)))
        off += sizes(si)
        si += 1
        k += 1
      }
      ci += 1
    }
    val samples = out.result()
    if (samples.isEmpty) None else Some(samples)
  }

  override def decodeFrames(bytes: Array[Byte],
                            n: Int): Option[Seq[FrameDecoder.Frame]] = {
    if (bytes.length < 16) return None
    try {
      val frames = mjpegSamples(bytes).getOrElse(return None)
      val fc = frames.length
      Some((0 until n).map { i =>
        val fi = (i.toLong * fc / n).toInt
        val (off, len) = frames(fi)
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off.toInt, len.toInt))
        if (im == null)
          throw new java.io.IOException(s"sample $fi: not ImageIO-decodable")
        FrameDecoder.Frame(fc, fi, meanLuminance(im))
      })
    } catch {
      // an mp4 we failed to decode: the SPI's only error channel is
      // None, which correctly hands the bytes to the next decoder / the
      // stub (decode_ok = false)
      case _: Exception => None
    }
  }
}

/** Minimal MJPEG-MP4 writer for fixtures: real ISO-BMFF structure
  * (`ftyp` + `mdat` of JPEG samples + full `moov` with a `vide` trak
  * and `jpeg`-format sample tables, one chunk per sample). Test-scoped
  * tooling, not a product sink. */
object Mp4MjpegFixture {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++
      tp.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload

  private def full(tp: String, verFlags: Long,
                   payload: Array[Byte]): Array[Byte] =
    box(tp, be32(verFlags) ++ payload)

  private val matrix: Array[Byte] =
    be32(0x10000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x10000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  /** Uniform-gray frames at the given levels (0-255), `w`×`h`,
    * JPEG-in-MP4, 25 fps timescale. */
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
    val n = jpegs.length
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0x200L) ++
        "isomiso2mp41".getBytes("US-ASCII"))
    // mdat sits directly after ftyp, so stco offsets are computable
    // before moov is laid out
    val base = ftyp.length + 8L
    val offsets = jpegs.scanLeft(base)((a, j) => a + j.length).init
    val mdat = box("mdat", jpegs.toArray.flatten)
    val mvhd = full("mvhd", 0, be32(0) ++ be32(0) ++ be32(1000) ++
      be32(n * 40L) ++ be32(0x00010000L) ++ be16(0x0100) ++ be16(0) ++
      be32(0) ++ be32(0) ++ matrix ++ Array.fill[Byte](24)(0) ++ be32(2))
    val tkhd = full("tkhd", 7, be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
      be32(n * 40L) ++ be32(0) ++ be32(0) ++ be16(0) ++ be16(0) ++
      be16(0) ++ be16(0) ++ matrix ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val mdhd = full("mdhd", 0, be32(0) ++ be32(0) ++ be32(25) ++
      be32(n.toLong) ++ be16(0x55c4) ++ be16(0))
    val hdlr = full("hdlr", 0, be32(0) ++ "vide".getBytes("US-ASCII") ++
      Array.fill[Byte](12)(0) ++ "GraftVideo ".getBytes("US-ASCII"))
    val vmhd = full("vmhd", 1, be16(0) ++ be16(0) ++ be16(0) ++ be16(0))
    val dinf = box("dinf", full("dref", 0,
      be32(1) ++ full("url ", 1, Array.emptyByteArray)))
    // VisualSampleEntry, format 'jpeg' (78-byte body per 14496-12 §12.1)
    val sampleEntry = box("jpeg",
      Array.fill[Byte](6)(0) ++ be16(1) ++ // reserved + data_ref_index
        be16(0) ++ be16(0) ++ Array.fill[Byte](12)(0) ++
        be16(w) ++ be16(h) ++ be32(0x00480000L) ++ be32(0x00480000L) ++
        be32(0) ++ be16(1) ++ Array.fill[Byte](32)(0) ++
        be16(24) ++ be16(0xFFFF))
    val stsd = full("stsd", 0, be32(1) ++ sampleEntry)
    val stts = full("stts", 0, be32(1) ++ be32(n.toLong) ++ be32(1))
    val stsc = full("stsc", 0, be32(1) ++ be32(1) ++ be32(1) ++ be32(1))
    val stsz = full("stsz", 0, be32(0) ++ be32(n.toLong) ++
      jpegs.toArray.flatMap(j => be32(j.length.toLong)))
    val stco = full("stco", 0, be32(n.toLong) ++
      offsets.toArray.flatMap(be32))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    java.nio.file.Files.write(path, ftyp ++ mdat ++ moov)
  }
}
