package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * [[decodeImages]] is a REAL decoder for the formats the JDK ships codecs
  * for (PNG, JPEG, GIF, BMP, WBMP, and TIFF since JDK 9) via `javax.imageio`
  * — zero extra dependencies; [[decodeAudio]] likewise for WAV/AIFF/AU
  * containers with PCM / µ-law / a-law codecs via `javax.sound.sampled`.
  * Formats the JDK cannot decode (webp, heic, mp3, ogg, video) fall
  * through to the deterministic stub kernel so the pipeline never throws
  * on mixed corpora; `decode_ok` records which path each row took.
  * [[decodeImagesStub]] remains available as the fully deterministic,
  * oracle-checkable variant (and is what the hash-keyed correctness
  * oracles pin against). Video remains the one honest stub boundary —
  * the JDK ships no video codec.
  */
object Multimodal {

  /** Typed media row: content plus metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType),
    StructField("mime_type", StringType),
    StructField("byte_size", LongType)))

  /** Wrap any (id, binary) pair into the media schema. */
  def asMedia(df: DataFrame, idCol: String, binCol: String,
              modality: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(binCol).cast("binary").as("content"),
      lit(mime).as("mime_type"),
      octet_length(col(binCol).cast("binary")).cast("long").as("byte_size"))

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  val decodedImageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("decode_ok", BooleanType),
    StructField("feature", ArrayType(FloatType))))

  /** REAL image decode + feature extraction via `javax.imageio` (PNG, JPEG,
    * GIF, BMP, WBMP, TIFF — every codec the JDK ships). Rows whose bytes no
    * JDK reader accepts fall through to the deterministic stub kernel with
    * `decode_ok = false`, so mixed/corrupt corpora flow instead of failing.
    *
    * Runs `mapPartitions` so per-partition codec setup (`ImageIO` cache off,
    * reader discovery) is amortized — the same batch shape a `mapInPandas`
    * worker would see. The feature is a mean-luminance band profile sampled
    * on a bounded 32×32 grid: content-derived and O(1) per image regardless
    * of resolution, so one 50-megapixel scan cannot stall a partition.
    */
  def decodeImages(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val dim = featureDim
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // keep decode off executor disk
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val img =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          catch { case _: Exception => None }
        img match {
          case Some(im) =>
            Row(id, im.getWidth, im.getHeight,
              im.getColorModel.getNumComponents, true,
              meanLuminanceBands(im, dim).toSeq)
          case None =>
            // >>> STUB fallback — only for codecs the JDK lacks (webp/heic/…)
            val h = java.util.Arrays.hashCode(bytes)
            val w = 64 + math.abs(h % 512)
            val ht = 64 + math.abs((h / 512) % 512)
            val feat = Array.tabulate(dim)(i =>
              (((h.toLong * 2654435761L + i * 40503L) % 1000L) / 1000.0f))
            Row(id, w, ht, 3, false, feat.toSeq)
          // <<< STUB fallback
        }
      }
    }
    spark.createDataFrame(rdd, decodedImageSchema)
  }

  val imageHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("ahash", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false)))

  /** 64-bit perceptual average-hash (aHash) per image: decode, sample
    * luminance on the bounded 32×32 grid (Rec. 601 weights, same
    * discipline as [[decodeImages]] — O(1) work per image regardless of
    * resolution), pool to 8×8 cells, set bit i when cell i's mean
    * clears the global mean. Re-encodes, resizes, and mild
    * brightness/noise edits move few bits; distinct images differ in
    * ~32. Rows no JDK codec accepts return `decode_ok = false` with
    * `ahash = 0` so corrupt corpora flow instead of failing (and
    * [[imageNearDupPairs]] excludes them rather than pairing every
    * corrupt file with every other at hamming 0). */
  def imageHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val bytes =
          Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case _: Exception => None }
        img match {
          case Some(im) => Row(id, aHash64(im), true)
          case None => Row(id, 0L, false)
        }
      }
    }
    spark.createDataFrame(rdd, imageHashSchema)
  }

  /** Image near-duplicate candidate pairs within `maxHamming` aHash bits
    * — the multimodal member of the dedup family (CSAM-scale image
    * corpora dedup on perceptual hashes exactly this way). Pairing is
    * [[Dedup.simhashNearPairs]]' 4×16-bit chunk banding: pigeonhole-
    * complete for hamming ≤ 3 and NEVER all-pairs, so the join work is
    * band-collision volume, not |images|². The hash pass itself is
    * scan-side bounded work per image. Undecodable rows are excluded
    * (see [[imageHashes]]). */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.simhashNearPairs(
      imageHashes(media).filter(col("decode_ok"))
        .select(col("media_id").as("id"), col("ahash").as("simhash")),
      maxHamming)

  /** [[imageHashes]] kernel: 8×8 cell luminance means over the bounded
    * 32×32 sample grid (16 samples per cell), thresholded at the global
    * mean — bit i (row-major cell order) set when cell i is at least as
    * bright as the image average. */
  private def aHash64(im: java.awt.image.BufferedImage): Long = {
    val grid = 32
    val w = im.getWidth
    val h = im.getHeight
    val sums = new Array[Double](64)
    val counts = new Array[Int](64)
    var gy = 0
    while (gy < grid) {
      val y = (gy.toLong * h / grid).toInt
      val cy = gy * 8 / grid
      var gx = 0
      while (gx < grid) {
        val x = (gx.toLong * w / grid).toInt
        val rgb = im.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xFF) +
          0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
        val cell = cy * 8 + gx * 8 / grid
        sums(cell) += lum
        counts(cell) += 1
        gx += 1
      }
      gy += 1
    }
    val means = Array.tabulate(64)(i =>
      if (counts(i) == 0) 0.0 else sums(i) / counts(i))
    val globalMean = means.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (means(i) >= globalMean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Mean luminance over `n` horizontal bands, sampled on a fixed 32×32
    * pixel grid (Rec. 601 weights). Bounded work per image by construction. */
  private def meanLuminanceBands(im: java.awt.image.BufferedImage, n: Int): Array[Float] = {
    val grid = 32
    val w = im.getWidth
    val h = im.getHeight
    val sums = new Array[Double](n)
    val counts = new Array[Int](n)
    var gy = 0
    while (gy < grid) {
      val y = (gy.toLong * h / grid).toInt
      val band = math.min(n - 1, gy * n / grid)
      var gx = 0
      while (gx < grid) {
        val x = (gx.toLong * w / grid).toInt
        val rgb = im.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xFF) +
          0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
        sums(band) += lum / 255.0
        counts(band) += 1
        gx += 1
      }
      gy += 1
    }
    Array.tabulate(n)(i => if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
  }

  val decodedAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("decode_ok", BooleanType),
    StructField("feature", ArrayType(FloatType))))

  /** REAL audio decode + feature extraction via `javax.sound.sampled` —
    * the audio analog of [[decodeImages]], zero extra dependencies: the
    * JDK ships WAV/AIFF/AU container parsing and PCM / µ-law / a-law
    * codecs. Bytes no JDK reader accepts (mp3, ogg, flac, …) fall
    * through to the deterministic stub with `decode_ok = false`, so
    * mixed corpora flow instead of failing.
    *
    * The feature is an RMS amplitude profile over `featureDim` temporal
    * bands, computed from ≤ `featureDim`·32 frames skip-sampled evenly
    * across the stream — bounded work AND bounded memory per row
    * regardless of clip length (an hour-long WAV costs the same as a
    * jingle; frames between sample points are `skip`ped, never
    * buffered). Everything is integer/PCM-exact: frames decode to
    * 16-bit signed PCM through the JDK's converter, normalized by
    * 1/32768, channel-averaged, then per-band RMS. */
  def decodeAudio(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val dim = featureDim
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        decodeOneAudio(bytes, dim) match {
          case Some((rate, ch, frames, feat)) =>
            Row(id, rate, ch, frames, true, feat.toSeq)
          case None =>
            // >>> STUB fallback — only for codecs the JDK lacks (mp3/ogg/…)
            val h = java.util.Arrays.hashCode(bytes)
            val rate = 8000 + math.abs(h % 40000)
            val ch = 1 + math.abs((h / 7) % 2)
            val frames = bytes.length.toLong.max(1L)
            val feat = Array.tabulate(dim)(i =>
              (((h.toLong * 2654435761L + i * 40503L) % 1000L) / 1000.0f))
            Row(id, rate, ch, frames, false, feat.toSeq)
          // <<< STUB fallback
        }
      }
    }
    spark.createDataFrame(rdd, decodedAudioSchema)
  }

  /** Decode one audio byte array: (rate, channels, frames, band RMS),
    * or None when no JDK reader accepts the bytes. */
  private def decodeOneAudio(bytes: Array[Byte],
                             n: Int): Option[(Int, Int, Long, Array[Float])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val base = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = base.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels,
          2 * fmt.getChannels, fmt.getSampleRate, false)
        val pcm =
          if (fmt.matches(target)) base
          else AudioSystem.getAudioInputStream(target, base)
        val ch = target.getChannels
        val frameSize = target.getFrameSize
        val frames = pcm.getFrameLength
        val sums = new Array[Double](n)
        val counts = new Array[Int](n)
        val buf = new Array[Byte](frameSize)
        def addFrame(band: Int): Unit = {
          // channel-mean of normalized 16-bit little-endian samples
          var c = 0
          var mean = 0.0
          while (c < ch) {
            val lo = buf(2 * c) & 0xFF
            val hi = buf(2 * c + 1).toInt
            mean += ((hi << 8) | lo) / 32768.0
            c += 1
          }
          mean /= ch
          sums(band) += mean * mean
          counts(band) += 1
        }
        def readFully(): Boolean = {
          var off = 0
          while (off < frameSize) {
            val k = pcm.read(buf, off, frameSize - off)
            if (k < 0) return false
            off += k
          }
          true
        }
        var framesOut = frames
        if (frames > 0) {
          // evenly skip-sample ≤ n·32 frames; sequential forward skips
          // only. `skip` may legally return 0 before EOF (conversion
          // streams skip whole internal buffers) — fall back to
          // read-and-discard so the tracked position stays EXACT; a
          // silently under-skipped stream would attribute RMS energy to
          // the wrong temporal bands with decode_ok still true.
          val samples = math.min(frames, n.toLong * 32).toInt
          var curBytes = 0L
          var i = 0
          var eof = false
          while (i < samples && !eof) {
            val targetBytes = (i.toLong * frames / samples) * frameSize
            var stalled = false
            while (curBytes < targetBytes && !eof) {
              if (!stalled) {
                val k = pcm.skip(targetBytes - curBytes)
                if (k > 0) curBytes += k else stalled = true
              } else {
                // skip() stalled short of target: discard by reading
                val want = math.min(frameSize.toLong, targetBytes - curBytes).toInt
                val k = pcm.read(buf, 0, want)
                if (k > 0) { curBytes += k; stalled = false } else eof = true
              }
            }
            if (!eof) {
              if (readFully()) {
                addFrame(math.min(n - 1, i * n / samples))
                curBytes += frameSize
              } else eof = true
            }
            i += 1
          }
          // a header may DECLARE more frames than the data chunk holds
          // (truncated file): report the frames confirmed to exist
          // (bytes successfully skipped or read), not the header claim
          if (eof) framesOut = curBytes / frameSize
        } else {
          // frame count unknown after conversion (rare): read the first
          // n·32 frames sequentially — still bounded — and report the
          // frames actually read (never the NOT_SPECIFIED sentinel,
          // which would surface as n_frames = -1 with decode_ok = true)
          var i = 0
          var eof = false
          var read = 0L
          while (i < n * 32 && !eof) {
            if (readFully()) {
              addFrame(math.min(n - 1, i * n / (n * 32)))
              read += 1
            } else eof = true
            i += 1
          }
          framesOut = read
        }
        val feat = Array.tabulate(n)(i =>
          if (counts(i) == 0) 0f
          else math.sqrt(sums(i) / counts(i)).toFloat)
        Some((math.round(target.getSampleRate), ch, framesOut, feat))
      } finally base.close()
    } catch { case _: Exception => None }
  }

  val audioFingerprintSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("afp", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false)))

  /** 64-bit perceptual audio fingerprint — the audio analog of
    * [[imageHashes]] (chromaprint's time×frequency sign shape at
    * postcard scale): an 8×8 energy grid — 8 temporal windows, Goertzel
    * band power at 8 log-spaced frequencies (200→3200 Hz) per window,
    * ≤ 2048 contiguous frames streamed at each window (skip-sampled
    * forward only — bounded work AND O(1) memory per clip regardless of
    * length) — thresholded at the grid's global mean power. A
    * multiplicative gain change scales every power and the mean by g²,
    * so the sign pattern is GAIN-INVARIANT by construction; re-encodes
    * and mild noise move few bits; distinct content differs in ~32.
    * Bytes no JDK reader accepts (mp3/ogg/…) return `decode_ok = false`
    * with `afp = 0`, so corrupt corpora flow and
    * [[audioNearDupPairs]] excludes them rather than pairing every
    * undecodable file with every other at hamming 0. */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes =
          Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        audioFp64(bytes) match {
          case Some(fp) => Row(id, fp, true)
          case None => Row(id, 0L, false)
        }
      }
    }
    spark.createDataFrame(rdd, audioFingerprintSchema)
  }

  /** Audio near-duplicate candidate pairs within `maxHamming`
    * fingerprint bits — the audio member of the dedup family
    * (re-encoded uploads, gain-normalized copies). Pairing is
    * [[Dedup.simhashNearPairs]]' 4×16-bit chunk banding: pigeonhole-
    * complete for hamming ≤ 3 and NEVER all-pairs — join work is band
    * collision volume, not |clips|². Undecodable rows are excluded
    * (see [[audioFingerprints]]). */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.simhashNearPairs(
      audioFingerprints(media).filter(col("decode_ok"))
        .select(col("media_id").as("id"), col("afp").as("simhash")),
      maxHamming)

  /** [[audioFingerprints]] kernel: streaming Goertzel band powers over
    * skip-sampled windows, normalized per-window by count² (EOF-short
    * tail windows stay comparable), bit i = grid cell i ≥ global mean.
    * Bands above Nyquist alias deterministically (same bytes → same
    * bits), which is all a fingerprint needs. */
  private def audioFp64(bytes: Array[Byte]): Option[Long] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val base = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = base.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels,
          2 * fmt.getChannels, fmt.getSampleRate, false)
        val pcm = if (fmt.matches(target)) base
          else AudioSystem.getAudioInputStream(target, base)
        val ch = target.getChannels
        val frameSize = target.getFrameSize
        val rate = target.getSampleRate.toDouble
        val segs = 8
        val nb = 8
        val win = 2048
        val coeffs = Array.tabulate(nb) { b =>
          val f = 200.0 * math.pow(2.0, 4.0 * b / 7.0)
          2.0 * math.cos(2.0 * math.Pi * f / rate)
        }
        val power = Array.ofDim[Double](segs, nb)
        val buf = new Array[Byte](frameSize)
        def readFrame(): Boolean = {
          var off = 0
          while (off < frameSize) {
            val k = pcm.read(buf, off, frameSize - off)
            if (k < 0) return false
            off += k
          }
          true
        }
        def sampleValue(): Double = {
          var c = 0
          var mean = 0.0
          while (c < ch) {
            val lo = buf(2 * c) & 0xFF
            val hi = buf(2 * c + 1).toInt
            mean += ((hi << 8) | lo) / 32768.0
            c += 1
          }
          mean / ch
        }
        val frames = pcm.getFrameLength
        val s1 = new Array[Double](nb)
        val s2 = new Array[Double](nb)
        var curBytes = 0L
        var eof = false
        def runWindow(seg: Int, count: Long): Unit = {
          java.util.Arrays.fill(s1, 0.0)
          java.util.Arrays.fill(s2, 0.0)
          var i = 0L
          var n = 0L
          while (i < count && !eof) {
            if (readFrame()) {
              curBytes += frameSize
              val x = sampleValue()
              var b = 0
              while (b < nb) {
                val s = x + coeffs(b) * s1(b) - s2(b)
                s2(b) = s1(b)
                s1(b) = s
                b += 1
              }
              n += 1
            } else eof = true
            i += 1
          }
          if (n > 0) {
            var b = 0
            while (b < nb) {
              power(seg)(b) = (s1(b) * s1(b) + s2(b) * s2(b) -
                coeffs(b) * s1(b) * s2(b)) / (n.toDouble * n)
              b += 1
            }
          }
        }
        if (frames > 0) {
          // windows centered in equal segments; forward-only skips with
          // the decodeOneAudio stall-safe discipline (skip() may
          // legally return 0 before EOF on conversion streams)
          val segLen = math.max(1L, frames / segs)
          val winLen = math.min(win.toLong, segLen)
          var seg = 0
          while (seg < segs && !eof) {
            val start = math.min(frames - 1,
              seg * segLen + (segLen - winLen) / 2)
            val targetBytes = start * frameSize
            var stalled = false
            while (curBytes < targetBytes && !eof) {
              if (!stalled) {
                val k = pcm.skip(targetBytes - curBytes)
                if (k > 0) curBytes += k else stalled = true
              } else {
                val want = math.min(frameSize.toLong,
                  targetBytes - curBytes).toInt
                val k = pcm.read(buf, 0, want)
                if (k > 0) { curBytes += k; stalled = false } else eof = true
              }
            }
            if (!eof) runWindow(seg, winLen)
            seg += 1
          }
        } else {
          // frame count unknown after conversion (rare): first segs·win
          // frames sequentially — still bounded
          var seg = 0
          while (seg < segs && !eof) {
            runWindow(seg, win.toLong)
            seg += 1
          }
        }
        val flat = power.flatten
        val mean = flat.sum / 64.0
        var bits = 0L
        var i = 0
        while (i < 64) {
          if (flat(i) >= mean) bits |= (1L << i)
          i += 1
        }
        Some(bits)
      } finally base.close()
    } catch { case _: Exception => None }
  }

  val videoFingerprintSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("vfp", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false)))

  /** 64-bit clip-level perceptual VIDEO fingerprint — the third and
    * last member of the modality-dedup family, completing the
    * [[imageHashes]] / [[audioFingerprints]] symmetry with the exact
    * same recipe one modality over: an 8×8 TIME×SPACE sign grid —
    * 8 frames sampled evenly across the container (the
    * [[sampleFrames]] decode machinery: [[FrameDecoder]] SPI decoders
    * consulted first through their `decodeFrameBands` hook, then any
    * multi-frame `javax.imageio` container, animated GIF foremost),
    * 8 top-to-bottom mean-luminance bands per sampled frame on the
    * bounded 32×32 pixel grid — thresholded at the grid's global mean.
    *
    * Invariances by construction: a uniform brightness/contrast change
    * scales every cell and the mean together (the audioFp64 gain
    * argument), the fixed 32×32 sample grid makes re-encodes and
    * RESCALES land on the same bands, and even temporal sampling makes
    * frame-rate changes (each frame doubled, pulldown) pick the same
    * content instants — the three edits a re-uploaded video actually
    * has. Distinct content differs in ~32 bits. Bytes nothing decodes
    * (true mp4/webm with no registered codec, junk) return
    * `decode_ok = false` with `vfp = 0`, so corrupt corpora flow and
    * [[videoNearDupPairs]] excludes them rather than pairing every
    * undecodable file at hamming 0. Work per row is bounded: 8 decoded
    * frames × the fixed grid, regardless of clip length or
    * resolution. */
  def videoFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val spi = FrameDecoder.registered
      it.map { r =>
        val id = r.getLong(0)
        val bytes =
          Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        videoFp64(bytes, spi) match {
          case Some(fp) => Row(id, fp, true)
          case None => Row(id, 0L, false)
        }
      }
    }
    spark.createDataFrame(rdd, videoFingerprintSchema)
  }

  /** Video near-duplicate candidate pairs within `maxHamming`
    * fingerprint bits — the video member of the dedup family
    * (re-encoded/re-scaled/rate-changed uploads, the most common
    * large-blob duplicate after images). Pairing is
    * [[Dedup.simhashNearPairs]]' 4×16-bit chunk banding:
    * pigeonhole-complete for hamming ≤ 3 and NEVER all-pairs — join
    * work is band collision volume, not |clips|². Undecodable rows are
    * excluded (see [[videoFingerprints]]). */
  def videoNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.simhashNearPairs(
      videoFingerprints(media).filter(col("decode_ok"))
        .select(col("media_id").as("id"), col("vfp").as("simhash")),
      maxHamming)

  /** [[videoFingerprints]] kernel: SPI `decodeFrameBands` first
    * (malformed shapes ignored), then the built-in imageio container
    * path; 8 frames × 8 bands → bit i (frame-major) set when cell i's
    * luminance is at least the grid's global mean. */
  private def videoFp64(bytes: Array[Byte],
                        spi: Seq[FrameDecoder]): Option[Long] = {
    val segs = 8
    val nb = 8
    val viaSpi =
      if (spi.isEmpty || bytes.isEmpty) None
      else spi.iterator.map(_.decodeFrameBands(bytes, segs, nb))
        .collectFirst { case Some(f)
          if f.size == segs && f.forall(_.bands.length == nb) =>
            f.map(_.bands) }
    viaSpi.orElse(containerFrameBands(bytes, segs, nb).map(_.map(_._3)))
      .map { frames =>
        val flat = frames.flatten
        val mean = flat.map(_.toDouble).sum / flat.size
        var bits = 0L
        var i = 0
        while (i < 64 && i < flat.size) {
          if (flat(i) >= mean) bits |= (1L << i)
          i += 1
        }
        bits
      }
  }

  /** STUB image decode + feature extraction.
    *
    * Production kernel: decode bytes → HxWxC, pool to an embedding. Here the
    * "decode" derives (width, height, feature) deterministically from a hash
    * of the bytes, preserving schema/shape/partitioning. Runs mapPartitions
    * so a real kernel can amortize per-partition model/codec setup — the
    * same batch shape a `mapInPandas` UDF would see.
    */
  def decodeImagesStub(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      // >>> STUB KERNEL — replace with a real codec; everything else stands.
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val h = java.util.Arrays.hashCode(bytes)
        val w = 64 + math.abs(h % 512)
        val ht = 64 + math.abs((h / 512) % 512)
        val feat = Array.tabulate(featureDim)(i =>
          (((h.toLong * 2654435761L + i * 40503L) % 1000L) / 1000.0f))
        Row(id, w, ht, 3, feat.toSeq)
      }
      // <<< STUB KERNEL
    }
    spark.createDataFrame(rdd, imageFeatureSchema)
  }

  /** STUB resize: records the target geometry; a real kernel re-encodes the
    * bytes. Pure-column metadata math stays real. */
  def resizeStub(features: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    features
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  val sampledFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_count", IntegerType),
    StructField("frame_index", IntegerType),
    StructField("decode_ok", BooleanType),
    StructField("frame_luminance", FloatType)))

  /** REAL frame sampling for multi-frame `javax.imageio` containers —
    * animated GIF foremost (the one animation format the JDK decodes;
    * still images count as 1-frame containers): real frame count from the
    * reader's image index, `n` evenly-spaced frames decoded, and each
    * sampled frame's mean luminance (same bounded 32×32 grid as
    * [[decodeImages]]) emitted as a per-frame feature. Bytes no JDK
    * reader accepts — true video containers (mp4/webm/…), for which the
    * JDK ships no codec — fall through to [[sampleFramesStub]]'s
    * byte-size frame-count arithmetic with `decode_ok = false` and a
    * hash-derived luminance, so mixed corpora flow instead of failing.
    * Deployments plug real video codecs in through the [[FrameDecoder]]
    * `ServiceLoader` SPI — registered decoders are consulted FIRST (so
    * they can also override the built-in GIF handling) and their frames
    * flow through this same schema with `decode_ok = true`.
    *
    * Same `n`-rows-per-item cardinality contract as the stub (duplicate
    * indices when the container has fewer than `n` frames, exactly like
    * the stub's floor arithmetic). GIF note: frames decode as stored —
    * a delta frame's luminance is measured over its own raster, not a
    * composited canvas (feature extraction, not playback).
    *
    * `mapPartitions` amortizes reader discovery per partition; work per
    * row is bounded by `n` decoded frames × the fixed sampling grid. */
  def sampleFrames(media: DataFrame, n: Int = 4): DataFrame = {
    require(n > 0)
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content", "byte_size").rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val spi = FrameDecoder.registered
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes =
            Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val size = if (r.isNullAt(2)) bytes.length.toLong else r.getLong(2)
          val viaSpi =
            if (spi.isEmpty || bytes.isEmpty) None
            else spi.iterator.map(_.decodeFrames(bytes, n))
              .collectFirst { case Some(f) =>
                f.map(fr => (fr.frameCount, fr.frameIndex, fr.luminance)) }
          viaSpi.orElse(decodeContainerFrames(bytes, n)) match {
            case Some(frames) =>
              frames.map { case (fc, fi, lum) => Row(id, fc, fi, true, lum) }
            case None =>
              // >>> STUB fallback — true video containers (no JDK codec):
              // the stub's byte-size frame count + hash luminance
              val fc = (java.lang.Math.floorMod(size, 500L) + 10L).toInt
              val h = java.util.Arrays.hashCode(bytes)
              (0 until n).map { i =>
                val fi = (i.toLong * fc / n).toInt
                val lum = java.lang.Math.floorMod(
                  h.toLong * 2654435761L + fi * 40503L, 1000L) / 1000.0f
                Row(id, fc, fi, false, lum)
              }
            // <<< STUB fallback
          }
        }
      }
    spark.createDataFrame(rdd, sampledFrameSchema)
  }

  /** Decode `n` evenly-spaced frames of an imageio-readable container:
    * Some((frameCount, frameIndex, meanLuminance) × n) or None when no
    * JDK reader accepts the bytes. */
  private def decodeContainerFrames(bytes: Array[Byte],
                                    n: Int): Option[Seq[(Int, Int, Float)]] =
    containerFrameBands(bytes, n, 1)
      .map(_.map { case (fc, fi, b) => (fc, fi, b(0)) })

  /** The shared container-decode kernel behind [[sampleFrames]] and
    * [[videoFingerprints]]: `n` evenly-spaced frames, each reduced to
    * `bands` top-to-bottom luminance bands —
    * Some((frameCount, frameIndex, bands) × n) or None when no JDK
    * reader accepts the bytes. `getNumImages(true)` walks the whole
    * container once (bounded by the byte array already in memory);
    * random-access reads then decode only the sampled frames. */
  private def containerFrameBands(bytes: Array[Byte], n: Int,
      bands: Int): Option[Seq[(Int, Int, Array[Float])]] = {
    if (bytes.isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val fc = reader.getNumImages(true)
          if (fc <= 0) return None
          Some((0 until n).map { i =>
            val fi = (i.toLong * fc / n).toInt
            (fc, fi, meanLuminanceBands(reader.read(fi), bands))
          })
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Deterministic frame sampling for video rows: emit `n` evenly-spaced
    * frame indices per media item given a (stub-derived) frame count. The
    * explode IS the real operator — a decoder only fills in pixels.
    * The stub frame count derives from the byte size (portable arithmetic,
    * so the operator is oracle-checkable end to end). [[sampleFrames]] is
    * the real-decode superset (GIF frames actually decoded); this stays
    * the fully deterministic, engine-portable oracle formulation. */
  def sampleFramesStub(media: DataFrame, n: Int = 4): DataFrame = {
    val frameCount = (pmod(col("byte_size"), lit(500L)) + 10).cast("int")
    media
      .withColumn("frame_count", frameCount)
      .select(col("media_id"), col("frame_count"),
        explode(transform(sequence(lit(0), lit(n - 1)),
          i => floor(i * col("frame_count") / lit(n.toDouble)).cast("int")))
          .as("frame_index"))
  }
}
