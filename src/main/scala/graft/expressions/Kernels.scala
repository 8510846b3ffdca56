package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled loop bodies shared by the graft expressions' interpreted
  * (`nullSafeEval`) and generated (`doGenCode`) paths. A top-level object
  * gets Java static forwarders, so whole-stage-generated code can call
  * `graft.expressions.Kernels.simhash64(arr)` directly — one static call
  * per row, JIT-inlined, with NO `CodegenFallback` marker on the
  * expressions (the marker excludes the whole enclosing operator from
  * whole-stage codegen, which was the r4/r5 "fractured codegen" defect).
  * Sharing one body between both paths makes eval↔codegen parity hold by
  * construction.
  */
object Kernels {

  /** [[GraftExpressions.SimHash64]] body. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) != 0L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** [[GraftExpressions.MinHashSignature]] body (Kirsch–Mitzenmacher
    * h_j = h1 + j·h2 derived family). */
  def minhashSignature(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 1337L) | 1L
      var j = 0
      var hj = h1
      while (j < k) {
        if (hj < mins(j)) mins(j) = hj
        hj += h2 // wrapping add — deterministic derived hash family
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** [[GraftExpressions.JaccardSimilarity]] body (hash-set intersection). */
  def jaccard(x: ArrayData, y: ArrayData): Double = {
    val set = new java.util.HashSet[String]()
    var i = 0
    while (i < x.numElements()) { set.add(x.getUTF8String(i).toString); i += 1 }
    var inter = 0
    val seen = new java.util.HashSet[String]()
    i = 0
    while (i < y.numElements()) {
      val s = y.getUTF8String(i).toString
      if (seen.add(s) && set.contains(s)) inter += 1
      i += 1
    }
    val union = set.size + seen.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** [[GraftExpressions.WordShingles]] body (split → sliding join →
    * insertion-ordered dedupe). */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val words = ws.split(text.trim().toString, -1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    val last = math.max(words.length - n, 0)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + n, words.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size)))
  }

  /** [[GraftExpressions.RepetitionStats]] body: Gopher-style repetition
    * signals over the token stream in ONE pass — for n ∈ {1,2,3}, the
    * duplicate-n-gram fraction `(total − distinct) / total` and the
    * top-n-gram fraction `max_count / total` (0.0 when the text has fewer
    * than n tokens). Counting is by exact n-gram STRING (not hash), so the
    * relational unnest/groupBy oracle formulation agrees bit-for-bit:
    * both sides divide the same two integers. */
  def repetitionStats(text: UTF8String): InternalRow = {
    val trimmed = text.trim().toString
    val words: Array[String] =
      if (trimmed.isEmpty) Array.empty else ws.split(trimmed, -1)
    val out = new Array[Any](6)
    var n = 1
    while (n <= 3) {
      val total = words.length - n + 1
      if (total <= 0) {
        out((n - 1) * 2) = 0.0
        out((n - 1) * 2 + 1) = 0.0
      } else {
        val counts = new java.util.HashMap[String, Int]()
        var max = 0
        var i = 0
        while (i < total) {
          val gram = if (n == 1) words(i) else {
            val sb = new java.lang.StringBuilder(words(i))
            var j = 1
            while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
            sb.toString
          }
          val c = counts.merge(gram, 1, Integer.sum)
          if (c > max) max = c
          i += 1
        }
        out((n - 1) * 2) = (total - counts.size).toDouble / total.toDouble
        out((n - 1) * 2 + 1) = max.toDouble / total.toDouble
      }
      n += 1
    }
    InternalRow.fromSeq(out.toIndexedSeq)
  }

  /** [[GraftExpressions.CharWindowDupStats]] body: the per-document half
    * of the exact-substring dup signal against a baked corpus window set —
    * (n_windows, n_dup_windows) over every `w`-CHAR window at `stride`
    * steps, a window counting as duplicated when its xxhash64 (seed 42,
    * identical to SQL `xxhash64(substr(text, i, w))` — substr counts
    * CHARACTERS, hashing the window's UTF-8 bytes) binary-searches into
    * the SORTED `hashes` set. Texts shorter than `w` chars have zero
    * windows (callers filter them out for batch-output parity). One pass,
    * no window materialization beyond the probe string. */
  def charWindowDupStats(text: UTF8String, w: Int, stride: Int,
                         hashes: Array[Long]): InternalRow = {
    val chars = text.numChars()
    if (chars < w) return InternalRow(0L, 0L)
    var i = 1
    var total = 0L
    var dup = 0L
    while (i <= chars - w + 1) {
      val s = text.substringSQL(i, w)
      total += 1
      if (hashes.length > 0 && java.util.Arrays.binarySearch(hashes,
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes, 42L)) >= 0)
        dup += 1
      i += stride
    }
    InternalRow(total, dup)
  }

  /** [[GraftExpressions.WordNGrams]] body: ALL word n-grams in order WITH
    * multiplicity (the span-counting complement of [[wordShingles]], which
    * dedupes for set-Jaccard). Texts shorter than n words yield an EMPTY
    * array — a partial span is not a span. */
  def wordNGrams(text: UTF8String, n: Int): ArrayData = {
    val trimmed = text.trim().toString
    val words: Array[String] =
      if (trimmed.isEmpty) Array.empty else ws.split(trimmed, -1)
    val total = words.length - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](total)
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[GraftExpressions.WordChunks]] body: split the token stream into
    * `size`-token chunks advancing by `step = size − overlap`, the
    * standard overlap chunker for embedding/training pipelines. A chunk
    * starts at every multiple of `step` until a chunk has reached the
    * end: nchunks = 1 + ⌈(len − size)/step⌉ (0 for empty text) — the
    * final chunk may be short, but a chunk fully contained in its
    * predecessor is never emitted. */
  def wordChunks(text: UTF8String, size: Int, step: Int): ArrayData = {
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) return new GenericArrayData(Array.empty[Any])
    val words = ws.split(trimmed, -1)
    val len = words.length
    val extra = if (len <= size) 0 else (len - size + step - 1) / step
    val out = new Array[Any](1 + extra)
    var c = 0
    while (c <= extra) {
      val start = c * step
      val end = math.min(start + size, len)
      val sb = new java.lang.StringBuilder(words(start))
      var j = start + 1
      while (j < end) { sb.append(' ').append(words(j)); j += 1 }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** [[GraftExpressions.WindowSetContains]] body: true iff ANY word
    * n-gram of `text` hashes (xxhash64, seed 42 — identical to the SQL
    * `xxhash64` over the joined string) into the SORTED `hashes` set.
    * One pass, no window materialization, early exit on first hit;
    * membership is exact (binary search), never probabilistic. */
  def anyWindowInSet(text: UTF8String, n: Int, hashes: Array[Long]): Boolean = {
    if (hashes.isEmpty) return false
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) return false
    val words = ws.split(trimmed, -1)
    val total = words.length - n + 1
    var i = 0
    while (i < total) {
      if (java.util.Arrays.binarySearch(hashes, windowHash(words, i, n)) >= 0)
        return true
      i += 1
    }
    false
  }

  /** THE window convention shared by the detect ([[anyWindowInSet]]) and
    * strip ([[stripWindowsInSet]]) kernels: xxhash64 (seed 42, identical
    * to SQL `xxhash64`) of the space-joined n-token window starting at
    * word `i`. One definition so the two kernels cannot drift. */
  private def windowHash(words: Array[String], i: Int, n: Int): Long = {
    val sb = new java.lang.StringBuilder(words(i))
    var j = 1
    while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
    val s = UTF8String.fromString(sb.toString)
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
  }

  /** [[GraftExpressions.StripWindowsInSet]] body: the whitespace-split
    * token stream re-joined with single spaces, with every token covered
    * by a FLAGGED n-token window removed. A window is flagged when its
    * space-joined text hashes (xxhash64, seed 42 — identical to SQL
    * `xxhash64`) into the SORTED `hashes` set; overlapping flagged
    * windows union their covered positions. One pass over the windows +
    * one pass over the tokens, no window materialization; the covered
    * bitmap allocates only on the first hit, so unflagged documents
    * (the overwhelming majority) pay a rejoin and nothing else. */
  def stripWindowsInSet(text: UTF8String, n: Int, hashes: Array[Long]): UTF8String = {
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) return UTF8String.EMPTY_UTF8
    val words = ws.split(trimmed, -1)
    val len = words.length
    var covered: Array[Boolean] = null
    if (hashes.length > 0) {
      val total = len - n + 1
      var i = 0
      while (i < total) {
        if (java.util.Arrays.binarySearch(hashes, windowHash(words, i, n)) >= 0) {
          if (covered == null) covered = new Array[Boolean](len)
          var p = i
          while (p < i + n) { covered(p) = true; p += 1 }
        }
        i += 1
      }
    }
    val out = new java.lang.StringBuilder
    var i = 0
    while (i < len) {
      if (covered == null || !covered(i)) {
        if (out.length > 0) out.append(' ')
        out.append(words(i))
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** [[GraftExpressions.BpeEncode]] body: BPE pieces of the whitespace-
    * split text. Each word becomes its code-point symbols plus `</w>`,
    * then the lowest-rank applicable merge is applied to ALL its
    * occurrences left-to-right, repeatedly, until no merge applies —
    * exactly the rewrite order [[graft.llm.Bpe.trainFromWordCounts]]
    * uses, so encoding a training word reproduces its trained
    * decomposition. `ranks` keys are "left right" (symbols never
    * contain whitespace — words are whitespace-split and merges only
    * concatenate). */
  def bpeEncode(text: UTF8String,
                ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) return new GenericArrayData(Array.empty[Any])
    val words = ws.split(trimmed, -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](words.length * 2)
    var wi = 0
    while (wi < words.length) {
      bpeMerge(bpeWordSymbols(words(wi)), ranks)
        .foreach(s => out += UTF8String.fromString(s))
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** [[GraftExpressions.BpeCount]] body: the PIECE COUNT of
    * [[bpeEncode]] without materializing the piece array — the token-
    * budget accounting hot path allocates no per-piece UTF8Strings and
    * no output ArrayData. */
  def bpeCount(text: UTF8String,
               ranks: java.util.HashMap[String, Integer]): Long = {
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) return 0L
    val words = ws.split(trimmed, -1)
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      total += bpeMerge(bpeWordSymbols(words(wi)), ranks).length
      wi += 1
    }
    total
  }

  /** THE word→symbols convention shared by encode/count AND training
    * ([[graft.llm.Bpe.trainFromWordCounts]]): code-point symbols (a
    * non-BMP character is ONE symbol, never two lone surrogates) plus
    * the `</w>` end-of-word symbol. One definition so a trained model
    * always reproduces its decomposition at encode time. */
  def bpeWordSymbols(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    val syms = new scala.collection.mutable.ArrayBuffer[String](w.length + 1)
    var idx = 0
    while (idx < w.length) {
      val cc = Character.charCount(w.codePointAt(idx))
      syms += w.substring(idx, idx + cc)
      idx += cc
    }
    syms += "</w>"
    syms
  }

  /** Apply the lowest-rank applicable merge to ALL its occurrences
    * left-to-right, repeatedly, until none applies — the rewrite order
    * training uses. */
  private def bpeMerge(
      symsIn: scala.collection.mutable.ArrayBuffer[String],
      ranks: java.util.HashMap[String, Integer])
      : scala.collection.mutable.ArrayBuffer[String] = {
    var syms = symsIn
    var more = !ranks.isEmpty
    while (more && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) more = false
      else {
        val merged = bestA + bestB
        val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            next += merged; j += 2
          } else { next += syms(j); j += 1 }
        }
        syms = next
      }
    }
    syms
  }

  /** [[GraftExpressions.PairCombinations]] body — also the codegen path of
    * [[GraftExpressions.PairGenerator]] (same pair order and values). */
  def pairCombinations(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val szs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      szs(i) = row.getLong(1)
      i += 1
    }
    // sort by id so emitted pairs are (smaller, larger)
    val order = (0 until n).sortBy(ids(_)).toArray
    val out = new Array[Any](if (n < 2) 0 else n * (n - 1) / 2)
    var k = 0
    var a = 0
    while (a < n) {
      var b = a + 1
      while (b < n) {
        val x = order(a); val y = order(b)
        out(k) = InternalRow(ids(x), ids(y), szs(x), szs(y))
        k += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }

  /** [[GraftExpressions.ScalarQuantizeVec]] body: per-vector affine int8
    * quantization → `struct<lo, scale, codes array<tinyint>>`. Rounding
    * is exact half-away-from-zero on the true double quotient:
    * `frac = q − floor(q)` is an EXACT subtraction (both operands within
    * a factor of two), so the `.5` comparison carries no
    * addition-rounding hazard — bit-agrees with C `round` (the DuckDB
    * oracle) everywhere, including the dyadic n.5 boundaries where Java
    * `Math.round`'s `floor(q + 0.5)` can round the wrong way. */
  def scalarQuantize(v: ArrayData): InternalRow = {
    val n = v.numElements()
    if (n == 0)
      return InternalRow(null, null,
        new GenericArrayData(Array.empty[Any]))
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      if (x < lo) lo = x
      if (x > hi) hi = x
      i += 1
    }
    val scale = (hi - lo) / 255.0
    val codes = new Array[Byte](n)
    i = 0
    while (i < n) {
      if (scale == 0.0) codes(i) = -128
      else {
        val q = (v.getDouble(i) - lo) / scale
        val f = Math.floor(q)
        var r = f.toLong
        if (q - f >= 0.5) r += 1
        if (r < 0L) r = 0L
        if (r > 255L) r = 255L
        codes(i) = (r - 128L).toByte
      }
      i += 1
    }
    InternalRow(lo, scale,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(codes))
  }

  /** [[GraftExpressions.StructDoubleFieldSum]] body: the left fold
    * `0.0 + f(0) + f(1) + …` over field `fieldIdx` of an array of
    * structs — bit-identical to `functions.aggregate`'s interpreted
    * fold (same init, same order, same IEEE adds) at compiled-loop
    * cost. The BM25/RRF per-group term sums run this over their
    * sort_array'd (key, weight) structs. */
  def structDoubleFieldSum(arr: ArrayData, numFields: Int,
                           fieldIdx: Int): Double = {
    var acc = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      acc += arr.getStruct(i, numFields).getDouble(fieldIdx)
      i += 1
    }
    acc
  }

  /** [[GraftExpressions.DequantizeVec]] body: `lo + (code + 128)·scale`
    * per element. */
  def dequantize(codes: ArrayData, lo: Double, scale: Double): ArrayData = {
    val n = codes.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = lo + (codes.getByte(i).toInt + 128).toDouble * scale
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}
