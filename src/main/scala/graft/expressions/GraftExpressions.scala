package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, CollectionGenerator, Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the operator hot paths that Spark's
  * built-in surface only reaches via interpreted higher-order functions
  * (`transform`/`aggregate` evaluate their lambda per element through the
  * interpreter — measured 10-50× slower than a compiled loop on the dedup
  * and ANN kernels).
  *
  * Every expression implements BOTH paths over one shared loop body in
  * [[Kernels]]: `nullSafeEval` for interpreted evaluation and `doGenCode`
  * for whole-stage codegen (a static `Kernels` call per row — the
  * `CodegenFallback` marker would exclude the entire enclosing operator
  * from whole-stage codegen, fracturing the dedup scan stages). Parity of
  * the two paths holds by construction and is additionally pinned by
  * ExpressionsSpec's vectors.
  */
object GraftExpressions {

  private val K = "graft.expressions.Kernels"

  /** 64-bit SimHash over an array of shingle strings: bit i of the result is
    * the sign of Σ_shingles ±1 (depending on bit i of the shingle's
    * xxhash64). Single pass, no shuffle — pairs with chunk-banding for
    * near-dup candidate generation.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(Kernels.simhash64(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.simhash64($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
    override def prettyName: String = "graft_simhash64"
  }

  /** MinHash signature: k permutation-minima over the shingle set, using the
    * Kirsch–Mitzenmacher construction h_j = h1 + j·h2 (two xxhash64 base
    * hashes per shingle, k derived values) — one compiled pass per row,
    * no explode, no shuffle.
    */
  case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
    require(k > 0 && k <= 1024, s"signature length $k out of range")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.minhashSignature(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.minhashSignature($c, $k)")
    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
    override def prettyName: String = "graft_minhash"
  }

  /** Cosine similarity of two double arrays in ONE pass, with the exact
    * left-to-right accumulation order of the Column/SQL formulation
    * Σab / (√Σa² · √Σb²) — bit-identical to the DuckDB oracle. The loop is
    * generated inline (no call at all) — it is the ANN scoring hot path. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = $a.getDouble($i);
           |  double $yi = $b.getDouble($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
           |""".stripMargin
      })
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var nx = 0.0
      var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i)
        val yi = y.getDouble(i)
        dot += xi * yi
        nx += xi * xi
        ny += yi * yi
        i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "graft_cosine"
  }

  /** Squared L2 distance of two double arrays in one pass (the product-
    * quantization training/assignment metric — cosine is wrong for
    * SUBvectors, whose per-subspace norms carry real information). Same
    * inline-codegen treatment as [[CosineSimilarity]]. */
  case class L2DistanceSq(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = $a.getDouble($i) - $b.getDouble($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "graft_l2sq"
  }

  /** Exact Jaccard similarity of two string arrays (sorted-merge free:
    * hash-set intersection in one pass). */
  case class JaccardSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Double.valueOf(Kernels.jaccard(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.jaccard($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "graft_jaccard"
  }

  /** Distinct word n-gram shingles of a text column — compiled single pass
    * (split → sliding join → insertion-ordered dedupe). Replaces the
    * equivalent transform/slice/array_join/array_distinct column stack,
    * whose interpreted evaluation dominated the whole exact-Jaccard
    * pipeline (measured ~55% of total runtime). Semantics are identical:
    * whitespace-regex split of the trimmed text; texts shorter than n words
    * contribute their whole token sequence as one shingle. */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    require(n > 0)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.wordShingles(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.wordShingles($c, $n)")
    override protected def withNewChildInternal(c: Expression): WordShingles =
      copy(child = c)
    override def prettyName: String = "graft_shingles"
  }

  /** All ordered pairs (i<j) from one inverted-index bucket: input
    * `array<struct<id long, sz int|long>>`, output
    * `array<struct<i,j,si,sj>>`. Compiled combination loop — replaces a
    * shuffle self-join in the exact-Jaccard pipeline (the bucket array
    * arrives from one groupBy; pair generation is then pure map work). */
  case class PairCombinations(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("si", LongType, nullable = false),
      StructField("sj", LongType, nullable = false))), containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.pairCombinations(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.pairCombinations($c)")
    override protected def withNewChildInternal(c: Expression): PairCombinations =
      copy(c)
    override def prettyName: String = "graft_pair_combinations"
  }

  /** Streaming variant of [[PairCombinations]]: a Catalyst generator
    * (explode-analog) whose INTERPRETED path yields each bucket's (i<j)
    * pairs one at a time — per-row memory O(d) instead of the full
    * d·(d−1)/2 struct array. Its CODEGEN path is a [[CollectionGenerator]]
    * (the same machinery as explode/inline): the generated loop iterates a
    * [[Kernels.pairCombinations]] array whose size the hot-shingle cap
    * bounds (≤1000 docs → ≤~500k structs, a transient per-row buffer), in
    * exchange for keeping the whole Generate stage inside whole-stage
    * codegen. Pair order and values are identical on both paths
    * (parity-tested in ExpressionsSpec).
    */
  case class PairGenerator(child: Expression)
      extends UnaryExpression with CollectionGenerator {
    override def elementSchema: StructType = StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("si", LongType, nullable = false),
      StructField("sj", LongType, nullable = false)))
    override val inline: Boolean = true
    override val position: Boolean = false
    override def collectionType: DataType = dataType
    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val value = child.eval(input)
      if (value == null) return Iterator.empty
      val arr = value.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < 2) return Iterator.empty
      val ids = new Array[Long](n)
      val szs = new Array[Long](n)
      var i = 0
      while (i < n) {
        val row = arr.getStruct(i, 2)
        ids(i) = row.getLong(0)
        szs(i) = row.getLong(1)
        i += 1
      }
      // same (smaller-id, larger-id) emission order as PairCombinations
      val order = (0 until n).sortBy(ids(_)).toArray
      new Iterator[InternalRow] {
        private var a = 0
        private var b = 1
        def hasNext: Boolean = a < n - 1
        def next(): InternalRow = {
          val x = order(a); val y = order(b)
          val out = InternalRow(ids(x), ids(y), szs(x), szs(y))
          b += 1
          if (b >= n) { a += 1; b = a + 1 }
          out
        }
      }
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.pairCombinations($c)")
    override protected def withNewChildInternal(c: Expression): PairGenerator =
      copy(c)
    override def prettyName: String = "graft_pair_generator"
  }

  /** Fraction of positions where two equal-length long-array signatures
    * agree — the MinHash Jaccard estimator. Implements `doGenCode`, so the
    * candidate-verification join stage stays inside whole-stage codegen
    * (replaces the interpreted `size(filter(zip_with(...)))/size(...)`
    * column stack, the last interpreted HOF on the dedup hot path).
    * Semantics match that stack exactly for equal-length signatures:
    * matches over the overlap, divided by the LEFT signature's length. An
    * empty left signature (empty-text document → empty shingle set) yields
    * NULL, as the replaced column stack did — never NaN. */
  case class SignatureAgreement(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val m = ctx.freshName("m")
        s"""
           |if ($a.numElements() == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |  int $m = 0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.getLong($i) == $b.getLong($i)) $m++;
           |  }
           |  ${ev.value} = (double) $m / $a.numElements();
           |}
           |""".stripMargin
      })
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() == 0) return null
      val n = math.min(x.numElements(), y.numElements())
      var m = 0
      var i = 0
      while (i < n) {
        if (x.getLong(i) == y.getLong(i)) m += 1
        i += 1
      }
      java.lang.Double.valueOf(m.toDouble / x.numElements())
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "graft_signature_agreement"
  }

  /** All `nTables` random-hyperplane LSH signatures of a double vector in
    * ONE compiled pass (replaces the interpreted `aggregate`×`zip_with`
    * column stack evaluated per plane × per table — the pattern measured
    * 10-50× slower elsewhere). Bit-identical to the column formulation in
    * [[graft.llm.Similarity.hyperplaneSignature]] (parity-tested in
    * ExpressionsSpec): plane weights are deterministic pseudo-random values
    * in [-1,1) derived as
    * `pmod(xxhash64(table*4096+plane, dim), 2000001)/1e6 - 1`, projections
    * accumulate left-to-right per plane, bit p = (projection >= 0).
    * Per-plane base hashes are hoisted out of the dim loop AND out of the
    * per-row path entirely (computed once per expression instance); codegen
    * calls [[computeSignatures]] through a plan reference — a virtual call
    * per row, but the operator stays inside whole-stage codegen. */
  case class HyperplaneSignatures(child: Expression, nPlanes: Int, nTables: Int)
      extends UnaryExpression {
    require(nPlanes > 0 && nPlanes <= 63, s"nPlanes $nPlanes out of range")
    require(nTables > 0 && nTables <= 1024, s"nTables $nTables out of range")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // base hash per (table, plane): XxHash64(seed=42) folds the int literal
    // table*4096+plane first, then the dim index
    @transient private lazy val baseHashes: Array[Array[Long]] =
      Array.tabulate(nTables, nPlanes)((t, p) => XXH64.hashInt(t * 4096 + p, 42L))
    def computeSignatures(v: ArrayData): ArrayData = {
      val n = v.numElements()
      val out = new Array[Long](nTables)
      var t = 0
      while (t < nTables) {
        val hp = baseHashes(t)
        var sig = 0L
        var p = 0
        while (p < nPlanes) {
          val base = hp(p)
          var acc = 0.0
          var i = 0
          while (i < n) {
            val h = XXH64.hashInt(i, base)
            val m = h % 2000001L
            val pm = if (m < 0) m + 2000001L else m
            acc += v.getDouble(i) * (pm.toDouble / 1000000.0 - 1.0)
            i += 1
          }
          if (acc >= 0) sig |= (1L << p)
          p += 1
        }
        out(t) = sig
        t += 1
      }
      new GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any =
      computeSignatures(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hyperplanes", this)
      defineCodeGen(ctx, ev, c => s"$ref.computeSignatures($c)")
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneSignatures =
      copy(child = c)
    override def prettyName: String = "graft_hyperplane_signatures"
  }

  /** Gopher-style repetition signals over the token stream, ONE compiled
    * pass per document (per-doc state is document-local, so the signal
    * column computes inside the scan stage with ZERO shuffle — the
    * relational explode/groupBy formulation is the ORACLE, not the
    * engine): struct of duplicate-n-gram fraction and top-n-gram fraction
    * for n ∈ {1,2,3}. */
  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("dup_unigram_frac", DoubleType, nullable = false),
      StructField("top_unigram_frac", DoubleType, nullable = false),
      StructField("dup_bigram_frac", DoubleType, nullable = false),
      StructField("top_bigram_frac", DoubleType, nullable = false),
      StructField("dup_trigram_frac", DoubleType, nullable = false),
      StructField("top_trigram_frac", DoubleType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      Kernels.repetitionStats(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.repetitionStats($c)")
    override protected def withNewChildInternal(c: Expression): RepetitionStats =
      copy(c)
    override def prettyName: String = "graft_repetition_stats"
  }

  /** Per-document exact-substring dup counts against a baked corpus
    * window-hash set — the map-only streaming half of
    * [[graft.llm.Dedup.substringDupStatsAgainst]] (same window
    * convention: `w`-char windows at `stride` steps, xxhash64 seed 42
    * over the window's UTF-8 bytes, exact sorted-set membership — never a
    * Bloom probe, a false positive would silently score clean text as
    * copied). Returns `struct<n_windows, n_dup_windows>`. */
  case class CharWindowDupStats(child: Expression, w: Int, stride: Int,
                                hashes: Array[Long]) extends UnaryExpression {
    require(w > 0 && stride > 0)
    override def dataType: DataType = StructType(Seq(
      StructField("n_windows", LongType, nullable = false),
      StructField("n_dup_windows", LongType, nullable = false)))
    override def nullSafeEval(input: Any): Any =
      Kernels.charWindowDupStats(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        w, stride, hashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("dupSet", this)
      defineCodeGen(ctx, ev, c => s"$ref.stats($c)")
    }
    def stats(text: org.apache.spark.unsafe.types.UTF8String): InternalRow =
      Kernels.charWindowDupStats(text, w, stride, hashes)
    override protected def withNewChildInternal(c: Expression): CharWindowDupStats =
      copy(child = c)
    override def prettyName: String = "graft_char_window_dup_stats"
  }

  /** All word n-grams WITH multiplicity (span counting; [[WordShingles]]
    * dedupes for set-Jaccard). Compiled single pass; shorter-than-n texts
    * yield an empty array. */
  case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
    require(n > 0)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.wordNGrams(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.wordNGrams($c, $n)")
    override protected def withNewChildInternal(c: Expression): WordNGrams =
      copy(child = c)
    override def prettyName: String = "graft_word_ngrams"
  }

  /** Overlapping fixed-size token chunks of a text column — the
    * embedding/training-pipeline chunker, compiled single pass (see
    * [[Kernels.wordChunks]] for the boundary semantics). */
  case class WordChunks(child: Expression, size: Int, overlap: Int)
      extends UnaryExpression {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap $overlap < size $size")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      Kernels.wordChunks(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        size, size - overlap)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.wordChunks($c, $size, ${size - overlap})")
    override protected def withNewChildInternal(c: Expression): WordChunks =
      copy(child = c)
    override def prettyName: String = "graft_word_chunks"
  }

  /** True iff ANY word n-gram of the text is in a driver-resident sorted
    * hash set — the stateless per-row form of benchmark decontamination
    * (no explode, no join, stream-safe). Membership is EXACT (binary
    * search over xxhash64 values), not a Bloom probe: a false positive
    * here would silently drop a clean training document. The set is baked
    * into the expression (plan-shipped once per executor); at ~8 bytes per
    * benchmark window that bounds practical benchmark size to memory —
    * the relational [[graft.llm.Dedup.contaminationHits]] join is the
    * path for benchmark sets beyond that. */
  case class WindowSetContains(child: Expression, n: Int, hashes: Array[Long])
      extends UnaryExpression {
    require(n > 0)
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      Kernels.anyWindowInSet(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, hashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("windowSet", this)
      defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
    }
    def contains(text: org.apache.spark.unsafe.types.UTF8String): Boolean =
      Kernels.anyWindowInSet(text, n, hashes)
    override protected def withNewChildInternal(c: Expression): WindowSetContains =
      copy(child = c)
    override def prettyName: String = "graft_window_set_contains"
  }

  /** The token stream with every corpus-flagged n-token window REMOVED —
    * the rewrite half of boilerplate handling (where
    * [[WindowSetContains]] is the detect half): C4-style surgical span
    * removal that keeps the document. Same conventions as the detect
    * kernel — whitespace split, space-joined window text, exact xxhash64
    * membership over a sorted driver-resident set (never a Bloom probe:
    * a false positive here would silently delete clean training text).
    * Output is the single-space re-joined stream of uncovered tokens, so
    * the rewrite is a MAP-ONLY projection — no explode, join, or
    * reassembly shuffle touches the corpus. */
  case class StripWindowsInSet(child: Expression, n: Int, hashes: Array[Long])
      extends UnaryExpression {
    require(n > 0)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      Kernels.stripWindowsInSet(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, hashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("stripSet", this)
      defineCodeGen(ctx, ev, c => s"$ref.strip($c)")
    }
    def strip(text: org.apache.spark.unsafe.types.UTF8String)
        : org.apache.spark.unsafe.types.UTF8String =
      Kernels.stripWindowsInSet(text, n, hashes)
    override protected def withNewChildInternal(c: Expression): StripWindowsInSet =
      copy(child = c)
    override def prettyName: String = "graft_strip_windows"
  }

  /** BPE subword pieces of a text column — the trained merge table rides
    * inside the expression (merge tables are ≤ ~100k short string pairs,
    * trivially plan-shippable), so encoding is a MAP-ONLY projection in
    * the scan stage: no join against a vocabulary table, no shuffle.
    * Merge application order matches training's rewrite exactly (see
    * [[Kernels.bpeEncode]]). */
  private def bpeRanks(merges: Seq[(String, String)])
      : java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, Integer.valueOf(i))
    }
    m
  }

  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val ranks = bpeRanks(merges)
    def encode(text: org.apache.spark.unsafe.types.UTF8String): ArrayData =
      Kernels.bpeEncode(text, ranks)
    override def nullSafeEval(input: Any): Any =
      encode(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeRanks", this)
      defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
    }
    override protected def withNewChildInternal(c: Expression): BpeEncode =
      copy(child = c)
    override def prettyName: String = "graft_bpe_encode"
  }

  /** Piece COUNT of [[BpeEncode]] without materializing the pieces —
    * token-budget accounting over a corpus should not allocate one
    * UTF8String per subword just to count them. */
  case class BpeCount(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    @transient private lazy val ranks = bpeRanks(merges)
    def count(text: org.apache.spark.unsafe.types.UTF8String): Long =
      Kernels.bpeCount(text, ranks)
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        count(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeRanks", this)
      defineCodeGen(ctx, ev, c => s"$ref.count($c)")
    }
    override protected def withNewChildInternal(c: Expression): BpeCount =
      copy(child = c)
    override def prettyName: String = "graft_bpe_count"
  }

  /** All `m` per-subspace nearest-codeword ids of a product-quantized
    * vector in ONE compiled pass: subspace s covers dims [s·w, (s+1)·w);
    * its assignment is the codeword minimizing squared L2 distance over
    * that slice, ties to the LOWEST centroid id. The codebooks are a
    * driver-side constant baked into the expression (m·k·w doubles —
    * trivially small at any corpus scale), so PQ encode is a map-only
    * projection: no explode, join, window, or shuffle touches the corpus.
    * An expression-level unrolling of the same argmin (m·k inlined
    * distance subtrees) overflowed janino's method limit inside the fused
    * aggregate stage; this runtime loop keeps the generated code one call.
    * Distance accumulation order matches [[L2DistanceSq]] exactly.
    */
  case class PqAssign(child: Expression, books: Seq[(Int, Long, Seq[Double])])
      extends UnaryExpression {
    require(books.nonEmpty, "empty codebooks")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // [sub][codeword] parallel id/vector arrays, codewords in ascending
    // centroid-id order so first-strict-minimum == lowest-id tie-break
    @transient private lazy val bySub: Array[(Array[Long], Array[Array[Double]])] = {
      val m = books.map(_._1).max + 1
      Array.tabulate(m) { s =>
        val rows = books.filter(_._1 == s).sortBy(_._2)
        require(rows.nonEmpty, s"no codewords for subspace $s")
        (rows.map(_._2).toArray, rows.map(_._3.toArray).toArray)
      }
    }
    def assign(v: ArrayData): ArrayData = {
      val m = bySub.length
      val out = new Array[Long](m)
      var s = 0
      while (s < m) {
        val (cids, words) = bySub(s)
        val w = words(0).length
        val off = s * w
        val n = math.min(w, math.max(0, v.numElements() - off))
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < words.length) {
          val cw = words(c)
          var acc = 0.0
          var i = 0
          while (i < n) {
            val d = v.getDouble(off + i) - cw(i)
            acc += d * d
            i += 1
          }
          if (acc < bestD) { bestD = acc; best = c }
          c += 1
        }
        out(s) = cids(best)
        s += 1
      }
      new GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any =
      assign(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", this)
      defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
    }
    override protected def withNewChildInternal(c: Expression): PqAssign =
      copy(child = c)
    override def prettyName: String = "graft_pq_assign"
  }

  /** Nearest-centroid assignment with the centroid table baked in as a
    * literal — the IVF analog of [[PqAssign]]: one compiled scan over the
    * corpus replaces the crossJoin(broadcast)+window formulation (which
    * shuffles corpus×nlist scored rows into a per-vector row_number just
    * to keep one). Scores accumulate in EXACTLY the order of
    * [[CosineSimilarity]] / [[L2DistanceSq]] and ties keep the smallest
    * centroid id (centroids must arrive id-ascending; strict improvement
    * keeps the earlier id), so assignments bit-agree with the window
    * formulation. Cosine NaNs (zero-norm degenerates) mirror Spark's
    * sort order, where NaN ranks above every double. */
  case class NearestCentroid(child: Expression, cents: Seq[(Long, Seq[Double])],
                             metric: String)
      extends UnaryExpression {
    require(cents.nonEmpty, "NearestCentroid: empty centroid set")
    require(metric == "cosine" || metric == "l2",
      s"NearestCentroid: unknown metric $metric")
    require(cents.map(_._1) == cents.map(_._1).sorted,
      "NearestCentroid: centroids must be id-ascending (tie-break contract)")
    override def dataType: DataType = LongType
    @transient private lazy val ids: Array[Long] = cents.map(_._1).toArray
    @transient private lazy val vecs: Array[Array[Double]] =
      cents.map(_._2.toArray).toArray
    private val useCosine = metric == "cosine"
    def assign(v: ArrayData): Long = {
      var best = 0
      var bestS = if (useCosine) Double.NegativeInfinity else Double.PositiveInfinity
      var c = 0
      while (c < vecs.length) {
        val w = vecs(c)
        val n = math.min(v.numElements(), w.length)
        if (useCosine) {
          var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
          while (i < n) {
            val xi = v.getDouble(i); val yi = w(i)
            dot += xi * yi; nx += xi * xi; ny += yi * yi
            i += 1
          }
          val s = dot / (math.sqrt(nx) * math.sqrt(ny))
          // NaN outranks every double in Spark's desc sort — mirror it
          if (s > bestS || (s.isNaN && !bestS.isNaN)) { bestS = s; best = c }
        } else {
          var acc = 0.0; var i = 0
          while (i < n) {
            val d = v.getDouble(i) - w(i); acc += d * d; i += 1
          }
          // asc sort: NaN ranks last and can never win
          if (acc < bestS) { bestS = acc; best = c }
        }
        c += 1
      }
      ids(best)
    }
    override def nullSafeEval(input: Any): Any =
      assign(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nearestCentroid", this)
      defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
    override def prettyName: String = "graft_nearest_centroid"
  }

  /** Per-vector affine int8 quantization (compiled single pass — the
    * built-in `transform`/`array_min` formulation interprets its lambda
    * per element and re-evaluates through projection collapse; measured
    * ~15× slower at sf0.1). See [[Kernels.scalarQuantize]] for the
    * rounding contract. Null vector → null struct (null-propagating);
    * empty vector → (null, null, empty codes). */
  case class ScalarQuantizeVec(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("lo", DoubleType, nullable = true),
      StructField("scale", DoubleType, nullable = true),
      StructField("codes", ArrayType(ByteType, containsNull = false),
        nullable = false)))
    override def nullSafeEval(input: Any): Any =
      Kernels.scalarQuantize(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$K.scalarQuantize($c)")
    override protected def withNewChildInternal(c: Expression): ScalarQuantizeVec =
      copy(c)
    override def prettyName: String = "graft_scalar_quantize"
  }

  /** Dequantize a [[ScalarQuantizeVec]] code array: `lo + (code+128)·scale`
    * per element, compiled. */
  case class DequantizeVec(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(codes: Any, lo: Any, scale: Any): Any =
      Kernels.dequantize(codes.asInstanceOf[ArrayData],
        lo.asInstanceOf[Double], scale.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (c, l, s) => s"$K.dequantize($c, $l, $s)")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): DequantizeVec =
      copy(f, s, t)
    override def prettyName: String = "graft_dequantize"
  }

  /** Compiled left-fold sum of one double field over an array of
    * structs — `functions.aggregate`'s semantics (init 0.0, in-order
    * IEEE adds, bit-identical result) without its per-element
    * interpreted-lambda cost. Null array → null (null-propagating). */
  case class StructDoubleFieldSum(child: Expression, numFields: Int,
                                  fieldIdx: Int) extends UnaryExpression {
    require(numFields > 0 && fieldIdx >= 0 && fieldIdx < numFields)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      Kernels.structDoubleFieldSum(
        input.asInstanceOf[ArrayData], numFields, fieldIdx)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"$K.structDoubleFieldSum($c, $numFields, $fieldIdx)")
    override protected def withNewChildInternal(c: Expression): StructDoubleFieldSum =
      copy(c)
    override def prettyName: String = "graft_struct_field_sum"
  }

  /** Natural log through the platform-intrinsic `java.lang.Math.log` in
    * BOTH interpreted and codegen paths. Spark's built-in `log` emits
    * fdlibm `StrictMath.log` under whole-stage codegen — the slow,
    * portable path; the JIT intrinsic is measurably faster and at least
    * as accurate. NOTE on reproducibility: `Math.log`, `StrictMath.log`
    * and glibc/DuckDB `ln` disagree PAIRWISE by one ulp on different
    * inputs (measured on the BM25 idf domain: df=373 splits Strict from
    * the other two, df=398 splits Math from the other two), so no choice
    * here is bit-portable across engines — [[graft.llm.Retrieval]]
    * quantizes downstream scores instead. Null-propagating, like the
    * built-in. */
  case class PlatformLog(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      java.lang.Double.valueOf(java.lang.Math.log(input.asInstanceOf[Double]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")
    override protected def withNewChildInternal(c: Expression): PlatformLog =
      copy(c)
    override def prettyName: String = "graft_platform_ln"
  }

  // ------------------------------------------------------- Column surface
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graft.ColumnShim.expression(c)
  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graft.ColumnShim.column(e)

  def simhash64(shingles: Column): Column = toCol(SimHash64(expr(shingles)))
  def platformLn(x: Column): Column =
    toCol(PlatformLog(expr(x.cast("double"))))
  def scalarQuantizeVec(v: Column): Column =
    toCol(ScalarQuantizeVec(expr(v)))
  def structDoubleFieldSum(arr: Column, numFields: Int,
                           fieldIdx: Int): Column =
    toCol(StructDoubleFieldSum(expr(arr), numFields, fieldIdx))
  def dequantizeVec(codes: Column, lo: Column, scale: Column): Column =
    toCol(DequantizeVec(expr(codes), expr(lo), expr(scale)))
  def minhashSignature(shingles: Column, k: Int): Column =
    toCol(MinHashSignature(expr(shingles), k))
  def cosineSimilarity(a: Column, b: Column): Column =
    toCol(CosineSimilarity(expr(a), expr(b)))
  def l2DistanceSq(a: Column, b: Column): Column =
    toCol(L2DistanceSq(expr(a), expr(b)))
  def jaccardSimilarity(a: Column, b: Column): Column =
    toCol(JaccardSimilarity(expr(a), expr(b)))
  def pairCombinations(bucket: Column): Column =
    toCol(PairCombinations(expr(bucket)))
  def pairGenerator(bucket: Column): Column =
    toCol(PairGenerator(expr(bucket)))
  def wordShingles(text: Column, n: Int): Column =
    toCol(WordShingles(expr(text), n))
  def signatureAgreement(a: Column, b: Column): Column =
    toCol(SignatureAgreement(expr(a), expr(b)))
  def hyperplaneSignatures(vec: Column, nPlanes: Int, nTables: Int): Column =
    toCol(HyperplaneSignatures(expr(vec.cast("array<double>")), nPlanes, nTables))
  def pqAssign(vec: Column, books: Seq[(Int, Long, Seq[Double])]): Column =
    toCol(PqAssign(expr(vec), books))
  def nearestCentroid(vec: Column, cents: Seq[(Long, Seq[Double])],
                      metric: String): Column =
    toCol(NearestCentroid(expr(vec), cents, metric))
  def repetitionStats(text: Column): Column =
    toCol(RepetitionStats(expr(text)))
  def windowSetContains(text: Column, n: Int, hashes: Array[Long]): Column =
    toCol(WindowSetContains(expr(text), n, hashes))
  def charWindowDupStats(text: Column, w: Int, stride: Int,
                         hashes: Array[Long]): Column =
    toCol(CharWindowDupStats(expr(text), w, stride, hashes))
  def stripWindowsInSet(text: Column, n: Int, hashes: Array[Long]): Column =
    toCol(StripWindowsInSet(expr(text), n, hashes))
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    toCol(BpeEncode(expr(text), merges))
  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    toCol(BpeCount(expr(text), merges))
  def wordNGrams(text: Column, n: Int): Column =
    toCol(WordNGrams(expr(text), n))
  def wordChunks(text: Column, size: Int, overlap: Int): Column =
    toCol(WordChunks(expr(text), size, overlap))
  /** Bounded top-k-per-group: see [[TopKByKey]]. Use inside
    * `groupBy(...).agg(...)`; returns `array<struct<key, payload>>`
    * sorted best-first. */
  def topKByKey(key: Column, payload: Column, k: Int,
                asc: Boolean = true): Column =
    toCol(TopKByKey(expr(key), expr(payload), k, asc).toAggregateExpression())

  /** Per-group-k bounded top-k: see [[TopKByKeyPerGroup]]. `k` is a
    * per-row INT column that must be constant within each group
    * (typically a map-literal lookup on the grouping column). */
  def topKByKeyPerGroup(key: Column, payload: Column, k: Column,
                        asc: Boolean = true): Column =
    toCol(TopKByKeyPerGroup(expr(key), expr(payload), expr(k), asc)
      .toAggregateExpression())

  /** Misra–Gries heavy-hitter sketch: see [[MisraGries]]. Returns
    * `array<struct<item, count_lb>>` sorted (count desc, item asc);
    * every item with frequency > N/(capacity+1) is guaranteed present. */
  def misraGries(item: Column, capacity: Int): Column =
    toCol(MisraGries(expr(item), capacity).toAggregateExpression())

  /** KLL quantile sketch aggregate over a DOUBLE column → sketch
    * binary; see [[KllSketchAgg]]. */
  def kllSketch(value: Column, k: Int): Column =
    toCol(KllSketchAgg(expr(value.cast("double")), k)
      .toAggregateExpression())

  /** Union stored KLL sketch binaries → merged sketch binary. */
  def kllMerge(sketch: Column, k: Int): Column =
    toCol(KllMergeAgg(expr(sketch), k).toAggregateExpression())

  /** Quantiles out of a KLL sketch binary (INCLUSIVE semantics). */
  def kllQuantiles(sketch: Column, qs: Seq[Double]): Column =
    toCol(KllQuantileValues(expr(sketch), qs))

  /** The item count a KLL sketch has absorbed. */
  def kllN(sketch: Column): Column = toCol(KllSketchN(expr(sketch)))

  /** Normalized INCLUSIVE rank of a DOUBLE probe in a KLL sketch
    * binary — `#{x ≤ v}/n`, exact in the no-compaction regime; see
    * [[KllRankValue]]. */
  def kllRank(sketch: Column, value: Column): Column =
    toCol(KllRankValue(expr(sketch), expr(value.cast("double"))))

  /** Discrete inclusive median + MAD from one KLL sketch binary —
    * `struct<med, mad>`, exact in the no-compaction regime; see
    * [[KllRobustStats]]. */
  def kllRobustStats(sketch: Column): Column =
    toCol(KllRobustStats(expr(sketch)))

  /** Explode a KLL sketch binary into its sorted CDF view —
    * `struct<items array<double>, cumw array<bigint>, n bigint>`:
    * the train→serve split for rank serving (compute once per group,
    * binary-search per probe); see [[KllCdfView]]. */
  def kllCdf(sketch: Column): Column = toCol(KllCdfView(expr(sketch)))

  /** Normalized INCLUSIVE rank of a probe against a [[kllCdf]] view —
    * in-place binary search, O(log retained) per row, bit-equal to
    * [[kllRank]] on the originating sketch; see [[SortedCdfRank]]. */
  def cdfRank(items: Column, cumw: Column, n: Column,
              value: Column): Column =
    toCol(SortedCdfRank(expr(items), expr(cumw), expr(n),
      expr(value.cast("double"))))

  /** Morton (Z-order) bit-interleave of k quantized BIGINT cells —
    * the multi-dimensional lake-layout key; see [[InterleaveBits]]
    * and [[graft.core.Layout]]. */
  def interleaveBits(cells: Seq[Column], bits: Int): Column =
    toCol(InterleaveBits(cells.map(expr), bits))

  /** Bloom membership sketch aggregate over a LONG key column → filter
    * binary. Geometry (bits, hash count) derives deterministically from
    * (expectedKeys, fpp) via the standard m = −n·ln p / ln²2 formula, so
    * sketches built with the same parameters are union-compatible; see
    * [[BloomUnion]]. Built on [[BloomBuildAgg]], NOT Spark's
    * `BloomFilterAggregate`, which silently clamps geometry against the
    * runtime-join-filter session confs (4M items / 64 Mbit by default) —
    * a saturated membership filter would silently answer "seen" for
    * everything. A build whose bit array exceeds 8 Gbit (~1 GiB — the
    * broadcast-sanity ceiling) THROWS: raise `fpp` (the exact confirm
    * join stays exact) or slice the corpus further. */
  def bloomSketch(key: Column, expectedKeys: Long, fpp: Double): Column = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1,
      s"bloomSketch: need expectedKeys > 0 and fpp in (0,1), " +
        s"got ($expectedKeys, $fpp)")
    val numBits = math.max(64L,
      (-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    require(numBits <= 8L * 1024 * 1024 * 1024,
      s"bloomSketch: ($expectedKeys keys, fpp=$fpp) needs $numBits bits " +
        "(> 8 Gbit ≈ 1 GiB serialized) — raise fpp (membership routing " +
        "stays exact; only the confirm-join residue grows) or build " +
        "more, smaller slices")
    toCol(BloomBuildAgg(expr(key), expectedKeys, numBits)
      .toAggregateExpression())
  }

  /** Union of serialized Bloom filter binaries: see [[BloomUnion]]. */
  def bloomUnion(sketch: Column): Column =
    toCol(BloomUnion(expr(sketch)).toAggregateExpression())

  /** Membership probe of a LONG key against a Bloom filter binary
    * (false ⇒ DEFINITELY absent; true ⇒ present or an fpp-probable
    * false positive). Codegen'd native expression. */
  def bloomMightContain(sketch: Column, key: Column): Column =
    toCol(new org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(expr(sketch), expr(key)))

  /** Disjunctive membership probe of literal hash keys against a
    * PER-ROW Bloom binary (the per-file data-skipping manifest probe —
    * Spark's native `might_contain` requires a constant sketch); see
    * [[BloomMightContainAny]]. Keys must be the SAME hash the sketch
    * was built over (xxhash64 for [[graft.core.Layout.bloomManifest]]). */
  def bloomMightContainAny(sketch: Column, keys: Seq[Long]): Column =
    toCol(BloomMightContainAny(expr(sketch),
      org.apache.spark.sql.catalyst.expressions.CreateArray(
        keys.map(k => org.apache.spark.sql.catalyst.expressions
          .Literal(k, org.apache.spark.sql.types.LongType)))))

  /** Count–Min frequency sketch aggregate over a STRING column →
    * sketch binary; see [[CountMinAgg]]. md5-lane cell hashing: an
    * external engine reproduces every cell as
    * `('0x' || substr(md5(item), i*8+1, 8))::BIGINT % width`. */
  def countMinSketch(item: Column, depth: Int = 4, width: Int = 8192): Column =
    toCol(CountMinAgg(expr(item), depth, width).toAggregateExpression())

  /** Union stored Count–Min binaries cellwise (geometry mismatch
    * throws); see [[CountMinUnion]]. */
  def countMinUnion(sketch: Column): Column =
    toCol(CountMinUnion(expr(sketch)).toAggregateExpression())

  /** Point-frequency estimate of an item against a Count–Min binary:
    * ≥ true count, ≤ true + εN (ε ≈ e/width). Codegen'd. */
  def countMinEstimate(sketch: Column, item: Column): Column =
    toCol(CountMinEstimateExpr(expr(sketch), expr(item)))

  /** The total count a Count–Min sketch has absorbed. */
  def countMinN(sketch: Column): Column = toCol(CountMinTotal(expr(sketch)))

  /** Register all graft expressions for SQL use. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash64",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_minhash",
      es => MinHashSignature(es.head, 64), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine",
      es => CosineSimilarity(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_jaccard",
      es => JaccardSimilarity(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_repetition_stats",
      es => RepetitionStats(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_word_ngrams",
      es => WordNGrams(es(0), intLit(es(1), "graft_word_ngrams", "n")),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_word_chunks",
      es => WordChunks(es(0), intLit(es(1), "graft_word_chunks", "size"),
        intLit(es(2), "graft_word_chunks", "overlap")), "scala_udf")
    reg.createOrReplaceTempFunction("graft_misra_gries",
      es => MisraGries(es(0),
        intLit(es(1), "graft_misra_gries", "capacity"))
        .toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_union",
      es => BloomUnion(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_countmin",
      es => CountMinAgg(es(0),
        intLit(es(1), "graft_countmin", "depth"),
        intLit(es(2), "graft_countmin", "width"))
        .toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_countmin_union",
      es => CountMinUnion(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("graft_countmin_est",
      es => CountMinEstimateExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_countmin_n",
      es => CountMinTotal(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_platform_ln",
      es => PlatformLog(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_scalar_quantize",
      es => ScalarQuantizeVec(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dequantize",
      es => DequantizeVec(es(0), es(1), es(2)), "scala_udf")
  }

  /** Fold a literal int argument of a SQL-registered graft function. */
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT for $arg, got $other")
  }
}
