package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators for training-data pipelines: deterministic
  * train/val/test splits, sequence packing, vocabulary statistics, and
  * keyword extraction.
  *
  * Everything here follows the same engine-portable discipline as
  * [[TextAnalysis.sampleByHash]]: decisions are made by comparing md5 hex
  * prefixes or exact integer arithmetic, never by RNG or floating-point
  * transcendentals, so identical inputs produce bit-identical outputs on
  * any partitioning and the same expression is plain ANSI SQL for the
  * DuckDB oracle.
  */
object Corpus {

  /** Deterministic split assignment (train/val/test/...) by content hash.
    *
    * `fractions` lists (label, fraction) in priority order; fractions must
    * sum to 1. A row's md5-hex prefix is compared against the cumulative
    * thresholds, so the assignment is a pure column expression evaluated
    * inside the scan — zero shuffle, stable under repartitioning, and a
    * given key always lands in the same split even across corpus versions
    * (the property that keeps val contamination out of train when the
    * corpus grows). Hex thresholds come from [[splitThresholds]] so oracle
    * SQL can embed the identical literals. */
  def splitAssign(key: Column, fractions: Seq[(String, Double)]): Column = {
    val thr = splitThresholds(fractions)
    val h = substring(md5(key.cast("string")), 1, 8)
    thr.init.foldRight(lit(thr.last._1): Column) {
      case ((name, t), els) => when(h < lit(t), lit(name)).otherwise(els)
    }
  }

  /** Cumulative 8-hex-digit thresholds for [[splitAssign]] — exposed so
    * callers (and oracle SQL) can reproduce the exact cut points. */
  def splitThresholds(fractions: Seq[(String, Double)]): Seq[(String, String)] = {
    require(fractions.nonEmpty, "need at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    fractions.map(_._1).zip(cum.map { c =>
      f"${math.min(math.round(c * 0xffffffffL), 0xffffffffL)}%08x"
    })
  }

  /** Concat-and-split sequence packing (the GPT-style training layout):
    * documents are laid out in a deterministic pseudo-random order and the
    * concatenation is sliced into fixed-`budget` windows. Returns one row
    * per document with its placement:
    *
    *   (id, shard, start, seq_first, seq_last, offset)
    *
    * where `start` is the document's byte/token offset inside its shard's
    * concatenation, `seq_first`/`seq_last` the first/last window it
    * occupies (a document longer than the remaining window capacity spans
    * windows — that is the point of concat-split packing) and `offset` its
    * position inside `seq_first`.
    *
    * Scale design: a single global running sum would be one giant window
    * partition, so the corpus is first sharded by the leading md5 hex
    * nibble of the id (16 independent shards — at 100 TB raise shards by
    * widening the prefix and pack each shard independently; training
    * shards are independent files anyway). Within a shard the order is
    * (md5 hex, id): content-deterministic shuffle with a unique
    * tie-break. The only wide operation is the per-shard running sum.
    *
    * `lenCol` is whatever length accounting the caller wants to pack by
    * (token counts, byte counts, `n_chars`). Zero-length rows occupy no
    * space: they get `seq_last = seq_first` at their start position. */
  def packSequences(df: DataFrame, idCol: String, lenCol: String,
                    budget: Long, shardPrefix: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val h = md5(col(idCol).cast("string"))
    val w = Window.partitionBy("shard").orderBy(col("h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("id"), col(lenCol).cast("long").as("len"),
        substring(h, 1, shardPrefix).as("shard"), h.as("h"))
      .withColumn("endpos", sum(col("len")).over(w))
      .select(col("id"), col("shard"),
        (col("endpos") - col("len")).as("start"), col("len"), col("endpos"))
      .select(col("id"), col("shard"), col("start"),
        floor(col("start") / budget).cast("long").as("seq_first"),
        when(col("len") === 0, floor(col("start") / budget))
          .otherwise(floor((col("endpos") - 1) / budget))
          .cast("long").as("seq_last"),
        pmod(col("start"), lit(budget)).as("offset"))
  }

  /** Global token vocabulary: the `topN` most frequent tokens of the
    * [[TextAnalysis.normalizeText]]-normalized corpus with an exact
    * (freq desc, token) total order, so the LIMIT boundary is
    * deterministic. One shuffle (the token groupBy) with map-side partial
    * aggregation; the top-N is a TakeOrdered over the aggregated
    * vocabulary, never over token instances. */
  def vocabulary(df: DataFrame, textCol: String, topN: Int = 1000): DataFrame =
    df.select(explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
        .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(topN)

  /** Vocabulary coverage curve — the tokenizer-budget planning table:
    * for each candidate vocab size `k`, the fraction of ALL corpus token
    * occurrences covered by the top-`k` tokens (ranked `freq desc,
    * token` — the [[vocabulary]] order, deterministic at every cut).
    * OOV rate at budget k is `1 − coverage`.
    *
    * Scale shape: the token-count exchange is the one unavoidable cost
    * (and the corpus total rides it as a ReusedExchange — no second
    * tokenize); ranking and the running sum then touch ONLY the
    * TakeOrdered top-`max(ks)` set, a bounded single-partition window in
    * the quantile-bins class — never the full vocabulary. `max(ks)` past
    * `maxK` throws with guidance instead of silently materializing a
    * vocabulary-sized sort on one task.
    *
    * Output: (k, covered_tokens, total_tokens, coverage) — the integer
    * pair is exact; coverage is their round-6 quotient (the
    * line-stats/dup-frac idiom). `k` larger than the vocabulary
    * saturates at full coverage; an empty corpus yields coverage 0. */
  def vocabCoverage(df: DataFrame, textCol: String,
                    ks: Seq[Int] = Seq(100, 1000, 10000),
                    maxK: Int = 1000000): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0),
      s"ks must be positive vocab budgets, got $ks")
    require(ks.max <= maxK,
      s"max budget ${ks.max} exceeds maxK=$maxK: the top-k set is " +
        "collected into one bounded window partition — raise maxK only " +
        "with executor memory to hold it")
    val freq = df.select(
        explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
          .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
    // the corpus total derives from the SAME token aggregate (one
    // conditional-free sum — ReusedExchange with the top-k branch)
    val total = freq.agg(coalesce(sum("freq"), lit(0L)).as("total"))
    val w = Window.orderBy(col("freq").desc, col("token"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = freq
      .orderBy(col("freq").desc, col("token")).limit(ks.max)
      .select(col("freq"),
        row_number().over(Window.orderBy(col("freq").desc, col("token")))
          .as("rank"),
        sum("freq").over(w).as("cum"))
    // one row per budget k: covered = cum at the last rank ≤ k
    val budgets = total.select(col("total"),
      explode(array(ks.distinct.sorted.map(lit(_)): _*)).as("k"))
    budgets.join(ranked, col("rank") <= col("k"), "left")
      .groupBy("k", "total")
      .agg(coalesce(max("cum"), lit(0L)).as("covered_tokens"))
      .select(col("k"), col("covered_tokens"),
        col("total").as("total_tokens"),
        when(col("total") === 0, lit(0.0))
          .otherwise(round(col("covered_tokens").cast("double") /
            col("total"), 6)).as("coverage"))
  }

  /** Heaps-law vocabulary growth curve: cumulative (docs, tokens,
    * distinct types) at each ingest CHECKPOINT — "how fast is the
    * vocabulary still growing as the corpus grows", the diagnostic
    * behind tokenizer-vocab sizing and dedup sanity (a corpus whose
    * type count keeps growing linearly is full of noise/ids; a
    * near-saturated curve says the vocab budget is safe). Checkpoints
    * are doc-id thresholds (ingest order), so the curve is exactly
    * reproducible and incremental-friendly: appending docs with larger
    * ids never changes earlier points.
    *
    * Shape: ONE tokenizing scan; types collapse to (token,
    * first_doc_id) on the token exchange and are then bucketed to a
    * CHECKPOINT INDEX scan-side (`size(filter(...))` over the ≤
    * |checkpoints| literal array), so the rollup + cumulative window
    * run over ≤ |checkpoints| rows — never vocab × checkpoints. Doc
    * and token totals ride the same bucketing off per-doc counts. All
    * exact integers. */
  def vocabGrowthCurve(df: DataFrame, idCol: String, textCol: String,
                       checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints == checkpoints.sorted &&
      checkpoints.distinct.size == checkpoints.size,
      s"checkpoints must be distinct and ascending, got $checkpoints")
    val cks = array(checkpoints.map(lit(_)): _*)
    // bucket = number of checkpoints strictly BELOW the id: idx i means
    // "first visible at checkpoint cks(i)"; ids past the last
    // checkpoint land in bucket |cks| and are excluded from the curve
    def bucket(c: Column): Column = size(filter(cks, ck => ck < c))
    // null ids have no position in ingest order — excluded up front
    // (countDistinct-style), not silently bucketed at checkpoint 0
    val rows = df.filter(col(idCol).isNotNull)
    val toks = rows.select(col(idCol).as("__id"),
        explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
          .as("token"))
      .filter(length(col("token")) > 0)
    val typeBuckets = toks.groupBy("token")
      .agg(min("__id").as("__first"))
      .groupBy(bucket(col("__first")).as("__b"))
      .agg(count(lit(1)).as("new_types"))
    val docTok = rows.select(bucket(col(idCol)).as("__b"),
        coalesce(size(filter(
          split(TextAnalysis.normalizeText(col(textCol)), " "),
          t => length(t) > 0)), lit(0)).as("__nt"))
      .groupBy("__b")
      .agg(count(lit(1)).as("new_docs"), sum("__nt").as("new_tokens"))
    val base = df.sparkSession.range(checkpoints.size)
      .select(col("id").cast("int").as("__b"),
        element_at(cks, col("id").cast("int") + 1).as("checkpoint"))
    val w = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(typeBuckets, Seq("__b"), "left")
      .join(docTok, Seq("__b"), "left")
      .select(col("__b"), col("checkpoint"),
        coalesce(col("new_docs"), lit(0L)).as("nd"),
        coalesce(col("new_tokens"), lit(0L)).as("nt"),
        coalesce(col("new_types"), lit(0L)).as("ny"))
      .select(col("checkpoint"),
        sum("nd").over(w).as("n_docs"),
        sum("nt").over(w).as("n_tokens"),
        sum("ny").over(w).as("vocab"))
  }

  /** EXACT top-`topN` tokens without ever shuffling the token domain:
    * the classic two-pass heavy-hitter plan over a
    * [[graft.expressions.MisraGries]] sketch.
    *
    * Pass 1 (one corpus scan): a single global MG aggregate whose
    * exchange carries one ≤ `capacity`-entry sketch per map-side
    * partial — compare [[vocabulary]], whose `groupBy(token)` exchange
    * carries the FULL token domain (at 100 TB, billions of distinct
    * tokens through one shuffle just to keep 20). The sketch plus the
    * exact token total ride the same aggregate, and both are collected
    * to the driver — a bounded ≤ capacity-entry collect, same class as
    * the BPE merge table and the IVF centroid set.
    *
    * Pass 2 (second corpus scan): tokens are filtered against the
    * candidate set INSIDE the scan (an `isin` literal set — no join, no
    * broadcast machinery) and only candidates are counted, so the pass-2
    * exchange carries ≤ capacity groups.
    *
    * Exact-or-loud: MG guarantees every token with true frequency
    * > N/(capacity+1) is a candidate. The result is therefore the exact
    * top-N iff the N-th exact frequency clears that threshold, and the
    * returned plan CHECKS it — `freq·(capacity+1) > N_total` in pure
    * integer math over the ≤ topN output rows (plus the ambiguous
    * short-result case when a full sketch still yielded < topN
    * candidates) — and `raise_error`s with "raise capacity" guidance
    * instead of silently returning a near-miss. The check rides the
    * output `freq` column itself so column pruning cannot drop it.
    *
    * Output matches [[vocabulary]]: (token, freq) in (freq desc, token)
    * order, deterministic at the LIMIT boundary. */
  def heavyHitters(df: DataFrame, textCol: String, topN: Int = 20,
                   capacity: Int = 4096, ngram: Int = 1): DataFrame = {
    require(topN > 0, s"topN=$topN must be positive")
    require(capacity >= topN,
      s"capacity=$capacity must be at least topN=$topN")
    require(ngram >= 1, s"ngram=$ngram must be >= 1")
    // ngram > 1 = phrase mining: the identical 2-pass plan over word
    // n-grams of the normalized text (the n-gram domain is far larger
    // than the token domain, which is exactly when the bounded sketch
    // pays off most vs a full-domain groupBy)
    val tok = df.select(
        explode(graft.expressions.GraftExpressions.wordNGrams(
          TextAnalysis.normalizeText(col(textCol)), ngram)).as("token"))
    // pass 1: bounded sketch + exact total in ONE aggregate (eager,
    // bounded driver collect — ≤ capacity entries)
    val p1 = tok.agg(
        graft.expressions.GraftExpressions
          .misraGries(col("token"), capacity).as("sk"),
        count(lit(1)).as("n_total"))
      .select(col("sk.item").as("cands"), col("n_total"))
      .head()
    val cands = p1.getSeq[String](0)
    val nTotal = p1.getLong(1)
    // a zero-candidate sketch over a non-empty corpus is ALWAYS a loss
    // (adversarial arrival order can evict every counter) — and it would
    // return zero rows, which carry no in-plan raise_error to fire; so
    // this case must refuse eagerly at the driver
    require(cands.nonEmpty || nTotal == 0L,
      s"heavyHitters: sketch retained no candidates for a non-empty " +
        s"corpus (N=$nTotal) — raise capacity=$capacity")
    if (cands.isEmpty) { // empty corpus: a typed empty (token, freq) frame
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("token", StringType),
          StructField("freq", LongType))))
    }
    // pass 2: exact counts of candidates only; the IN-set literal is
    // evaluated inside the scan, so the exchange carries ≤ capacity
    // groups. The aggregate is consumed twice — the top-N and the
    // no-loss total — from the same plan instance, so AQE stage reuse
    // computes it once (the corpus_drift ReusedExchange discipline).
    val candFreq = tok
      .filter(col("token").isin(cands: _*))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val candTotal = candFreq.agg(sum(col("freq")).as("cand_sum"))
    val exact = candFreq
      .orderBy(col("freq").desc, col("token")).limit(topN)
    // exactness guard over the ≤ topN output rows (bounded unpartitioned
    // window by construction); violation throws rather than returning a
    // silently-approximate top-N. Two cases:
    //  - full top-N: sound iff the boundary frequency strictly clears
    //    N/(capacity+1) (any non-candidate is at or below that bound and
    //    cannot belong above the boundary) — the product runs in
    //    DECIMAL(38,0) because a Long minf·(capacity+1) wraps past
    //    ~2.25e15·4096 and would certify garbage at real scale;
    //  - SHORT result (< topN rows): sound ONLY when nothing was ever
    //    evicted, which is witnessed by the candidates' exact counts
    //    summing to the corpus total (counter mass lost to MG eviction
    //    or merge subtraction makes this strictly smaller). A "sketch
    //    still full" test is NOT a witness — eviction and partial-merge
    //    subtraction routinely shrink the sketch below capacity.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.orderBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val minf = min(col("freq")).over(w)
    val nOut = count(lit(1)).over(w)
    val thresholdMiss =
      (nOut === topN &&
        minf.cast(dec) * lit(capacity + 1).cast(dec) <=
          lit(nTotal).cast(dec)) ||
        (nOut < topN && coalesce(col("cand_sum"), lit(0L)) =!= nTotal)
    exact.crossJoin(broadcast(candTotal)).select(
      col("token"),
      when(thresholdMiss, raise_error(concat(
          lit(s"heavyHitters: top-$topN not certifiable at capacity=" +
            s"$capacity (N=$nTotal, boundary freq "),
          minf.cast("string"),
          lit(s" ≤ N/${capacity + 1}) — raise capacity")))
          .cast("long"))
        .otherwise(col("freq")).as("freq"))
      .orderBy(col("freq").desc, col("token"))
  }

  /** The pass-1 sketch of [[heavyHitters]] AS DATA: one row per retained
    * counter `(token, count_lb, n_part)` (`n_part` = the summarized
    * token total, constant across rows) — the persistable half of an
    * INCREMENTAL corpus-stats pipeline. Summarize each day/shard/
    * snapshot once (one scan, bounded state), store the ≤ capacity-row
    * sketch, and fold new arrivals in with [[mergeHeavyHitterSketches]]
    * — no historical rescan, ever.
    *
    * Guarantee carried by the rows: every token with frequency
    * > n_part/(capacity+1) in the summarized slice is present, and
    * `count_lb` undercounts by at most that bound. */
  def heavyHittersSketch(df: DataFrame, textCol: String,
                         capacity: Int = 4096, ngram: Int = 1): DataFrame = {
    require(capacity >= 1 && ngram >= 1, s"bad capacity/ngram")
    val tok = df.select(
      explode(graft.expressions.GraftExpressions.wordNGrams(
        TextAnalysis.normalizeText(col(textCol)), ngram)).as("token"))
    // explode_OUTER: a sketch whose counters were fully evicted (or an
    // empty slice) still emits one (NULL token) row so its n_part is
    // never lost — dropping it would shrink the merge's total N and
    // falsify the presence guarantee the bound is computed against
    tok.agg(
        graft.expressions.GraftExpressions
          .misraGries(col("token"), capacity).as("sk"),
        count(lit(1)).as("n_part"))
      .select(explode_outer(col("sk")).as("e"), col("n_part"))
      .select(col("e.item").as("token"), col("e.count_lb").as("count_lb"),
        col("n_part"))
  }

  /** Merge [[heavyHittersSketch]] outputs RELATIONALLY with the exact
    * Agarwal et al. 2013 mergeable-summaries rule — the same math
    * [[graft.expressions.MisraGries.merge]] runs inside the aggregate,
    * expressed over DataFrames so it composes with persisted sketches:
    * sum counters per token across sketches; if more than `capacity`
    * tokens survive, subtract the (capacity+1)-th largest total from
    * every counter and keep the strictly-positive remainder. The result
    * is a valid MG summary of the CONCATENATED corpora: every token with
    * combined frequency > N/(capacity+1) (N = Σ n_part) is present, with
    * the same lower-bound semantics.
    *
    * Scale shape: the input is s·capacity rows for s sketches — already
    * tiny relative to any corpus — so the one token groupBy and the
    * single-partition rank window over ≤ s·capacity aggregated counters
    * are bounded by construction (the [[lengthQuantiles]] discipline,
    * enforced domain). `n_part` totals are summed from one
    * representative row per sketch via `sketchIdCol`, the column that
    * distinguishes the source sketches (tag each with a literal before
    * unioning). */
  def mergeHeavyHitterSketches(sketches: DataFrame, capacity: Int,
                               sketchIdCol: String = "sketch_id"): DataFrame = {
    require(capacity >= 1, s"capacity=$capacity must be positive")
    // NULL-token rows are the empty-sketch placeholders: they carry
    // n_part into the totals below but are not counters
    val summed = sketches.filter(col("token").isNotNull)
      .groupBy("token")
      .agg(sum(col("count_lb")).as("count_lb"))
    // N = Σ n_part over DISTINCT sketches (n_part is constant per sketch)
    val totals = sketches.groupBy(col(sketchIdCol))
      .agg(first(col("n_part")).as("np"))
      .agg(sum(col("np")).as("n_part"))
    // the (capacity+1)-th largest summed counter (0 when ≤ capacity
    // survive): a rank window over the bounded counter set
    val w = Window.orderBy(col("count_lb").desc, col("token"))
    val ranked = summed.withColumn("__rk", row_number().over(w))
    val sub = ranked.agg(
      max(when(col("__rk") === capacity + 1, col("count_lb")))
        .as("__sub"))
    ranked.crossJoin(broadcast(sub)).crossJoin(broadcast(totals))
      .select(col("token"),
        (col("count_lb") - coalesce(col("__sub"), lit(0L))).as("count_lb"),
        col("n_part"))
      .filter(col("count_lb") > 0)
  }

  /** Per-slice HLL distinct-token sketches — the DISTINCT-COUNT sibling
    * of [[heavyHittersSketch]]: one bounded binary sketch per corpus
    * slice (day, shard, source), persistable and mergeable with
    * [[mergeDistinctSketches]] so vocabulary growth tracks
    * incrementally with no historical rescan. Built on Spark's native
    * Datasketches HLL aggregate (`hll_sketch_agg`) — codegen'd, ≤ 2^lgK
    * 4-bit registers per sketch (~16 KB at the default lgK 14) at ANY
    * corpus size.
    *
    * Accuracy contract: the Datasketches HLL is EXACT while in its
    * LIST/SET promotion stages (it stores hashes exactly until the set
    * approaches 2^lgK) and ~0.8%-σ approximate beyond — unlike the
    * exact-or-loud Misra–Gries family, approximation past the
    * promotion point is the operator's DESIGN (bounded-memory distinct
    * counting); the oracle pins the exact regime. 64-bit hash
    * collisions are the only exactness caveat below promotion
    * (~n²/2⁶⁴ — negligible).
    *
    * Output: (slice, sketch binary, n_tokens) — n_tokens is the slice's
    * total occurrence count, the metadata that pairs with the distinct
    * estimate for type/token-ratio tracking. Empty slices don't exist
    * relationally (no tokens → no group), unlike the MG placeholder:
    * a distinct count has nothing to lose with the row. */
  def distinctSketch(df: DataFrame, textCol: String, sliceCol: Column,
                     lgK: Int = 14): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK=$lgK outside Datasketches' [4, 21]")
    df.select(sliceCol.as("slice"),
        explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
          .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("slice")
      .agg(hll_sketch_agg(col("token"), lgK).as("sketch"),
        count(lit(1)).as("n_tokens"))
  }

  /** Merge [[distinctSketch]] frames (any union of slices, any number of
    * increments) into the corpus-wide distinct estimate: a single
    * `hll_union_agg` over the bounded sketch binaries — s·16 KB of
    * input at ANY corpus size — then the estimate. Output: one row
    * (distinct_tokens, n_tokens). */
  def mergeDistinctSketches(sketches: DataFrame): DataFrame =
    sketches.agg(hll_union_agg(col("sketch")).as("merged"),
        coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
      .select(hll_sketch_estimate(col("merged")).as("distinct_tokens"),
        col("n_tokens"))

  /** Per-slice KLL quantile sketches over a numeric measure (document
    * length, quality score, …) — the QUANTILE member of the mergeable
    * trio ([[heavyHittersSketch]] frequencies, [[distinctSketch]]
    * cardinalities, this distributions): one bounded binary per slice,
    * persistable, merged by [[mergeQuantileSketches]] so distribution
    * tracking is incremental with no historical rescan.
    *
    * Accuracy: exact while a slice's count stays ≤ k (no compaction —
    * the oracle's regime), ~1.65/√k normalized-rank error beyond.
    * Output: (slice, sketch binary, n_rows). Null measures are skipped
    * (the SQL aggregate convention); a slice of only-null measures
    * still emits its row with an empty sketch. */
  def quantileSketch(df: DataFrame, valueCol: String, sliceCol: Column,
                     k: Int = 1024): DataFrame =
    df.groupBy(sliceCol.as("slice"))
      .agg(graft.expressions.GraftExpressions
        .kllSketch(col(valueCol), k).as("sketch"),
        count(col(valueCol)).as("n_rows"))

  /** Merge [[quantileSketch]] frames and read the requested quantiles:
    * one row per rank (q, value, n_rows) — INCLUSIVE semantics (the
    * smallest value whose cumulative weight ≥ q·N). The merge input is
    * s bounded binaries at ANY corpus size. An all-empty merge yields
    * no rows (quantiles of nothing are undefined). */
  def mergeQuantileSketches(sketches: DataFrame,
                            qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9),
                            k: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"ranks must lie in [0, 1], got $qs")
    val g = graft.expressions.GraftExpressions
    val merged = sketches.agg(
      g.kllMerge(col("sketch"), k).as("merged"),
      coalesce(sum("n_rows"), lit(0L)).as("n_rows"))
    merged.select(posexplode(g.kllQuantiles(col("merged"), qs))
        .as(Seq("qi", "value")), col("n_rows"))
      .select(element_at(
          array(qs.map(lit(_)): _*), col("qi") + 1).as("q"),
        col("value"), col("n_rows"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): rank every
    * document by its LM rarity score and split the corpus into
    * `nBuckets` head/middle/tail slices — the standard recipe for
    * keeping the most-fluent web text and down-weighting the tail. The
    * score is [[unigramSurprisal]]'s `mean_info` (integer-rational,
    * bit-stable across engines; CCNet's 5-gram KenLM perplexity is the
    * same surface read off a different LM). Buckets are VALUE-threshold
    * assigned: threshold `t_i` is the smallest score whose cumulative
    * doc count satisfies `cum·nBuckets ≥ i·N` (integer tie math — the
    * INCLUSIVE-quantile definition), and a document lands in bucket
    * `#{i : score > t_i}` — so ties always share a bucket and the
    * assignment is reproducible from the thresholds alone (CCNet ships
    * its cutoffs the same way).
    *
    * Two threshold modes, the [[graft.core.Stats.tableProfile]] split:
    * `exact = true` (the oracle's mode) pays one single-partition
    * cumulative pass over the AGGREGATED distinct-score domain — exact,
    * fine to ~10⁸ docs; `exact = false` reads the same INCLUSIVE
    * quantiles from a KLL sketch (bounded mergeable state, ~1.65/√k
    * rank error — the 100 TB path; boundary docs within that rank error
    * of a cutoff may shift one bucket, head/tail membership elsewhere
    * is unaffected). Assignment is scan-side against the broadcast
    * (nBuckets−1)-row threshold table in both modes — no global sort of
    * documents, ever. Output: (doc_id, mean_info, bucket) with bucket
    * 0 = head (most predictable) … nBuckets−1 = tail. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        nBuckets: Int = 3, exact: Boolean = true,
                        sketchK: Int = 1024): DataFrame = {
    require(nBuckets >= 2, s"nBuckets=$nBuckets needs at least 2")
    val sc = unigramSurprisal(df, idCol, textCol)
      .select("doc_id", "mean_info")
    val th: DataFrame =
      if (exact) {
        val n = sc.agg(count(lit(1)).as("n"))
        val hist = sc.groupBy("mean_info").agg(count(lit(1)).as("c"))
        // the only unpartitioned window in the operator — over the
        // aggregated score DOMAIN, not documents
        val cum = hist.withColumn("cum",
          sum("c").over(Window.orderBy("mean_info")))
        cum.crossJoin(broadcast(n))
          .select(col("mean_info"), col("cum"), col("n"),
            explode(sequence(lit(1), lit(nBuckets - 1))).as("i"))
          .filter(col("cum") * nBuckets >= col("i") * col("n"))
          .groupBy("i").agg(min("mean_info").as("t"))
      } else {
        val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
        sc.agg(graft.expressions.GraftExpressions
            .kllSketch(col("mean_info"), sketchK).as("sk"))
          .select(posexplode(graft.expressions.GraftExpressions
            .kllQuantiles(col("sk"), qs)).as(Seq("qi", "t")))
          .select((col("qi") + 1).as("i"), col("t"))
      }
    sc.join(broadcast(th), col("mean_info") > col("t"), "left")
      .groupBy("doc_id", "mean_info")
      .agg(count(col("t")).as("bucket"))
  }

  /** Per-slice Count–Min frequency sketches — the POINT-FREQUENCY member
    * of the mergeable family ([[heavyHittersSketch]] top items,
    * [[distinctSketch]] cardinalities, [[quantileSketch]] distributions,
    * this anyone's-count): one depth×width counter matrix per slice
    * (day, shard, source), persistable and mergeable with
    * [[mergeFrequencySketches]] so per-token frequency features stay
    * queryable incrementally — for ANY token, not just the retained
    * heavy tail MG keeps — without ever shuffling the token domain.
    *
    * Estimates OVERcount only: est ≥ true, est ≤ true + εN with
    * ε ≈ e/width (see [[graft.expressions.CountMinAgg]] — md5-lane
    * hashing, externally reproducible cell-for-cell). Output:
    * (slice, sketch binary, n_tokens). */
  def frequencySketch(df: DataFrame, textCol: String, sliceCol: Column,
                      depth: Int = 4, width: Int = 8192): DataFrame =
    df.select(sliceCol.as("slice"),
        explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
          .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("slice")
      .agg(graft.expressions.GraftExpressions
          .countMinSketch(col("token"), depth, width).as("sketch"),
        count(lit(1)).as("n_tokens"))

  /** Merge [[frequencySketch]] frames cellwise (one bounded binary per
    * input at ANY corpus size; geometry mismatch throws) → one row
    * (sketch, n_tokens). */
  def mergeFrequencySketches(sketches: DataFrame): DataFrame =
    sketches.agg(graft.expressions.GraftExpressions
        .countMinUnion(col("sketch")).as("sketch"),
      coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))

  /** Serve point-frequency estimates for a probe frame against a merged
    * sketch: the one-row sketch broadcasts and the probes stay a
    * codegen'd scan — zero shuffle, any probe-set size. Output: probes +
    * `est` (≥ true count, ≤ true + εN). */
  def estimateFrequencies(merged: DataFrame, probes: DataFrame,
                          tokenCol: String = "token"): DataFrame =
    probes.crossJoin(broadcast(merged.select("sketch")))
      .withColumn("est", graft.expressions.GraftExpressions
        .countMinEstimate(col("sketch"), col(tokenCol)))
      .drop("sketch")

  /** Distribution drift between two sub-corpora: the `topN` tokens whose
    * unigram frequency differs most between group `a` and group `b` of
    * `groupCol` — the data-mixing diagnostic ("what words make the web
    * slice differ from the books slice") that pairs with
    * [[importanceWeights]]' DSIR machinery.
    *
    * Ranking is by the CROSS-PRODUCT difference |freq_a·n_b − freq_b·n_a|
    * — exactly |p_a − p_b| scaled by the integer n_a·n_b — computed in
    * DECIMAL(38,0), so the order is exact at any corpus size (two 2.5e13-
    * token corpora peak at ~6e26, far under 38 digits; a float
    * p_a − p_b would tie-break on ulps and break cross-engine parity).
    * The decimal rides only the ORDER BY and is not output, so the
    * result stays (token, freq_a, freq_b) bigints.
    *
    * Scale shape: one corpus scan; the token groupBy is a single
    * partial-agg exchange carrying the (shared) token domain with both
    * group counts as conditional sums — not one exchange per group; the
    * totals are a second tiny aggregate OVER the freq table (vocabulary-
    * sized, not corpus-sized) broadcast back as a scalar row; the top-N
    * is a TakeOrdered over the freq table, never a global sort. */
  def corpusDrift(df: DataFrame, textCol: String, groupCol: String,
                  a: String, b: String, topN: Int = 20): DataFrame = {
    require(a != b, s"corpusDrift: groups must differ, got '$a' twice")
    val tok = df.filter(col(groupCol).isin(a, b))
      .select(col(groupCol).as("grp"),
        explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
          .as("token"))
      .filter(length(col("token")) > 0)
    val freqs = tok.groupBy("token").agg(
      sum(when(col("grp") === a, 1L).otherwise(0L)).as("freq_a"),
      sum(when(col("grp") === b, 1L).otherwise(0L)).as("freq_b"))
    val totals = freqs.agg(sum(col("freq_a")).as("n_a"),
      sum(col("freq_b")).as("n_b"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val d = abs(col("freq_a").cast(dec) * col("n_b").cast(dec) -
      col("freq_b").cast(dec) * col("n_a").cast(dec))
    freqs.crossJoin(broadcast(totals))
      .orderBy(d.desc, col("token"))
      .limit(topN)
      .select(col("token"), col("freq_a"), col("freq_b"))
  }

  /** Distribution drift FROM PERSISTED SKETCHES — the incremental form
    * of [[corpusDrift]] closing the sketch-family loop: compare two
    * [[heavyHittersSketch]]/[[mergeHeavyHitterSketches]] frames (one
    * per corpus slice, era, or source) and rank the tokens whose
    * frequency shifted most, with NO rescan of either corpus. Same
    * exact DECIMAL(38,0) cross-product ranking
    * |count_a·n_b − count_b·n_a| as the scan-based form; totals are
    * each sketch's own `n_part` (the true summarized token total, which
    * eviction never touches), so the normalization is exact in every
    * regime. In the MG exact regime (capacity ≥ vocabulary) the result
    * EQUALS [[corpusDrift]] on the underlying corpora — the oracle's
    * check; past it, the ranking covers the retained counters with
    * their lower-bound semantics (heavy movers are precisely what MG
    * guarantees to retain). NULL-token placeholder rows contribute
    * their n_part and nothing else.
    *
    * Scale shape: both inputs are ≤ capacity-row frames at ANY corpus
    * size — one full-outer token join, two 1-row total aggregates, one
    * bounded TakeOrdered. */
  def driftFromSketches(a: DataFrame, b: DataFrame,
                        topN: Int = 20): DataFrame = {
    require(topN >= 1, s"topN=$topN must be positive")
    val fa = a.filter(col("token").isNotNull)
      .select(col("token"), col("count_lb").as("freq_a"))
    val fb = b.filter(col("token").isNotNull)
      .select(col("token"), col("count_lb").as("freq_b"))
    val na = a.agg(max("n_part").as("n_a"))
    val nb = b.agg(max("n_part").as("n_b"))
    val freqs = fa.join(fb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("freq_a"), lit(0L)).as("freq_a"),
        coalesce(col("freq_b"), lit(0L)).as("freq_b"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val d = abs(col("freq_a").cast(dec) * col("n_b").cast(dec) -
      col("freq_b").cast(dec) * col("n_a").cast(dec))
    freqs.crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .orderBy(d.desc, col("token"))
      .limit(topN)
      .select(col("token"), col("freq_a"), col("freq_b"))
  }

  /** Corpus-level n-gram diversity (the "distinct-n" generation/corpus
    * diversity metric): for each n in 1..`maxN`, the total and distinct
    * n-gram counts over the whole corpus. A corpus of templated
    * near-duplicates shows a collapsing distinct/total ratio as n grows;
    * fresh text keeps it high — the cheap corpus-health check run before
    * expensive pairwise dedup.
    *
    * Scale shape: ONE corpus scan — all n orders explode from the same
    * row as (n, gram) pairs (a concat of the per-n
    * [[graft.expressions.GraftExpressions.wordNGrams]] arrays, each
    * tagged with its n) — then a single two-level exact count-distinct:
    * partial agg on (n, gram) collapses duplicates map-side, the
    * exchange carries the distinct n-gram domain once (the same price
    * [[vocabulary]] pays — exact distinct cannot shuffle less), and the
    * ≤ maxN result rows fall out of the final regroup on n, with the
    * totals as a sum over the per-gram counts — no second scan. */
  def ngramDiversity(df: DataFrame, textCol: String,
                     maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 8,
      s"ngramDiversity: maxN=$maxN outside [1, 8]")
    val norm = TextAnalysis.normalizeText(col(textCol))
    val tagged = (1 to maxN).map { n =>
      transform(
        graft.expressions.GraftExpressions.wordNGrams(norm, n),
        g => struct(lit(n).as("n"), g.as("gram")))
    }
    df.select(explode(concat(tagged: _*)).as("ng"))
      .select(col("ng.n").as("n"), col("ng.gram").as("gram"))
      .groupBy("n", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("n").agg(
        sum(col("cnt")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .orderBy("n")
  }

  /** Unigram-LM rarity per document — the CCNet-style quality signal
    * (CCNet ranks documents by language-model perplexity; the degenerate
    * but shuffle-cheap LM is the corpus's own unigram distribution).
    * Each token's information content is the INTEGER inverse-probability
    * surrogate `n_total DIV freq(token)` — the same log-free discipline
    * as [[tfidfKeywords]]'s `N+1−df` idf (a float `log(p)` differs
    * across engines at the ulp and would break hash-exact oracles, and a
    * binary-digit log2 is too coarse to discriminate). A document of
    * rare tokens scores high, boilerplate of corpus-dominant tokens
    * scores low; `mean_info` = sum_info / n_tokens is one exact integer
    * division in IEEE double (bit-stable across engines).
    *
    * Scale shape: token frequencies are one partial-agg exchange (the
    * [[vocabulary]] shuffle, unlimited); `n_total` is a parallel scalar
    * aggregate OVER the freq table, broadcast back — never a single-
    * task window (the vocabulary is unbounded at corpus scale, unlike
    * [[lengthQuantiles]]' length domain). The explicit
    * `isNotNull(token)` mirrors the q15 canonical-filter discipline:
    * the token join pushes that filter into its freq subtree only,
    * which would break canonical plan equality between the join's and
    * the total's freq subplans and force a SECOND tokenize scan of the
    * corpus; declaring it keeps the subtrees identical so AQE stage
    * reuse computes freq once (final-adaptive-plan verified). The
    * token→freq join is token-keyed with no forced broadcast (a 100 TB
    * vocabulary can exceed broadcast limits — AQE broadcasts when it
    * fits); the per-doc rollup is one more keyed exchange. Documents
    * with zero normalized tokens carry no signal and are absent from
    * the output. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
        explode(split(TextAnalysis.normalizeText(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0 && col("token").isNotNull)
    val freq = tok.groupBy("token").agg(count(lit(1)).as("freq"))
    val total = freq.agg(sum("freq").as("n_total"))
    tok.join(freq, "token")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), expr("n_total DIV freq").as("info"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("info").as("sum_info"))
      .withColumn("mean_info", col("sum_info").cast("double") / col("n_tokens"))
  }

  /** CCNet-style CONDITIONAL bigram surprisal — the 2-gram extension of
    * [[unigramSurprisal]]'s log-free integer-rational discipline. Per
    * adjacent normalized-token pair, `info = c(prev,·) DIV c(prev,cur)`
    * — the integer inverse of the conditional probability p(cur | prev),
    * with the context count taken over bigram STARTS so the distribution
    * conditions exactly on "prev has a next token". Per doc:
    * (n_bigrams, sum_info, mean_info). Docs with fewer than 2 normalized
    * tokens contribute no bigrams and drop from the output, matching the
    * unigram operator's empty-doc discipline. Rare continuations score
    * high (the filter signal CCNet reads from its 5-gram KenLM — same
    * engine surface, engine-exact arithmetic instead of logs).
    *
    * 100 TB shape: window generation is the compiled
    * [[graft.expressions.GraftExpressions.WordNGrams]] kernel inside the
    * scan; the context count is DERIVED from the bigram count —
    * contexts are counted over bigram starts, so
    * `c(prev,·) = Σ_cur c(prev,cur)` is arithmetic identity, and
    * `pfreq` rolls up the (already aggregated, vocabulary-sized)
    * `bfreq` table instead of re-exploding the corpus. The two `bfreq`
    * subtrees (join branch and pfreq rollup) are canonically identical,
    * so AQE stage reuse computes the bigram-count exchange once
    * (ReusedExchange, executed-plan asserted in PlanShapeSpec): exactly
    * TWO corpus scans — the doc-keyed explode and the count subtree —
    * the same floor as the unigram operator's join-back shape. */
  /** Top-`k` bigram collocations ranked by PMI lift — the corpus-analysis
    * standard for "which word pairs co-occur far above chance" (Church &
    * Hanks 1990), used to mine multiword expressions / boilerplate
    * phrases worth tokenizing as units. Lift is kept cross-engine
    * deterministic as parts-per-million of the independence ratio,
    * `round(1e6 · c(x,y) · N / (c(x,·) · c(·,y)))` — IEEE doubles in one
    * fixed association order, then one correctly-rounded `round`, so the
    * oracle divides the same integers the same way (a log-PMI would rank
    * identically: log is monotone).
    *
    * 100 TB shape: ONE corpus scan. Both unigram marginals and the total
    * are DERIVED from the aggregated, vocabulary-sized bigram-count
    * table (position sums — arithmetic identity, the
    * [[bigramSurprisal]] discipline), never by re-exploding the corpus;
    * the three derived tables join back vocabulary-to-vocabulary and the
    * final top-k is a single ordered limit. */
  def collocations(df: DataFrame, idCol: String, textCol: String,
                   minCount: Int = 5, k: Int = 20): DataFrame = {
    require(minCount >= 1 && k >= 1, s"minCount=$minCount k=$k out of range")
    val bg = df.select(
      explode(graft.expressions.GraftExpressions.wordNGrams(
        TextAnalysis.normalizeText(col(textCol)), 2)).as("bigram"))
    val bfreq = bg.groupBy("bigram").agg(count(lit(1)).as("c_xy"))
    val xfreq = bfreq
      .groupBy(substring_index(col("bigram"), " ", 1).as("__x"))
      .agg(sum("c_xy").as("c_x"))
    val yfreq = bfreq
      .groupBy(substring_index(col("bigram"), " ", -1).as("__y"))
      .agg(sum("c_xy").as("c_y"))
    val total = bfreq.agg(sum("c_xy").as("n_bigrams"))
    val scored = bfreq.filter(col("c_xy") >= minCount)
      .withColumn("__x", substring_index(col("bigram"), " ", 1))
      .withColumn("__y", substring_index(col("bigram"), " ", -1))
      .join(xfreq, "__x").join(yfreq, "__y")
      .crossJoin(broadcast(total))
      // the marginal product runs EXACT in DECIMAL(38,0) (the
      // corpusDrift discipline): a Long×Long product wraps silently past
      // 2^63 — two ~3·10⁹-count marginals, i.e. exactly the corpus sizes
      // this module targets — corrupting the ranking; the exact integer
      // is then converted to double ONCE (correctly rounded, so the
      // oracle's HUGEINT product divides identically)
      .withColumn("lift_ppm",
        round(lit(1000000.0) * col("c_xy") * col("n_bigrams") /
          (col("c_x").cast("decimal(38,0)") *
            col("c_y").cast("decimal(38,0)")).cast("double")).cast("long"))
    // distributed top-k first (TakeOrderedAndProject — no global-window
    // single-partition sort of the whole scored vocabulary), then rank
    // the k survivors; the final window runs over k rows by construction
    scored
      .orderBy(col("lift_ppm").desc, col("bigram").asc).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("lift_ppm").desc, col("bigram").asc)))
      .select("rk", "bigram", "c_xy", "lift_ppm")
  }

  /** Temperature-flattened corpus mixing at T = 0.5 — the multilingual /
    * multi-source rebalancing standard (mT5: sample stratum s with
    * probability ∝ n_s^T): every stratum keeps the hash-deterministic
    * fraction `sqrt(n_min / n_s)`, so the SMALLEST stratum survives
    * whole and over-represented strata flatten toward the sqrt law.
    * Rates are DERIVED from the data (one tiny stratum-count aggregate,
    * driver-bounded by `maxStrata` with a loud failure past it — the
    * bounded-domain discipline), then applied as a pure content-hash
    * scan predicate: [[TextAnalysis.mixCorpus]]'s zero-shuffle shape
    * with computed weights. sqrt and division are IEEE-correctly-rounded,
    * and the hex threshold is floor-quantized to 32 bits, so engine and
    * SQL oracle cut identically. Rates nest across runs the way
    * [[TextAnalysis.sampleByHash]] rates do. */
  def temperatureMix(df: DataFrame, stratumCol: String, keyCol: String,
                     maxStrata: Int = 100000): DataFrame =
    temperatureMixWithReference(df, df, stratumCol, keyCol, maxStrata)

  /** [[temperatureMix]] with the stratum counts taken from a separate
    * REFERENCE corpus — the batch core of
    * [[graft.streaming.Streaming.temperatureMixStream]], and the batch
    * incremental form (rebalance a crawl batch by the lake's stratum
    * proportions). Strata absent from the reference are dropped. */
  def temperatureMixWithReference(df: DataFrame, reference: DataFrame,
                                  stratumCol: String, keyCol: String,
                                  maxStrata: Int = 100000): DataFrame = {
    // null strata are dropped BEFORE the cap (the oracle's inner
    // rate-join shape — a mixture weight for "unlabeled" must be an
    // explicit caller choice), so a null group cannot consume a slot
    val counts = reference.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .limit(maxStrata + 1)
      .collect().map(r => (r.get(0), r.getLong(1)))
    require(counts.length <= maxStrata,
      s"temperatureMix: stratum domain exceeds maxStrata=$maxStrata — a " +
        "mixture over an unbounded stratum column must not collect to " +
        "the driver. Bucket the stratum column, or raise maxStrata " +
        "deliberately if the domain is genuinely this large.")
    require(counts.nonEmpty, "temperatureMix: empty input")
    val nMin = counts.map(_._2).min
    // stratum → threshold as ONE flat map literal probed per row: a
    // nested when/otherwise chain would recurse maxStrata deep through
    // analyzer/codegen (StackOverflowError far below the advertised
    // bound); element_at stays O(1)-depth at any domain size, yields
    // NULL for reference-absent strata (filter drops them), and keeps
    // the mixture a pure scan-side predicate — no join, no shuffle
    val pairs = counts.flatMap { case (stratum, n) =>
      val rate = math.sqrt(nMin.toDouble / n.toDouble)
      Seq(lit(stratum), lit(f"${math.floor(rate * 4294967295.0).toLong}%08x"))
    }
    val thresholds = map(pairs: _*)
    df.filter(substring(md5(col(keyCol)), 1, 8) <
      element_at(thresholds, col(stratumCol)))
  }

  def bigramSurprisal(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val bg = df.select(col(idCol).as("doc_id"),
        explode(graft.expressions.GraftExpressions.wordNGrams(
          TextAnalysis.normalizeText(col(textCol)), 2)).as("bigram"))
      .withColumn("prev", substring_index(col("bigram"), " ", 1))
    val bfreq = bg.groupBy("bigram").agg(count(lit(1)).as("bfreq"))
    val pfreq = bfreq
      .groupBy(substring_index(col("bigram"), " ", 1).as("prev"))
      .agg(sum("bfreq").as("pfreq"))
    bg.join(bfreq, "bigram").join(pfreq, "prev")
      .select(col("doc_id"), expr("pfreq DIV bfreq").as("info"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("info").as("sum_info"))
      .withColumn("mean_info",
        col("sum_info").cast("double") / col("n_bigrams"))
  }

  /** Weighted replication — the UP-sampling half of corpus mixing
    * ([[TextAnalysis.mixCorpus]] is the down-sampling half; a weight
    * > 1 cannot be expressed as a keep-predicate). A stratum with
    * weight w emits ⌊w⌋ copies of every row plus one more for the
    * hash-selected `w − ⌊w⌋` fraction, so expected multiplicity is
    * exactly w, decided by content hash — deterministic, partitioning-
    * independent, and plain ANSI SQL. Weights < 1 degenerate to
    * down-sampling (0 base copies + fractional keep), so one operator
    * covers the whole mixture-weight range. Copies are emitted by a
    * generator inside the scan stage (`copy` = 1..n disambiguates
    * replicas downstream); zero shuffle. */
  def replicateByWeight(df: DataFrame, stratum: Column, key: Column,
                        weights: Map[String, Double],
                        defaultWeight: Double = 1.0): DataFrame = {
    def copies(w: Double): Column = {
      require(w >= 0, s"negative weight $w")
      val base = math.floor(w).toLong
      val frac = w - base
      if (frac == 0) lit(base)
      else lit(base) + when(TextAnalysis.sampleByHash(key, frac), 1L)
        .otherwise(0L)
    }
    val n = weights.toSeq.sortBy(_._1)
      .foldLeft(copies(defaultWeight)) { case (acc, (name, w)) =>
        when(stratum === name, copies(w)).otherwise(acc)
      }
    df.withColumn("__n", n)
      .withColumn("copy",
        explode(when(col("__n") >= 1,
          sequence(lit(1L), col("__n"), lit(1L)))
          .otherwise(array().cast("array<bigint>"))))
      .drop("__n")
  }

  /** Exact-k deterministic stratified sample: per stratum, the `k`
    * documents with the smallest `md5(seed + ":" + id)` — a fixed-size
    * per-group sample (vs [[TextAnalysis.sampleByHash]]'s Bernoulli
    * FRACTION), reproducible across engines, partitionings, and runs.
    * Returns `(stratum, rk, id)` with `rk` = 1..k in hash order — the
    * standard "n examples per language/source" eval-set and
    * inspection-sample builder.
    *
    * 100 TB shape: built on the bounded
    * [[graft.expressions.TopKByKey]] aggregate — map-side combining,
    * every partition contributes ≤ k entries per stratum, the exchange
    * carries O(k·strata) rows. The equivalent
    * `row_number().over(Window.partitionBy(stratum).orderBy(hash))`
    * formulation (the SQL oracle's form) sorts every stratum in full —
    * one corpus-sized task per language at scale. The (hash, id)
    * composite key makes ranking collision-proof and deterministic. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       k: Int, seed: String = "strat"): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val hkey = struct(
      md5(concat(lit(s"$seed:"), col(idCol).cast("string"))).as("h"),
      col(idCol).as("id"))
    df.groupBy(col(stratumCol))
      .agg(graft.expressions.GraftExpressions.topKByKey(hkey, col(idCol), k)
        .as("__top"))
      .select(col(stratumCol), posexplode(col("__top")))
      .select(col(stratumCol), (col("pos") + 1).as("rk"),
        col("col.payload").as(idCol))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    * "Weighted random sampling with a reservoir"): keep the k documents
    * with the largest priority u^(1/w) — equivalently ln(u)/w — where u
    * is a content-independent uniform derived from `md5(seed + ":" + id)`
    * and w > 0 is the row's weight, so inclusion probability scales with
    * weight (the quality-weighted corpus subsample: upweight high-quality
    * or rare-domain documents without the copy blowup of
    * [[replicateByWeight]]). Deterministic: same seed, same corpus, same
    * sample, on any partitioning.
    *
    * Float discipline: u = (h13 + 1) / (2^52 + 1) from the first 13 md5
    * hex digits — exact in a double on both engines; the one
    * transcendental (ln) goes through the intrinsic
    * [[graft.expressions.GraftExpressions.platformLn]] and the priority
    * is quantized to 10 dp BEFORE ranking with an id tie-break (the BM25
    * ln discipline — no bit-portable ln exists across engines).
    * Non-positive weights THROW scan-side (E–S is undefined there; a
    * silent drop would bias the sample).
    *
    * Shape at 100 TB: priorities are scan-side expressions; the top-k is
    * a distributed `TakeOrderedAndProject` (every partition keeps ≤ k
    * candidates, the driver merges O(partitions · k)); the final rank
    * window orders the ≤ k survivors only. Returns (rank, idCol,
    * weight). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
                     seed: String = "wsamp"): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val h13 = conv(substring(
      md5(concat(lit(s"$seed:"), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("double")
    val u = (h13 + 1.0) / 4503599627370497.0 // 2^52 + 1: u ∈ (0, 1]
    val w = weight.cast("double")
    val guarded = when(w > 0, w).otherwise(raise_error(concat(
      lit("graft weightedSample: non-positive weight for id "),
      col(idCol).cast("string"),
      lit(" — Efraimidis-Spirakis needs w > 0; filter or clamp first"))))
    val pri = round(
      graft.expressions.GraftExpressions.platformLn(u) / guarded, 10)
    val top = df.select(col(idCol), w.as("weight"), pri.as("__pri"))
      .orderBy(col("__pri").desc, col(idCol).asc)
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("__pri").desc, col(idCol).asc)))
      .select(col("rank"), col(idCol), col("weight"))
  }

  /** WEIGHTED exact-k stratified sample: per-stratum k comes from a
    * weights map — the eval-set builder's real contract ("200 en docs,
    * 50 de, 20 of everything else"), where [[stratifiedSample]] is the
    * uniform special case. Same deterministic `md5(seed + ":" + id)`
    * ranking, same `(stratum, rk, id)` output.
    *
    * 100 TB shape: built on [[graft.expressions.TopKByKeyPerGroup]] —
    * the bound rides each row as a map-literal lookup on the stratum, so
    * every partition contributes ≤ k_s entries for stratum s and the
    * exchange carries O(Σ k_s) rows. Aggregating everything at
    * `max(k_s)` and filtering ranks afterwards would carry
    * O(k_max · strata): one "keep 1M of en" stratum would inflate every
    * small stratum's partial buffers 1M-deep. Strata whose k resolves
    * to 0 (and, when `defaultK = 0`, strata absent from the map) leave
    * at the SCAN — they cannot contribute to the exchange at all.
    *
    * The lookup is one flat map literal probed with `try_element_at`
    * (NULL on absent key in both ANSI modes) coalesced to `defaultK` —
    * O(1) expression depth at any stratum count; a nested
    * when/otherwise chain stack-overflows the analyzer far below
    * realistic domain sizes. */
  def stratifiedSampleWeighted(df: DataFrame, stratumCol: String,
                               idCol: String, ks: Map[String, Int],
                               defaultK: Int = 0,
                               seed: String = "strat"): DataFrame = {
    require(ks.nonEmpty, "stratifiedSampleWeighted: empty weights map")
    ks.foreach { case (s0, kv) =>
      require(kv >= 0, s"stratifiedSampleWeighted: negative k=$kv for " +
        s"stratum '$s0'")
    }
    require(defaultK >= 0,
      s"stratifiedSampleWeighted: negative defaultK=$defaultK")
    val entries = ks.toSeq.sortBy(_._1)
      .flatMap { case (name, kv) => Seq(lit(name), lit(kv)) }
    val kCol = coalesce(
      try_element_at(map(entries: _*), col(stratumCol)),
      lit(defaultK))
    val hkey = struct(
      md5(concat(lit(s"$seed:"), col(idCol).cast("string"))).as("h"),
      col(idCol).as("id"))
    df.withColumn("__k", kCol)
      .filter(col("__k") >= 1)
      .groupBy(col(stratumCol))
      .agg(graft.expressions.GraftExpressions
        .topKByKeyPerGroup(hkey, col(idCol), col("__k")).as("__top"))
      .select(col(stratumCol), posexplode(col("__top")))
      .select(col(stratumCol), (col("pos") + 1).as("rk"),
        col("col.payload").as(idCol))
  }

  /** Engine-exact length quantiles (percentile_disc semantics: the
    * smallest value whose cumulative count reaches ⌈q·n⌉). Quantiles
    * are passed as RATIONALS (label, num, den) because `0.9 * n` in
    * binary floating point differs between engines at the ulp and a
    * ceil sits right on that edge — `(num·n + den − 1) DIV den` is the
    * same threshold in pure integer math.
    *
    * Scale shape: one partial-agg shuffle to per-length counts, then a
    * single-partition cumulative window over the DISTINCT lengths only
    * (bounded domain — document lengths, not documents), a broadcast
    * total, and a tiny quantile×length filter. The corpus itself is
    * never globally sorted.
    *
    * The bounded-domain premise is ENFORCED, not assumed: the distinct
    * cardinality is counted on the same single-partition window exchange
    * the totals already ride (zero extra jobs or corpus passes) and a
    * domain past `maxDomain` THROWS with guidance instead of silently
    * grinding a corpus-sized single-task window. */
  def lengthQuantiles(df: DataFrame, lenCol: String,
                      qs: Seq[(String, Int, Int)] = Seq(
                        ("p10", 1, 10), ("p25", 1, 4), ("p50", 1, 2),
                        ("p75", 3, 4), ("p90", 9, 10)),
                      maxDomain: Long = 10000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // percentile_disc ignores NULLs: they must enter neither the counts
    // (they'd sort first and inflate every cum) nor the total rank base
    val nonNull = df.filter(col(lenCol).isNotNull)
    val counts = nonNull.groupBy(col(lenCol).cast("long").as("len"))
      .agg(count(lit(1)).as("cnt"))
    // both the cumulative counts and the total ride the DISTINCT-length
    // table's windows — a separate count() branch would re-execute the
    // whole scan+aggregate subplan as a second corpus pass
    val cum = counts.withColumn("cum",
      sum("cnt").over(Window.orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("cnt").over(Window.partitionBy(lit(1))))
      .withColumn("__dom", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("__guard", assert_true(col("__dom") <= maxDomain,
        concat(lit("graft lengthQuantiles domain overflow: "), col("__dom"),
          lit(s" distinct values exceed maxDomain=$maxDomain — the " +
            "single-partition cumulative window assumes a bounded value " +
            "domain. Bucket/round the length column, or raise maxDomain " +
            "deliberately."))))
      .filter(col("__guard").isNull).drop("__guard", "__dom")
    qs.toDF("q", "num", "den")
      .crossJoin(cum)
      .filter(col("cum") >= expr("(num * n + den - 1) DIV den"))
      .groupBy("q").agg(min("len").as("value"))
  }

  /** Greedy token-budget corpus selection — "take the best documents
    * until the budget is spent", the step between scoring and packing in
    * a compute-bounded pretraining run: documents ordered by
    * (`scoreCol` desc, `idCol` asc) are selected while the running token
    * total stays ≤ `budget`. Returns the selected rows as
    * (id, score, n_tokens, cum_tokens) with `cum_tokens` the global
    * running total — exactly `SUM(n_tokens) OVER (ORDER BY score DESC,
    * id)` — so the output is deterministic, engine-exact (integer sums;
    * the score only ORDERS), and reproducible under any partitioning.
    * Null scores/token counts cannot rank and are excluded.
    *
    * Scale shape — the corpus is never globally sorted and no window
    * ever spans it: per-SCORE totals are one partial-agg exchange; the
    * cumulative-before-each-score table rides a single-partition window
    * over the DISTINCT score domain only (the [[lengthQuantiles]]
    * discipline — quality scores in this library are rounded rationals,
    * a bounded domain, not raw floats); docs join their score's
    * cumulative offset back (aggregate-small side, AQE broadcasts) and
    * only groups whose offset is still within budget reach the per-score
    * intra-group window that settles the boundary group's id-ordered
    * tie-break. Degenerate corpora where most documents share one score
    * concentrate that group in one window partition — score with a
    * discriminating signal (that is the operator's premise).
    *
    * The caller's projection typically carries the EXPENSIVE part — a
    * regex-heavy quality score and a token count — and the per-score
    * aggregate and the join-back would each evaluate it once. The narrow
    * scored base (id, score, n_tokens — three columns, whatever the
    * corpus width) is therefore materialized ONCE via `localCheckpoint`
    * (the [[buildTrainingSet]] discipline) and both subtrees read the
    * cheap materialization: one scoring pass, not two.
    *
    * Like [[lengthQuantiles]], the bounded-score-domain premise is
    * ENFORCED: the distinct-score cardinality rides the cumulative
    * window's own single-partition exchange and a domain past
    * `maxDomain` THROWS with guidance (round scores to rationals — raw
    * floats make the domain corpus-sized) instead of logging a
    * `WindowExec: No Partition Defined` warning and grinding on. */
  def selectToTokenBudget(df: DataFrame, idCol: String, scoreCol: String,
                          tokensCol: String, budget: Long,
                          maxDomain: Long = 10000000L): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val base = df.select(col(idCol).as("id"), col(scoreCol).as("score"),
        col(tokensCol).cast("long").as("n_tokens"))
      .filter(col("score").isNotNull && col("n_tokens").isNotNull)
      .localCheckpoint(eager = true)
    val groups = base.groupBy("score").agg(sum("n_tokens").as("__gtot"))
    val before = groups.withColumn("__before",
      coalesce(sum("__gtot").over(Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__dom", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("__guard", assert_true(col("__dom") <= maxDomain,
        concat(lit("graft selectToTokenBudget domain overflow: "),
          col("__dom"),
          lit(s" distinct scores exceed maxDomain=$maxDomain — the " +
            "per-score cumulative window assumes a bounded score domain. " +
            "Round scores to rationals (raw floats make the domain " +
            "corpus-sized), or raise maxDomain deliberately."))))
      .filter(col("__guard").isNull)
      .select("score", "__before")
    val localW = Window.partitionBy("score").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(before, "score")
      // fully-over groups never reach the window; <= (not <) so a group
      // whose offset lands EXACTLY on the budget still surfaces its
      // zero-token head docs, matching the running-sum oracle's
      // cum <= budget semantics at the boundary
      .filter(col("__before") <= budget)
      .withColumn("cum_tokens", col("__before") + sum("n_tokens").over(localW))
      .filter(col("cum_tokens") <= budget)
      .select(col("id").as(idCol), col("score").as(scoreCol),
        col("n_tokens"), col("cum_tokens"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each RAW
    * document by how strongly its unigrams lean toward a TARGET corpus's
    * distribution — the relational core of domain-matched data
    * selection. DSIR sums log-likelihood ratios of hashed n-gram
    * features; transcendental logs differ across engines at the ulp, so
    * this uses the same integer-rational discipline as
    * [[unigramSurprisal]]: a token LEANS target when its add-one-
    * smoothed target rate beats its raw rate by cross-multiplication,
    *
    *   (tf_target + 1) · (n_raw + 1)  vs  (tf_raw + 1) · (n_target + 1)
    *
    * (decimal(38,0) products — at 100 TB the int64 cross product would
    * overflow), and the document's score is
    * `target_leaning − raw_leaning` (the sign-of-log-ratio sum: an
    * integer-exact monotone surrogate of DSIR's importance weight).
    * Returns (doc_id, n_tokens, target_leaning, raw_leaning, score);
    * rank/filter/sample on `score` downstream — e.g. feed
    * [[selectToTokenBudget]] for a budgeted domain-matched subset.
    *
    * Scale shape: the raw token stream is scanned once for the probe and
    * once for its frequency aggregate (the [[unigramSurprisal]] 2-scan
    * join-back floor; the totals ride their freq tables' exchanges as
    * broadcast scalars, never extra corpus scans — plan-asserted in
    * PlanShapeSpec); the target corpus — typically the small curated
    * side — contributes one scan and one token-keyed aggregate, and its
    * freq table left-joins the raw vocabulary (unseen tokens smooth to
    * tf_target = 0). Both joins are token-keyed with no forced
    * broadcast; AQE broadcasts when a side fits. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String): DataFrame = {
    def toks(df: DataFrame, withId: Boolean): DataFrame = {
      val cols =
        if (withId) Seq(col(idCol).as("doc_id")) else Seq.empty
      df.select(cols :+ explode(split(
          TextAnalysis.normalizeText(col(textCol)), " ")).as("token"): _*)
        .filter(length(col("token")) > 0 && col("token").isNotNull)
    }
    val rawToks = toks(raw, withId = true)
    val rawFreq = rawToks.groupBy("token").agg(count(lit(1)).as("rf"))
    val tgtFreq = toks(target, withId = false)
      .groupBy("token").agg(count(lit(1)).as("tf_t"))
    // coalesce: an empty side must total 0, not NULL (a NULL total would
    // null every comparison and silently zero all leans); with n_tgt = 0
    // add-one smoothing degenerates to a uniform target, which leans
    // toward rare raw tokens — consistent, if meaningless, semantics
    val nRaw = rawFreq.agg(coalesce(sum("rf"), lit(0L)).as("n_raw"))
    val nTgt = tgtFreq.agg(coalesce(sum("tf_t"), lit(0L)).as("n_tgt"))
    val dec = "decimal(38,0)"
    rawToks.join(rawFreq, "token")
      .join(tgtFreq, Seq("token"), "left")
      .na.fill(0L, Seq("tf_t"))
      .crossJoin(broadcast(nRaw))
      .crossJoin(broadcast(nTgt))
      .withColumn("__lean",
        when((col("tf_t") + 1).cast(dec) * (col("n_raw") + 1).cast(dec) >
             (col("rf") + 1).cast(dec) * (col("n_tgt") + 1).cast(dec), 1)
          .when((col("tf_t") + 1).cast(dec) * (col("n_raw") + 1).cast(dec) <
                (col("rf") + 1).cast(dec) * (col("n_tgt") + 1).cast(dec), -1)
          .otherwise(0))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__lean") === 1, 1L).otherwise(0L)).as("target_leaning"),
        sum(when(col("__lean") === -1, 1L).otherwise(0L)).as("raw_leaning"))
      .withColumn("score", col("target_leaning") - col("raw_leaning"))
  }

  /** Power-of-two length histogram — the standard corpus length profile
    * (training pipelines gate on doc-length distributions before and
    * after filtering). The bucket is the binary digit count of the
    * length (floor(log2)+1 for positive lengths, 1 for zero): pure
    * integer/string ops with identical semantics in Spark and DuckDB,
    * unlike float log2. One partial-agg shuffle of ≤64 groups. */
  def lengthHistogram(df: DataFrame, lenCol: String): DataFrame =
    df.select(length(bin(col(lenCol).cast("long"))).as("bucket"),
        col(lenCol).cast("long").as("len"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"),
        min("len").as("min_len"), max("len").as("max_len"))

  /** End-to-end training-set construction — the composed pipeline a
    * 100 TB pretraining run needs, each stage one of this library's
    * operators in its documented scale shape:
    *
    *  1. quality gate: [[TextAnalysis.qualityScore]] ≥ `minQuality` and
    *     [[TextAnalysis.repetitionOk]], plus the full
    *     [[TextAnalysis.gopherFlags]] document gate when `gopher = true`
    *     — scan-side compiled predicates, zero shuffle;
    *  2. language gate: [[TextAnalysis.langId]] ∈ `langs` (skip if empty);
    *  3. optional boilerplate strip (`stripSpans = true`):
    *     [[Dedup.stripBoilerplate]] rewrites `textCol` with corpus-
    *     repeated `stripW`-token spans removed BEFORE dedup (the C4
    *     order — shared boilerplate otherwise glues unrelated documents
    *     into near-dup clusters); hash-only exchange + map-only rewrite;
    *  4. deduplication: [[Dedup.dedupCorpus]] (exact-Jaccard below the
    *     cutover, MinHash-LSH above; transitive clusters, min-id
    *     representative);
    *  5. decontamination: [[Dedup.decontaminate]] against the benchmark
    *     table (13-gram collision, hash-only exchange);
    *  6. mixture weights: [[replicateByWeight]] per `stratumCol`
    *     (up- AND down-sampling, content-hash determinism);
    *  7. split + packing: [[splitAssign]] labels train/val/test, then
    *     each split is [[packSequences]]-packed independently.
    *
    * Returns the packed layout (id, copy, split, shard, start,
    * seq_first, seq_last, offset) plus per-stage row counts. Every
    * stage is deterministic, so the whole pipeline is: identical inputs
    * give bit-identical training layouts on any partitioning — the
    * property that makes a 1000-executor re-run reproducible. */
  def buildTrainingSet(docs: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, stratumCol: String,
                       weights: Map[String, Double] = Map.empty,
                       defaultWeight: Double = 1.0,
                       langs: Set[String] = Set.empty,
                       minQuality: Double = 0.0,
                       splits: Seq[(String, Double)] =
                         Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
                       budget: Long = 4096L,
                       lenCol: Option[String] = None,
                       stripSpans: Boolean = false,
                       stripW: Int = 8, stripMinDocs: Int = 3,
                       gopher: Boolean = false)
      : (DataFrame, Map[String, Long]) = {
    // `gopher = true` adds the MassiveText document gate (all 7 §A1.1
    // rules) in the same scan-side filter stage as the score/repetition
    // gates — one projection, still zero shuffle before dedup
    val gated0 = docs
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .filter(TextAnalysis.repetitionOk(col(textCol)))
    val gated =
      if (!gopher) gated0
      else gated0.filter(
        TextAnalysis.gopherFlags(col(textCol)).getField("keep"))
    val inLang =
      if (langs.isEmpty) gated
      else gated.filter(TextAnalysis.langId(col(textCol)).isin(langs.toSeq: _*))
    val stripped =
      if (!stripSpans) inLang
      else Dedup.stripBoilerplate(inLang, idCol, textCol, stripW, stripMinDocs)
        .withColumn(textCol, col("clean_text")).drop("clean_text")
    val (deduped, dedupStats) = Dedup.dedupCorpus(stripped, idCol, textCol)
    // decontamination keys the benchmark by idCol; synthesize a
    // content-deterministic one when the table ships text only
    val bench =
      if (benchmark.columns.contains(idCol)) benchmark
      else benchmark.withColumn(idCol, xxhash64(col(textCol)))
    // the gate→dedup→decontaminate head is the expensive part and is
    // re-read by the stats counts and every per-split packing branch —
    // materialize it ONCE (lineage-truncating, same discipline as
    // core.Rebuild); everything downstream is scan-side column work
    val clean = Dedup.decontaminate(deduped, bench, idCol, textCol)
      .localCheckpoint(eager = true)
    val mixed =
      if (weights.isEmpty && defaultWeight == 1.0)
        clean.withColumn("copy", lit(1L))
      else replicateByWeight(clean, col(stratumCol), col(textCol),
        weights, defaultWeight)
    val len = lenCol.map(col).getOrElse(
      TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val labeled = mixed
      .withColumn("split", splitAssign(col(idCol), splits))
      .withColumn("__len", len)
      // replicas pack as distinct items: unique packing id = (id, copy)
      .withColumn("__pid",
        concat(col(idCol).cast("string"), lit("#"), col("copy")))
    val packed = labeled.select(col("__pid"), col(idCol), col("copy"),
      col("split"), col("__len"))
    val out = splits.map(_._1).map { s =>
      // rename the packer's "id" back to the reserved "__pid" before the
      // join — a caller idCol of "id" (the common case) must not collide
      packSequences(packed.filter(col("split") === s), "__pid", "__len",
          budget)
        .withColumnRenamed("id", "__pid")
        .join(packed.select(col("__pid"), col(idCol), col("copy"),
          col("split")), "__pid")
        .drop("__pid")
    }.reduce(_ unionByName _)
    val stats = Map(
      "input" -> docs.count(), "gated" -> inLang.count(),
      "deduped" -> dedupStats("kept"), "clean" -> clean.count(),
      "mixed" -> mixed.count())
    (out, stats)
  }

  /** Materialize a [[buildTrainingSet]] layout as training shards:
    * one file per (split, shard) directory, rows in (seq_first, start)
    * order — the layout a data loader streams sequentially without a
    * shuffle or sort of its own. `format` is "parquet" (default) or
    * "json" (JSON-lines — the interchange format most training loaders
    * and inspection tools read directly; same sorted one-file-per-shard
    * contract, just row-encoded as JSON objects).
    *
    * The exchange is a hash repartition on (split, shard) — every
    * shard group lands whole in exactly one task, so each directory
    * holds ONE file written in sorted order (sortWithinPartitions is a
    * local sort, never a global one). At 100 TB raise the shard count
    * at pack time ([[packSequences]] `shardPrefix`), not here. */
  def writeTrainingShards(packed: DataFrame, outDir: String,
                          format: String = "parquet"): Unit = {
    require(format == "parquet" || format == "json",
      s"unsupported shard format: $format")
    packed.repartition(col("split"), col("shard"))
      .sortWithinPartitions("split", "shard", "seq_first", "start")
      .write.partitionBy("split", "shard").mode("overwrite")
      .format(format).save(outDir)
  }

  /** WebDataset-style tar shards — the multimodal-training interchange
    * format (one tar per shard; each sample's files are adjacent
    * entries `<key>.<ext>`, which loaders stream sequentially without
    * an index). `entryCols` maps binary/string columns to entry
    * extensions, e.g. `Seq("image" -> "png", "caption" -> "txt")`; null
    * columns skip their entry.
    *
    * Scale shape: shard = `pmod(xxhash64(key), nShards)` (content-
    * deterministic, partitioning-independent); ONE hash exchange on the
    * shard id, a LOCAL sort by (shard, key, entry bytes — the byte
    * tie-break keeps duplicate-key corpora deterministic too), then
    * executor-side streaming tar writes through the Hadoop FS
    * (s3a-compatible, the ArchiveCopy discipline — bytes never pass the
    * driver). A partition may carry several shard ids
    * (hash-partitioning is not a bijection), so the writer switches tar
    * files on shard boundaries — each shard is still written exactly
    * once, by exactly one task. Entry order and zeroed mtimes make
    * shard bytes REPRODUCIBLE: re-running the job yields bit-identical
    * tars. A null or dotted key raises (a sample must have a name, and
    * WebDataset loaders split it at the FIRST dot — dotted keys would
    * silently merge samples); duplicate keys produce duplicate entry
    * names — deterministic bytes, but fix the keys if your loader
    * groups by name.
    *
    * Commit protocol: re-running into the same directory first
    * truncates the previous run's tars and marker (a shrunken shard
    * set must not leave stale samples behind); each shard then writes
    * to a `_tmp-` name and renames into place on completion, and a
    * `_SUCCESS` marker is written after the job finishes — readers
    * that filter `_tmp-*` / require `_SUCCESS` never observe partial
    * shards. Like the other direct-FS sinks, run with speculative
    * execution off. */
  def writeWebDatasetShards(df: DataFrame, outDir: String, keyCol: String,
                            entryCols: Seq[(String, String)],
                            nShards: Int = 16): Unit = {
    require(entryCols.nonEmpty, "need at least one entry column")
    require(nShards > 0)
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // truncate any previous run's output first — a removed shard id
    // would otherwise survive as a stale tar under a fresh _SUCCESS
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val outFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (outFs.exists(outPath)) {
      outFs.listStatus(outPath).foreach { st =>
        val n = st.getPath.getName
        if (n.endsWith(".tar") || n == "_SUCCESS")
          outFs.delete(st.getPath, false)
      }
    }
    val exts = entryCols.map(_._2)
    val keyStr = when(col(keyCol).isNull, raise_error(
        lit("writeWebDatasetShards: null key — every sample needs a name")))
      .when(col(keyCol).cast("string").contains("."), raise_error(
        lit("writeWebDatasetShards: key contains '.' — WebDataset loaders " +
          "group entries by the name up to the FIRST dot, so dotted keys " +
          "silently merge samples")))
      .otherwise(col(keyCol).cast("string"))
    val cols = keyStr.as("__key") +:
      pmod(xxhash64(col(keyCol).cast("string")), lit(nShards.toLong))
        .as("__shard") +:
      entryCols.map { case (c, _) => col(c).cast("binary").as(c) }
    val sortCols = Seq(col("__shard"), col("__key")) ++
      entryCols.map { case (c, _) => col(c) }
    df.select(cols: _*)
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(sortCols: _*)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
        var curShard = -1L
        var tar: TarArchiveOutputStream = null
        var tmp: org.apache.hadoop.fs.Path = null
        var fin: org.apache.hadoop.fs.Path = null
        var fs: org.apache.hadoop.fs.FileSystem = null
        // rename into place ONLY on a completed shard group; a failure
        // aborts the tmp file so a partial tar never gets a final name
        def finish(): Unit = if (tar != null) {
          tar.close(); tar = null
          fs.delete(fin, false)
          if (!fs.rename(tmp, fin))
            throw new java.io.IOException(s"rename $tmp -> $fin failed")
        }
        def abort(): Unit = if (tar != null) {
          try tar.close() catch { case _: Exception => () }
          try fs.delete(tmp, false) catch { case _: Exception => () }
          tar = null
        }
        try {
          it.foreach { r =>
            val shard = r.getLong(1)
            if (shard != curShard) {
              finish()
              fin = new org.apache.hadoop.fs.Path(
                f"$outDir/shard-$shard%05d.tar")
              tmp = new org.apache.hadoop.fs.Path(
                f"$outDir/_tmp-shard-$shard%05d.tar")
              fs = fin.getFileSystem(conf.value)
              tar = new TarArchiveOutputStream(fs.create(tmp, true))
              tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
              curShard = shard
            }
            val key = r.getString(0)
            exts.zipWithIndex.foreach { case (ext, i) =>
              val bytes = r.getAs[Array[Byte]](2 + i)
              if (bytes != null) {
                val e = new TarArchiveEntry(s"$key.$ext")
                e.setSize(bytes.length)
                e.setModTime(0L) // reproducible shard bytes
                tar.putArchiveEntry(e)
                tar.write(bytes)
                tar.closeArchiveEntry()
              }
            }
          }
          finish()
        } catch { case e: Throwable => abort(); throw e }
      }
    val success = new org.apache.hadoop.fs.Path(s"$outDir/_SUCCESS")
    success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(success, true).close()
  }

  /** Per-document keyword extraction by tf·rarity, integer-exact.
    *
    * The classic tf·idf weight multiplies tf by a log — a transcendental
    * whose last-ulp behavior differs across engines, which would poison
    * hash-exact oracles. Rarity here is the integer surrogate
    * `N + 1 - df` (documents NOT containing the token, plus one), which
    * preserves the "frequent in this doc, rare in the corpus" ordering
    * with pure int64 arithmetic. Document frequency is computed over the
    * passed `df` (pre-filter to score against a sub-corpus).
    *
    * Plan shape: tokenize → (id, token) partial-agg groupBy → docfreq
    * as `tf.groupBy(token)` partial-agg counts joined back on token
    * (map-side combine, and AQE can split a skewed join — a
    * `count over (partition by token)` window would buffer a stop-word
    * token's entire corpus-wide group in ONE task, which no skew
    * mitigation can split) → per-doc top-`perDoc` window with a unique
    * (score desc, token) tie-break. The docfreq aggregate counts
    * `count(when(tf > 0, 1))` — semantically `count(1)`, since tf ≥ 1
    * by construction — DELIBERATELY: with a literal count, Catalyst
    * prunes the tf column out of the docfreq subtree (and rewrites
    * `count(tf)` over the provably-non-null tf back to `count(1)`),
    * which breaks canonical equality with the join branch's tf subplan
    * and forces a SECOND tokenize scan + exchange of the corpus. The
    * conditional reference pins tf, keeping the two subtrees identical
    * so AQE stage reuse computes the (id, token) exchange ONCE
    * (ReusedExchange, final-adaptive-plan asserted in PlanShapeSpec) —
    * and that exchange must carry the partial count for the join
    * branch anyway, so the un-pruned column is zero marginal bytes.
    * Same discipline as [[unigramSurprisal]]'s isNotNull declaration;
    * the pruned formulation is optimizer myopia, not a saving. The `n`
    * scalar reads only the pruned id column — a genuinely narrow
    * third scan that must see zero-token documents, which tf cannot. */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
                    perDoc: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
          .as("token"))
      .filter(length(col("token")) > 0)
    val tf = toks.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token")
      .agg(count(when(col("tf") > 0, lit(1))).as("docfreq"))
    val ndocs = df.agg(countDistinct(col(idCol)).as("n"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(ndocs))
      .select(col("id"), col("token"),
        (col("tf") * (col("n") + 1 - col("docfreq"))).as("score"))
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perDoc)
      .select(col("id"), col("token"), col("score"))
  }
}
