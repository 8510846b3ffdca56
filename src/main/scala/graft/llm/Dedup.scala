package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Four tiers, all shuffle-architected for 100 TB:
  *  - exact: hash → groupBy (one shuffle of (hash, id), never text)
  *  - n-gram Jaccard: inverted-index self-join (shuffle on shingle), exact
  *  - MinHash+LSH: signature → band buckets → candidate pairs (the scale
  *    path: cost linear in corpus + band-bucket collisions)
  *  - SimHash: 64-bit signatures, hamming-ball candidates via chunk banding
  */
object Dedup {

  /** Per-invocation suffix for `Dataset.observe` metric names — Spark
    * requires observed-metric names to be unique within one query plan. */
  private val observeId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Word n-gram shingles, distinct, as an array column. Documents shorter
    * than `n` words contribute their whole token sequence as one shingle.
    * Backed by the compiled [[graft.expressions.GraftExpressions.WordShingles]]
    * kernel (the column-stack formulation
    * `array_distinct(transform(sequence…, i => array_join(slice(words,i+1,n))))`
    * is semantically identical but interpreter-bound). */
  def shingles(text: Column, n: Int = 3): Column =
    graft.expressions.GraftExpressions.wordShingles(text, n)

  // ------------------------------------------------------------ exact
  /** Exact dedup: keep the smallest id per content hash. One row per
    * surviving document plus the group size. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    df.withColumn("__h", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .withColumn("dup_count", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .filter(col("__rn") === 1)
      .drop("__rn").withColumnRenamed("__h", "content_hash")
  }

  // ---------------------------------------------------------- span dedup
  /** Repeated-span (boilerplate) detection: every `w`-token window of
    * every document, counted corpus-wide — spans appearing in at least
    * `minDocs` DISTINCT documents are boilerplate candidates (headers,
    * footers, license blocks, templated text). Returns
    * (span, n_docs, n_occurrences).
    *
    * 100 TB shape: window generation is a compiled map-side pass
    * ([[graft.expressions.GraftExpressions.WordNGrams]] — no interpreted
    * HOF, no per-window shuffle), followed by ONE exchange on the span for
    * the count aggregate (partial map-side combine applies). The output is
    * aggregate-small (only spans clearing `minDocs`). Spans shorter than
    * `w` tokens are not emitted — a partial span is not a span. */
  def boilerplateSpans(df: DataFrame, idCol: String, textCol: String,
                       w: Int = 8, minDocs: Int = 3,
                       hashExchange: Boolean = false): DataFrame = {
    require(w > 0 && minDocs > 0)
    val spans = df.select(col(idCol).as("doc_id"),
      explode(graft.expressions.GraftExpressions.wordNGrams(col(textCol), w))
        .as("span"))
    if (!hashExchange)
      spans.groupBy("span")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") >= minDocs)
    else {
      // 100 TB mode: the corpus-wide exchange carries (xxhash64, doc_id)
      // — 16 bytes/row instead of the w-token span text. Flagged hashes
      // are aggregate-small; a SECOND map-only scan resolves their text
      // through a broadcast join (min(span) per hash makes a collision,
      // p ≈ spans²/2⁶⁴, deterministic rather than run-dependent). Same
      // output contract as the default mode.
      val flagged = spans
        .select(col("doc_id"), xxhash64(col("span")).as("h"))
        .groupBy("h")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") >= minDocs)
      spans.select(xxhash64(col("span")).as("h"), col("span"))
        .join(broadcast(flagged), "h")
        .groupBy("h", "n_docs", "n_occurrences")
        .agg(min("span").as("span"))
        .select("span", "n_docs", "n_occurrences")
    }
  }

  /** Strip boilerplate DOCUMENTS: drop any document containing at least
    * `maxSpans` of the given boilerplate spans (the document-level
    * consumer of [[boilerplateSpans]]; [[stripBoilerplate]] is the
    * span-level surgical alternative that keeps the document). The span
    * table is broadcast — it is aggregate-small by construction. */
  def dropBoilerplateDocs(df: DataFrame, spans: DataFrame, idCol: String,
                          textCol: String, w: Int = 8,
                          maxSpans: Int = 1): DataFrame = {
    val hits = df.select(col(idCol).as("__id"),
        explode(graft.expressions.GraftExpressions.wordNGrams(col(textCol), w))
          .as("span"))
      .join(broadcast(spans.select("span")), "span")
      // DISTINCT spans: a doc repeating one flagged span is one hit —
      // the contract counts how many of the GIVEN spans it contains
      .groupBy("__id").agg(countDistinct(col("span")).as("__hits"))
      .filter(col("__hits") >= maxSpans)
    df.join(hits, df(idCol) === hits("__id"), "left_anti")
  }

  /** SURGICAL boilerplate removal (the C4/RefinedWeb discipline): rewrite
    * every document with each corpus-repeated `w`-token span removed,
    * KEEPING the document — headers, cookie banners, and license
    * blocks vanish while the unique prose stays. A span is flagged when
    * it appears in ≥ `minDocs` distinct documents; overlapping flagged
    * spans union their covered token positions. Returns the input
    * columns plus `clean_text`: the whitespace-normalized (single-space
    * joined) stream of surviving tokens — empty when every token was
    * covered.
    *
    * 100 TB shape (default mode): the one corpus-wide exchange carries
    * (xxhash64(span), doc_id) — 16 bytes/row, never text. Flagged hashes
    * are aggregate-small by construction (spans repeated across ≥
    * `minDocs` documents) and ship to executors inside the compiled
    * [[graft.expressions.GraftExpressions.StripWindowsInSet]] rewrite
    * expression, so the rewrite pass is MAP-ONLY: no explode, join,
    * window, or reassembly shuffle touches the corpus on the way back.
    * Membership is exact (sorted-array binary search), never a Bloom
    * probe — a false positive would silently delete clean training
    * text. Flagging by 64-bit hash instead of text mislabels ~nothing
    * (p ≈ spans²/2⁶⁴).
    *
    * `relational = Some(true)` runs the identical semantics as explode →
    * span count → covered-position join → ordered reassembly (flagging
    * by span TEXT): the oracle formulation, parity-asserted in DedupSpec
    * and PropertySpec, and the path that never materializes the flagged
    * set anywhere. `Some(false)` pins the driver-hash kernel mode.
    *
    * The default `None` AUTO-SELECTS: the flagged-hash aggregation runs
    * with a `relationalCutover + 1` cap — when the flagged set fits the
    * cap, the capped collect IS the kernel's hash set (one aggregation
    * job decides the mode and feeds the rewrite); when a degenerate
    * high-duplication corpus overflows it, the mode cuts over to the
    * relational rewrite, which keeps the span set distributed — and the
    * probe's aggregation is NOT discarded: the flagged-hash frame is
    * persisted (MEMORY_AND_DISK) before the capped collect, so the
    * relational branch joins the cached hash frame instead of
    * recomputing the heaviest aggregation from scratch in exactly the
    * high-duplication case the cutover exists for. (Overflow-path
    * caches live until session eviction or an explicit
    * [[releaseStripCaches]] — the lifecycle contract is documented
    * there.) Same contract either way (the modes are parity-asserted),
    * so the cutover changes memory placement, never the answer. */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       w: Int = 8, minDocs: Int = 3,
                       relational: Option[Boolean] = None,
                       relationalCutover: Long = StripRelationalCutover): DataFrame = {
    require(w > 0 && minDocs > 0)
    require(relationalCutover > 0 && relationalCutover < Int.MaxValue.toLong)
    val X = graft.expressions.GraftExpressions
    val mode = stripFlagMode(df, idCol, textCol, w, minDocs, relational,
      relationalCutover)
    mode match {
      case Right(hashes) =>
        // coalesce: null text strips to '' (matching the relational mode's
        // reassembly, where a null doc contributes no token rows)
        df.withColumn("clean_text",
          coalesce(X.stripWindowsInSet(col(textCol), w, hashes), lit("")))
      case Left(flaggedHashFrame) =>
        val wins = df.select(col(idCol).as("doc_id"),
          posexplode(X.wordNGrams(col(textCol), w)).as(Seq("start", "span")))
        val flaggedWins = flaggedHashFrame match {
          case Some(fh) =>
            wins.withColumn("__h", xxhash64(col("span")))
              .join(fh.withColumnRenamed("h", "__h"), "__h")
              .drop("__h")
          case None =>
            val flagged = wins.groupBy("span")
              .agg(countDistinct("doc_id").as("n_docs"))
              .filter(col("n_docs") >= minDocs)
              .select("span")
            wins.join(flagged, "span")
        }
        stripReassemble(df, idCol, textCol, w, flaggedWins)
    }
  }

  /** Shared relational rewrite tail: union each flagged window's covered
    * token positions, reassemble every document's surviving tokens in
    * order. `flaggedWins` carries (doc_id, start) of the windows to cut. */
  private def stripReassemble(df: DataFrame, idCol: String, textCol: String,
                              w: Int, flaggedWins: DataFrame): DataFrame = {
    val covered = flaggedWins
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + lit(w - 1))).as("pos"))
      .distinct()
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(
        when(trim(col(textCol)) === "", array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), "\\s+")))
        .as(Seq("pos", "word")))
    val clean = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("word")))),
          x => x("word")), " ").as("clean_text"))
      .withColumnRenamed("doc_id", "__sb_id")
    df.join(clean, df(idCol) === col("__sb_id"), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
      .drop("__sb_id")
  }

  /** Batch incremental form of [[stripBoilerplate]]: rewrite NEW documents
    * using a REFERENCE corpus's flagged spans (spans in ≥ `minDocs`
    * distinct reference docs), completing the family —
    * [[stripBoilerplate]] is the self-corpus batch op and
    * [[graft.streaming.Streaming.stripBoilerplateStream]] the stream
    * form, which is this operator with the flagged set pinned small.
    * Same auto mode selection: the flagged set bakes into the compiled
    * map-only rewrite kernel when it fits ([[StripRelationalCutover]]),
    * and past the cutover it STAYS DISTRIBUTED — flagged hashes join the
    * batch's windows hash-keyed (16-byte rows), then the relational
    * reassembly; never a driver OOM, never a second silent path. New-side
    * spans play no part in flagging: a phrase must be reference
    * boilerplate to be cut, so a batch-internal template survives until
    * the lake snapshot that contains it becomes the reference. */
  def stripBoilerplateAgainst(docs: DataFrame, reference: DataFrame,
                              idCol: String, textCol: String,
                              w: Int = 8, minDocs: Int = 3,
                              relational: Option[Boolean] = None,
                              relationalCutover: Long = StripRelationalCutover): DataFrame = {
    require(w > 0 && minDocs > 0)
    require(relationalCutover > 0 && relationalCutover < Int.MaxValue.toLong)
    val X = graft.expressions.GraftExpressions
    // same mode contract as [[stripBoilerplate]], flag source = reference
    val mode = stripFlagMode(reference, idCol, textCol, w, minDocs,
      relational, relationalCutover)
    mode match {
      case Right(hashes) =>
        docs.withColumn("clean_text",
          coalesce(X.stripWindowsInSet(col(textCol), w, hashes), lit("")))
      case Left(flaggedHashFrame) =>
        val wins = docs.select(col(idCol).as("doc_id"),
          posexplode(X.wordNGrams(col(textCol), w)).as(Seq("start", "span")))
        val flaggedWins = flaggedHashFrame match {
          case Some(fh) =>
            wins.withColumn("__h", xxhash64(col("span")))
              .join(fh.withColumnRenamed("h", "__h"), "__h")
              .drop("__h")
          case None =>
            val flagged = reference.select(col(idCol).as("doc_id"),
                explode(X.wordNGrams(col(textCol), w)).as("span"))
              .groupBy("span")
              .agg(countDistinct("doc_id").as("n_docs"))
              .filter(col("n_docs") >= minDocs)
              .select("span")
            wins.join(flagged, "span")
        }
        stripReassemble(docs, idCol, textCol, w, flaggedWins)
    }
  }

  /** The SORTED xxhash64 set of spans appearing in ≥ `minDocs` distinct
    * documents — the driver-resident flagged-span artifact
    * [[stripBoilerplate]] and the streaming
    * [[graft.streaming.Streaming.stripBoilerplateStream]] share. The
    * corpus-wide exchange carries (hash, doc_id) 16-byte rows; the
    * result is aggregate-small by construction — and GUARDED: the
    * collect is capped at `maxHashes` (default
    * [[StripRelationalCutover]], 1M ≈ 8 MB) with a loud `require`
    * instead of a silent driver OOM, because this array is baked into
    * map-only kernels (batch pinned mode, streaming projections) where
    * an unbounded driver set is the one scale hazard left. An overflow
    * means the flagged set should stay DISTRIBUTED: use
    * `stripBoilerplate(relational = Some(true))` in batch, or persist
    * the flagged spans and batch-join them instead of a stream-side
    * bake. */
  def boilerplateHashes(df: DataFrame, idCol: String, textCol: String,
                        w: Int = 8, minDocs: Int = 3,
                        maxHashes: Long = StripRelationalCutover): Array[Long] = {
    require(maxHashes > 0 && maxHashes < Int.MaxValue.toLong,
      s"maxHashes must be in (0, Int.MaxValue), got $maxHashes")
    val capped = flaggedSpanHashes(df, idCol, textCol, w, minDocs)
      .limit(maxHashes.toInt + 1)
      .collect().map(_.getLong(0))
    require(capped.length <= maxHashes,
      s"boilerplateHashes: flagged-span set exceeds maxHashes=$maxHashes — " +
        "a set this large must stay distributed, not driver-resident. Use " +
        "stripBoilerplate(relational = Some(true)) (batch, fully relational), " +
        "or persist boilerplateSpans and batch-join the flagged spans instead " +
        "of baking the set into a stream projection.")
    capped.sorted
  }

  /** Flagged-span count above which [[stripBoilerplate]]'s auto mode
    * abandons the driver-resident hash set for the fully relational
    * rewrite. 1M hashes = 8 MB on the driver plus the same broadcast to
    * every executor — comfortably fine; far beyond it the collect itself
    * becomes the scale hazard the relational mode exists to avoid. */
  val StripRelationalCutover: Long = 1000000L

  /** Flagged-hash frames PERSISTED by the auto mode's overflow path,
    * tracked so callers can release them: see [[releaseStripCaches]]. */
  private val stripCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Release the flagged-hash frames the strip operators' AUTO mode
    * persisted on its overflow path. THE CACHING CONTRACT: when the
    * flagged-span set overflows `relationalCutover`, the auto probe's
    * aggregation is kept persisted (MEMORY_AND_DISK, spillable, far
    * smaller than the corpus by the `minDocs` filter) so the relational
    * rewrite joins it instead of recomputing the heaviest aggregation —
    * and it stays cached until session eviction, because the operator
    * returns a LAZY DataFrame still referencing it and cannot know when
    * the caller is done. A long-lived session that has consumed its
    * strip results calls this to hand the blocks back eagerly;
    * otherwise Spark's normal cache eviction reclaims them under
    * pressure. Safe to call while earlier results are still unconsumed
    * only in the sense Spark defines: unpersisted frames recompute. */
  def releaseStripCaches(blocking: Boolean = false): Unit = {
    var df = stripCaches.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = stripCaches.poll()
    }
  }

  /** The ONE flag-mode selector behind [[stripBoilerplate]] and
    * [[stripBoilerplateAgainst]] (the flag source differs — self corpus
    * vs reference — the machinery must not).
    *
    * Right(hashes) = kernel mode; Left(Some(fh)) = relational mode
    * reusing the persisted flagged-HASH frame from the auto probe;
    * Left(None) = relational mode flagging by span TEXT (the oracle
    * formulation `Some(true)` pins — hash and text flagging differ only
    * on 64-bit collisions, p ≈ spans²/2⁶⁴, parity-asserted in
    * DedupSpec). Auto (`None`): the flagged-hash aggregation runs with a
    * `relationalCutover + 1` cap — when it fits, the capped collect IS
    * the kernel's hash set; on overflow the mode cuts over to the
    * relational rewrite and the persisted probe frame is registered in
    * [[stripCaches]] for [[releaseStripCaches]] (the cache-lifecycle
    * contract lives there). */
  private def stripFlagMode(flagSource: DataFrame, idCol: String,
                            textCol: String, w: Int, minDocs: Int,
                            relational: Option[Boolean],
                            relationalCutover: Long)
      : Either[Option[DataFrame], Array[Long]] = {
    require(w > 0 && minDocs > 0)
    require(relationalCutover > 0 && relationalCutover < Int.MaxValue.toLong)
    relational match {
      case Some(true)  => Left(None)
      case Some(false) =>
        Right(boilerplateHashes(flagSource, idCol, textCol, w, minDocs,
          maxHashes = relationalCutover))
      case None =>
        val fh = flaggedSpanHashes(flagSource, idCol, textCol, w, minDocs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val capped = fh.limit(relationalCutover.toInt + 1)
          .collect().map(_.getLong(0))
        if (capped.length > relationalCutover) {
          stripCaches.add(fh)
          Left(Some(fh)) // overflow: flagged set stays distributed
        } else {
          fh.unpersist(blocking = false)
          Right(capped.sorted)
        }
    }
  }

  /** The single-column (`h`) frame of xxhash64 span hashes appearing in
    * ≥ `minDocs` distinct documents — the shared aggregation behind
    * [[boilerplateHashes]] and [[stripBoilerplate]]'s auto probe. The
    * corpus-wide exchange carries (hash, doc_id) 16-byte rows. */
  private def flaggedSpanHashes(df: DataFrame, idCol: String,
                                textCol: String, w: Int,
                                minDocs: Int): DataFrame = {
    require(w > 0 && minDocs > 0)
    df.select(col(idCol).as("doc_id"),
        explode(graft.expressions.GraftExpressions
          .wordNGrams(col(textCol), w)).as("span"))
      .select(col("doc_id"), xxhash64(col("span")).as("h"))
      .groupBy("h").agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("h")
  }

  // ------------------------------------------------------- decontamination
  /** Benchmark decontamination (the GPT-3/Llama discipline): a training
    * document is CONTAMINATED when it shares at least one `n`-token
    * window with any benchmark document. Returns (doc_id, n_collisions,
    * n_benchmark_docs) per contaminated training document —
    * [[decontaminate]] strips them.
    *
    * 100 TB shape: both sides emit (xxhash64(window), id) — the exchange
    * carries 16 bytes per window, never text. The benchmark side is
    * DISTINCT-collapsed per (hash, bench doc) and is small by nature
    * (benchmarks are MBs); Spark broadcasts it under AQE when it fits,
    * and the join degrades gracefully to shuffle when a giant benchmark
    * set doesn't. Counting collisions by hash (not text) is the standard
    * trade: a 64-bit collision mislabels ~nothing (p ≈ windows²/2⁶⁴). */
  def contaminationHits(docs: DataFrame, benchmark: DataFrame, idCol: String,
                        textCol: String, n: Int = 13): DataFrame = {
    val ngrams = graft.expressions.GraftExpressions.wordNGrams(col(textCol), n)
    val docSide = docs.select(col(idCol).as("doc_id"),
        explode(ngrams).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val benchSide = benchmark.select(col(idCol).as("bench_id"),
        explode(ngrams).as("w"))
      .select(col("bench_id"), xxhash64(col("w")).as("h"))
      .distinct()
    docSide.join(benchSide, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_collisions"),
        countDistinct("bench_id").as("n_benchmark_docs"))
  }

  /** Strip contaminated documents: anti-join [[contaminationHits]] back
    * onto the corpus. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int = 13): DataFrame = {
    val hits = contaminationHits(docs, benchmark, idCol, textCol, n)
    docs.join(hits, docs(idCol) === hits("doc_id"), "left_anti")
  }

  /** Per-document contamination COVERAGE — the graded companion to
    * [[contaminationHits]]' binary verdict: for EVERY training document,
    * how many of its `n`-token window positions collide with the
    * benchmark set, as `(doc_id, n_windows, n_hits, overlap_frac)`. The
    * fractional form is what threshold-based policies consume (drop at
    * frac > 0.8, flag at > 0.1 — the partial-overlap discipline of
    * Llama/FineWeb decontam reports, where a single shared window on a
    * 10k-token page is noise but 80% coverage is a leaked benchmark).
    *
    * Zero-hit documents ARE rows here (a decontam report must say "clean",
    * not omit) — totals come from a scan-side `size(windows)` projection,
    * hits from the hash join, stitched with one left join on doc id.
    * `overlap_frac` is the exact quotient of two engine-identical int64s
    * (0.0 when a short document has no windows) — one IEEE division per
    * row, order-independent, so the oracle can demand value equality.
    * Same 100 TB shape as [[contaminationHits]]: (hash, id) exchanges
    * only, DISTINCT-collapsed benchmark side, AQE broadcast when it fits. */
  def contaminationOverlap(docs: DataFrame, benchmark: DataFrame,
                           idCol: String, textCol: String,
                           n: Int = 13): DataFrame = {
    val ngrams = graft.expressions.GraftExpressions.wordNGrams(col(textCol), n)
    val totals = docs.select(col(idCol).as("doc_id"),
      size(ngrams).cast("long").as("n_windows"))
    val docSide = docs.select(col(idCol).as("doc_id"), explode(ngrams).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val benchSide = benchmark.select(explode(ngrams).as("w"))
      .select(xxhash64(col("w")).as("h")).distinct()
    val hits = docSide.join(benchSide, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("n_windows") === 0, lit(0.0d))
          .otherwise(coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_windows")).as("overlap_frac"))
  }

  /** Per-benchmark contamination ATTRIBUTION — which benchmark leaked
    * into which training document: `(doc_id, bench_id, n_hits)` for
    * every colliding pair, the audit companion to
    * [[contaminationOverlap]]'s doc-level coverage. Dropping a doc is
    * a policy call; knowing WHICH eval is burned — and therefore
    * cannot be reported on for a model trained anyway — needs the
    * pair. A window shared by two benchmarks attributes to BOTH (each
    * benchmark's leak report must be complete on its own); a window
    * repeated inside one benchmark counts once (the DISTINCT-collapsed
    * benchmark side, [[contaminationOverlap]]'s convention), while
    * repeated doc-side positions each count (coverage semantics).
    *
    * Shape: the same (hash, id) exchanges as [[contaminationHits]]
    * with the benchmark id riding its side; zero-hit pairs are OMITTED
    * — the pair domain is |docs|·|benchmarks|, and "clean" is already
    * said per doc by [[contaminationOverlap]]. */
  def contaminationBySource(docs: DataFrame, benchmark: DataFrame,
                            idCol: String, textCol: String,
                            benchIdCol: String, n: Int = 13): DataFrame = {
    val ngrams = graft.expressions.GraftExpressions.wordNGrams(col(textCol), n)
    val docSide = docs.select(col(idCol).as("doc_id"), explode(ngrams).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val benchSide = benchmark
      .select(col(benchIdCol).as("bench_id"), explode(ngrams).as("w"))
      .select(col("bench_id"), xxhash64(col("w")).as("h")).distinct()
    docSide.join(benchSide, "h")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_hits"))
  }

  // ------------------------------------------------ exact substring dedup
  /** Cross-document duplicated-substring statistics — the "exact substring
    * dedup" signal of Lee et al. 2022 (arXiv:2107.06499), computed at
    * window granularity instead of via a suffix array: every `w`-char
    * window taken at `stride`-char steps, a window is DUPLICATED when at
    * least `minDocs` DISTINCT documents contain it. Returns per document
    * `(doc_id, n_windows, n_dup_windows, dup_frac)` — the standard
    * "how much of this page is copied text" measure. Complements
    * [[boilerplateSpans]] (which returns the spans themselves, word-based):
    * this one scores each DOCUMENT by its duplicated-character coverage.
    *
    * 100 TB shape: windows are generated scan-side (explode of an index
    * sequence + substring + xxhash64, all codegen'd built-ins) and emitted
    * as (64-bit hash, doc) — ONE full-data exchange, 16 bytes per window,
    * never text. The explicit hash-partitioning on the window hash serves
    * all three per-hash steps without re-exchange: the (hash, doc)
    * aggregate (co-located because hash(h) clusters every (h, doc) group)
    * and the doc-frequency window (a local sort on the same partitioning).
    * Only the final per-doc rollup exchanges again — over rows already
    * collapsed to one per (window, doc). A join-back formulation was
    * rejected: its duplicated-window build side is corpus-shaped in the
    * worst case, so AQE would degrade the broadcast to a shuffle join and
    * re-exchange the probe — the window form never grows a second
    * full-data exchange (plan-asserted in PlanShapeSpec). A hot window
    * (shared by millions of docs) lands its (hash, doc) rows in one
    * window partition — count-only, spillable, and exactly the skew any
    * h-grouped formulation carries. Documents shorter than `w` chars emit
    * no windows and are absent from the output (a partial window is not a
    * window; score short docs with the quality gates). A 64-bit hash
    * collision perturbs one window's doc-frequency by one — the standard
    * trade, as in [[contaminationHits]]. */
  /** Char-window generation shared by the substring-dup family: every
    * `w`-char window at `stride` steps, emitted scan-side as
    * (doc_id, 64-bit hash) — 16 bytes per window, never text. */
  private def charWindows(df: DataFrame, idCol: String, textCol: String,
                          w: Int, stride: Int): DataFrame =
    df.filter(length(col(textCol)) >= w)
      .select(col(idCol).as("doc_id"),
        col(textCol).as("__t"),
        explode(sequence(lit(1), length(col(textCol)) - (w - 1), lit(stride)))
          .as("__i"))
      .select(col("doc_id"),
        xxhash64(col("__t").substr(col("__i"), lit(w))).as("__h"))

  def substringDupStats(df: DataFrame, idCol: String, textCol: String,
                        w: Int = 50, stride: Int = 25,
                        minDocs: Int = 2): DataFrame = {
    require(w > 0 && stride > 0, s"window/stride must be positive ($w/$stride)")
    require(minDocs >= 2, s"minDocs=$minDocs: a window needs >=2 distinct docs to be a duplicate")
    val wins = charWindows(df, idCol, textCol, w, stride)
    // ONE full-data exchange: hash(h) co-locates every (h, doc) group, so
    // the aggregate runs exchange-free on top of it
    val perHashDoc = wins.repartition(col("__h"))
      .groupBy("__h", "doc_id").agg(count(lit(1)).as("__c"))
    // rows of perHashDoc are distinct per (hash, doc), so a count over the
    // hash partition IS the distinct-document frequency — the window needs
    // only a local sort on the partitioning already in place
    val withFreq = perHashDoc.withColumn("__nd",
      count(lit(1)).over(Window.partitionBy(col("__h"))))
    withFreq.groupBy("doc_id")
      .agg(sum(col("__c")).as("n_windows"),
        sum(when(col("__nd") >= minDocs, col("__c")).otherwise(lit(0L)))
          .as("n_dup_windows"))
      .withColumn("dup_frac",
        round(col("n_dup_windows").cast("double") /
          col("n_windows").cast("double"), 6))
  }

  /** Strip documents whose duplicated-window fraction exceeds `maxFrac`:
    * the filter form of [[substringDupStats]]. Documents shorter than `w`
    * chars have no windows, hence no dup evidence — they are KEPT (gate
    * short docs with the quality/Gopher filters, not this one). */
  def dropSubstringDups(df: DataFrame, idCol: String, textCol: String,
                        maxFrac: Double = 0.5, w: Int = 50, stride: Int = 25,
                        minDocs: Int = 2): DataFrame = {
    require(maxFrac >= 0.0 && maxFrac <= 1.0, s"maxFrac=$maxFrac out of [0,1]")
    val flagged = substringDupStats(df, idCol, textCol, w, stride, minDocs)
      .filter(col("dup_frac") > maxFrac)
      .select(col("doc_id").as("__drop_id"))
    df.join(flagged, df(idCol) === col("__drop_id"), "left_anti")
  }

  /** Incremental form of [[substringDupStats]] — the signal's practical
    * deployment: score each NEW document's duplicated-window coverage
    * against an EXISTING corpus's window set (crawl batch vs lake), the
    * way [[exactAgainst]]/[[jaccardPairsAgainst]] incrementalize their
    * batch twins. A new doc's window counts as duplicated when at least
    * `minCorpusDocs` DISTINCT corpus documents contain it (default 1:
    * "seen anywhere in the corpus"). Returns the same
    * `(doc_id, n_windows, n_dup_windows, dup_frac)` schema over the NEW
    * side only; new×new duplication is deliberately not counted — run
    * [[substringDupStats]] on the batch for that.
    *
    * 100 TB shape: the new side keeps the batch operator's discipline —
    * windows emitted scan-side as (hash, doc), ONE full-data exchange
    * (`repartition` on the hash), the (hash, doc) aggregate and the index
    * probe both riding that partitioning without re-exchange; only the
    * final per-doc rollup (rows already collapsed to one per (window,
    * doc)) exchanges again. The corpus index collapses to one row per
    * distinct window hash BEFORE the join (corpus text never crosses the
    * wire twice), and at real scale it is precomputable and reusable
    * across batches. Unlike [[decontaminateStream]]'s baked-set kernel,
    * the index here stays DISTRIBUTED — a 100 TB lake's window set does
    * not fit a broadcast, and the hash-partitioned join never asks it to. */
  def substringDupStatsAgainst(newDf: DataFrame, corpus: DataFrame,
                               idCol: String, textCol: String,
                               w: Int = 50, stride: Int = 25,
                               minCorpusDocs: Int = 1): DataFrame = {
    require(w > 0 && stride > 0, s"window/stride must be positive ($w/$stride)")
    require(minCorpusDocs >= 1,
      s"minCorpusDocs=$minCorpusDocs: membership needs >=1 corpus doc")
    // one row per distinct corpus window hash. minCorpusDocs == 1 needs no
    // per-doc counting at all; above it, collapse to (hash, doc) first so
    // the frequency count is over distinct docs without a distinct-agg
    // double exchange.
    val index =
      if (minCorpusDocs == 1)
        charWindows(corpus, idCol, textCol, w, stride)
          .select("__h").distinct()
      else
        charWindows(corpus, idCol, textCol, w, stride)
          .select("__h", "doc_id").distinct()
          .groupBy("__h").agg(count(lit(1)).as("__nd"))
          .filter(col("__nd") >= minCorpusDocs)
          .select("__h")
    val perHashDoc = charWindows(newDf, idCol, textCol, w, stride)
      .repartition(col("__h"))
      .groupBy("__h", "doc_id").agg(count(lit(1)).as("__c"))
    perHashDoc
      .join(index.withColumn("__dup", lit(1)), Seq("__h"), "left")
      .groupBy("doc_id")
      .agg(sum(col("__c")).as("n_windows"),
        sum(when(col("__dup").isNotNull, col("__c")).otherwise(lit(0L)))
          .as("n_dup_windows"))
      .withColumn("dup_frac",
        round(col("n_dup_windows").cast("double") /
          col("n_windows").cast("double"), 6))
  }

  /** Driver-resident SORTED distinct window-hash set of a reference
    * corpus — the baked-set input of the streaming substring scorer
    * ([[graft.streaming.Streaming.substringDupStream]]), guarded like
    * [[boilerplateHashes]]: a set past `maxHashes` must stay distributed
    * (use [[substringDupStatsAgainst]], hash-partitioned join shape), so
    * the collect fails loudly instead of ballooning the driver. */
  def substringWindowHashes(corpus: DataFrame, idCol: String,
                            textCol: String, w: Int = 50, stride: Int = 25,
                            maxHashes: Long = StripRelationalCutover): Array[Long] = {
    require(w > 0 && stride > 0, s"window/stride must be positive ($w/$stride)")
    require(maxHashes > 0 && maxHashes < Int.MaxValue.toLong,
      s"maxHashes must be in (0, Int.MaxValue), got $maxHashes")
    val capped = charWindows(corpus, idCol, textCol, w, stride)
      .select("__h").distinct()
      .limit(maxHashes.toInt + 1)
      .collect().map(_.getLong(0))
    require(capped.length <= maxHashes,
      s"substringWindowHashes: corpus window set exceeds maxHashes=$maxHashes " +
        "— a reference set this large must stay distributed, not baked " +
        "into a stream projection. Score batches with " +
        "substringDupStatsAgainst (hash-partitioned join shape), or raise " +
        "maxHashes deliberately if driver and executor memory allow.")
    capped.sorted
  }

  /** Strip new-batch documents whose corpus-duplicated-window fraction
    * exceeds `maxFrac`: the filter form of [[substringDupStatsAgainst]].
    * New docs shorter than `w` chars have no windows, hence no dup
    * evidence — KEPT, as in [[dropSubstringDups]]. */
  def dropSubstringDupsAgainst(newDf: DataFrame, corpus: DataFrame,
                               idCol: String, textCol: String,
                               maxFrac: Double = 0.5, w: Int = 50,
                               stride: Int = 25,
                               minCorpusDocs: Int = 1): DataFrame = {
    require(maxFrac >= 0.0 && maxFrac <= 1.0, s"maxFrac=$maxFrac out of [0,1]")
    val flagged = substringDupStatsAgainst(newDf, corpus, idCol, textCol,
        w, stride, minCorpusDocs)
      .filter(col("dup_frac") > maxFrac)
      .select(col("doc_id").as("__drop_id"))
    newDf.join(flagged, newDf(idCol) === col("__drop_id"), "left_anti")
  }

  // ------------------------------------------------------------ exact jaccard
  /** All pairs (i < j) with shingle-set Jaccard ≥ threshold, via an
    * inverted-index self-join: pairs are only generated for documents
    * sharing ≥1 shingle, so cost is Σ_shingle C(freq,2) instead of C(N,2).
    *
    * Hot shingles ("stop shingles" shared by more than `maxShingleFreq`
    * documents) are dropped — ON BY DEFAULT, because at corpus scale one
    * uncapped stop-shingle bucket materializes every sharing doc in a
    * single row and emits C(freq,2) pairs. The cap only lowers the
    * intersection count of pairs that share extremely common shingles
    * (standard stop-shingle pruning); corpora smaller than the cap are
    * unaffected. Dropped-bucket counts are published through
    * `Dataset.observe` under a per-invocation metric name
    * `graft_jaccard_buckets_<n>` (column `dropped_hot_buckets`) — zero
    * extra jobs, readable via a `QueryExecutionListener`. The suffix keeps
    * observed-metric names unique when one query plan combines several
    * jaccardPairs outputs (Spark's CheckAnalysis rejects duplicate metric
    * names in a plan). Pass `maxShingleFreq = None` only for small-corpus
    * exact runs.
    *
    * Even exact mode is not unguarded: a single corpus-wide stop shingle
    * at 100k rows would build one collect_list bucket of 100k entries and
    * stream C(100k,2) ≈ 5·10^9 pairs through ONE task. The `None` path
    * therefore carries a hard `exactBucketCeiling`: any bucket larger than
    * it THROWS at runtime (scan-side `assert_true`, no extra job) with
    * guidance, so the worst case is a loud failure, never an OOM-shaped
    * runaway task. Exactness below the ceiling is untouched.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxShingleFreq: Option[Int] = Some(1000),
                   observeName: Option[String] = None,
                   exactBucketCeiling: Int = 10000): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("sh_size", size(col("sh")).cast("long"))
    // invert on the 64-bit shingle hash, not the string: ~4× smaller
    // exchange payload; xxhash64 collisions across the ≲10^9-shingle scale
    // are ≪1e-9-probable and would only perturb one intersection count by 1
    val inv = sh.select(col("id"), col("sh_size"), explode(col("sh")).as("sh_str"))
      .select(col("id"), col("sh_size"), xxhash64(col("sh_str")).as("shingle"))
    // bucket per shingle (ONE exchange), then generate each bucket's (i<j)
    // pairs with the compiled PairCombinations kernel — no shuffle
    // self-join. Hot-shingle buckets ("stop shingles") are droppable via
    // maxShingleFreq, which also bounds the per-bucket pair blowup.
    val buckets0 = inv.groupBy("shingle")
      .agg(collect_list(struct(col("id"), col("sh_size"))).as("docs"))
    val buckets = maxShingleFreq match {
      // metric name: explicit via observeName for pipelines whose listeners
      // key on an exact name; otherwise a per-invocation counter suffix
      // (observe() names must be unique within a session)
      case Some(cap) => buckets0
        .observe(observeName.getOrElse(
            s"graft_jaccard_buckets_${Dedup.observeId.getAndIncrement()}"),
          sum(when(size(col("docs")) > cap, lit(1L)).otherwise(lit(0L)))
            .as("dropped_hot_buckets"))
        .filter(size(col("docs")) <= cap)
      case None => buckets0
        .withColumn("__guard", assert_true(
          size(col("docs")) <= exactBucketCeiling,
          concat(lit("graft exact-Jaccard bucket overflow: a shingle is " +
              "shared by "), size(col("docs")),
            lit(s" documents (> exactBucketCeiling=$exactBucketCeiling); " +
              "exact all-pairs would emit C(f,2) pairs in one task. Use " +
              "the maxShingleFreq stop-shingle cap, MinHash-LSH, or raise " +
              "exactBucketCeiling deliberately."))))
        .filter(col("__guard").isNull).drop("__guard")
    }
    // PairGenerator streams each bucket's (i<j) pairs row-at-a-time (an
    // explode-analog Generator): per-bucket memory stays O(docs), not
    // O(docs²) — at the 1000-doc cap the materialized-array form held
    // ~500k structs in one row
    val pairs = buckets
      .filter(size(col("docs")) > 1)
      .select(graft.expressions.GraftExpressions.pairGenerator(col("docs")))
      .toDF("i", "j", "si", "sj")
    pairs
      .groupBy("i", "j", "si", "sj")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("si") + col("sj") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------- cross-corpus (incremental)
  /** Exact dedup of a NEW batch against an EXISTING corpus — the everyday
    * training-pipeline operation: "which of today's documents already
    * exist in the lake?". One row per new document that has at least one
    * exact corpus match: (i = new id, j = smallest matching corpus id,
    * n_corpus_matches).
    *
    * 100 TB shape: the corpus reduces to one (hash → min id, count) row
    * per DISTINCT text before the join — a hash-only aggregate shuffle,
    * never text — and the (typically much smaller) new batch joins that;
    * AQE broadcasts the reduced side when it fits. Corpus×corpus pairs
    * are never formed. */
  def exactAgainst(newDf: DataFrame, corpus: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val nh = newDf.select(col(idCol).as("i"), md5(col(textCol)).as("__h"))
    val ch = corpus.select(col(idCol).as("__cid"), md5(col(textCol)).as("__h"))
      .groupBy("__h")
      .agg(min("__cid").as("j"), count(lit(1)).as("n_corpus_matches"))
    nh.join(ch, "__h").select("i", "j", "n_corpus_matches")
  }

  // ------------------------------------------- membership sketches (Bloom)
  /** Per-slice mergeable Bloom membership sketches over document content
    * — the bounded artifact that makes EXACT incremental dedup cheap at
    * lake scale: each ingest batch (or corpus partition) summarizes its
    * content-hash set into a ~1.2 bytes/key filter, filters union
    * bit-for-bit ([[mergeMembershipSketches]]), and later batches probe
    * the union scan-side with zero corpus access
    * ([[exactAgainstBloom]] / [[dropSketchMembers]]). The membership
    * counterpart of the corpus-stats sketch trio (Misra–Gries / HLL /
    * KLL), built on Spark's native tree-aggregated
    * `BloomFilterAggregate` over `xxhash64(text)` (the key
    * [[graft.pipelines.Crawl.skipExistingBloom]] also uses).
    *
    * Every sketch in a future merge set MUST be built with the same
    * (`expectedKeysPerSlice`, `fpp`) — geometry is derived from them,
    * and a mismatched union throws (see
    * [[graft.expressions.BloomUnion]]). Returns
    * (slice, sketch BINARY, n_docs). */
  def membershipSketch(df: DataFrame, textCol: String, sliceCol: Column,
                       expectedKeysPerSlice: Long = 1000000L,
                       fpp: Double = 0.01): DataFrame =
    df.groupBy(sliceCol.as("slice"))
      .agg(graft.expressions.GraftExpressions
          .bloomSketch(xxhash64(col(textCol)), expectedKeysPerSlice, fpp)
          .as("sketch"),
        count(lit(1)).as("n_docs"))

  /** Union stored membership sketches into one filter. Bloom union is
    * EXACT — inserting a key sets a deterministic bit pattern, so the
    * merged filter is bit-for-bit the one a single pass over all slices
    * would build (asserted in DedupSpec); the no-false-negative
    * guarantee survives arbitrary merge trees. One bounded-size row
    * out: (sketch, n_docs). */
  def mergeMembershipSketches(sketches: DataFrame): DataFrame =
    sketches.agg(graft.expressions.GraftExpressions
        .bloomUnion(col("sketch")).as("sketch"),
      sum(col("n_docs")).as("n_docs"))

  /** [[exactAgainst]] with a broadcast Bloom pre-route — IDENTICAL
    * result for any `fpp` (the filter only routes rows, it never
    * decides membership): new documents the filter rejects are
    * DEFINITELY absent from the corpus and skip the join entirely with
    * zero shuffle; only the might-contain residue (true dups + the fpp
    * fraction of false positives) reaches the exact hash join. At lake
    * scale this is the difference between shuffling today's whole crawl
    * against the corpus hash table and shuffling just the ~dup-rate
    * sliver of it. */
  def exactAgainstBloom(newDf: DataFrame, corpus: DataFrame, idCol: String,
                        textCol: String, sketch: Array[Byte]): DataFrame = {
    require(sketch != null && sketch.nonEmpty,
      "exactAgainstBloom: empty sketch — build one with membershipSketch/" +
        "mergeMembershipSketches over the corpus first")
    exactAgainst(
      newDf.filter(graft.expressions.GraftExpressions
        .bloomMightContain(lit(sketch), xxhash64(col(textCol)))),
      corpus, idCol, textCol)
  }

  /** Serving-mode APPROXIMATE dedup against a reference that is not
    * available (only its membership sketch is): keep documents whose
    * content is DEFINITELY not in the reference. Never keeps a true
    * duplicate (Bloom has no false negatives); drops ~`fpp` of
    * genuinely-new documents as collateral — the documented trade for
    * needing zero reference access. Scan-side, zero shuffle. */
  def dropSketchMembers(df: DataFrame, textCol: String,
                        sketch: Array[Byte]): DataFrame = {
    require(sketch != null && sketch.nonEmpty,
      "dropSketchMembers: empty sketch — build one with membershipSketch/" +
        "mergeMembershipSketches over the reference first")
    df.filter(!graft.expressions.GraftExpressions
      .bloomMightContain(lit(sketch), xxhash64(col(textCol))))
  }

  /** n-gram Jaccard of each NEW document against an EXISTING corpus via a
    * BIPARTITE inverted index: corpus documents post their hashed shingles
    * once, new documents probe the postings — the candidate space is
    * new×corpus only (cost Σ_shingle newFreq·corpusFreq), and corpus
    * self-pairs never exist. Returns (i = new id, j = corpus id, jaccard)
    * for every cross pair ≥ threshold.
    *
    * The hot-shingle cap prunes stop-shingle POSTING LISTS on the corpus
    * side (same rationale and `Dataset.observe` contract as
    * [[jaccardPairs]]: a shingle shared by more than `maxShingleFreq`
    * corpus docs is dropped, bounding the per-shingle probe fan-out at any
    * corpus size); the per-list count rides the SAME shuffle the probe
    * join needs (a partition-local window over `shingle`), so the cap
    * costs no extra exchange.
    *
    * The exact (`maxShingleFreq = None`) path carries the same hard
    * `exactBucketCeiling` as [[jaccardPairs]]: a posting list longer than
    * the ceiling THROWS with guidance instead of fanning every probe out
    * against an unbounded stop-shingle list. */
  def jaccardPairsAgainst(newDf: DataFrame, corpus: DataFrame, idCol: String,
                          textCol: String, n: Int = 3,
                          threshold: Double = 0.5,
                          maxShingleFreq: Option[Int] = Some(1000),
                          observeName: Option[String] = None,
                          exactBucketCeiling: Int = 10000): DataFrame = {
    def inverted(df: DataFrame): DataFrame = {
      val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
        .withColumn("sh_size", size(col("sh")).cast("long"))
      sh.select(col("id"), col("sh_size"), explode(col("sh")).as("s"))
        .select(col("id"), col("sh_size"), xxhash64(col("s")).as("shingle"))
    }
    val probe = inverted(newDf)
      .select(col("shingle"), col("id").as("i"), col("sh_size").as("si"))
    val post0 = inverted(corpus)
      .select(col("shingle"), col("id").as("j"), col("sh_size").as("sj"))
    val postings = maxShingleFreq match {
      case Some(cap) =>
        val w = Window.partitionBy("shingle")
        post0.withColumn("__f", count(lit(1)).over(w))
          .observe(observeName.getOrElse(
              s"graft_jaccard_postings_${Dedup.observeId.getAndIncrement()}"),
            sum(when(col("__f") > cap, lit(1L)).otherwise(lit(0L)))
              .as("dropped_hot_postings"))
          .filter(col("__f") <= cap).drop("__f")
      case None =>
        val w = Window.partitionBy("shingle")
        post0.withColumn("__f", count(lit(1)).over(w))
          .withColumn("__guard", assert_true(
            col("__f") <= exactBucketCeiling,
            concat(lit("graft exact-Jaccard posting overflow: a shingle " +
                "posts "), col("__f"),
              lit(s" corpus documents (> exactBucketCeiling=" +
                s"$exactBucketCeiling); every probe would fan out against " +
                "the full list. Use the maxShingleFreq stop-shingle cap, " +
                "minhashLshAgainst, or raise exactBucketCeiling " +
                "deliberately."))))
          .filter(col("__guard").isNull).drop("__guard", "__f")
    }
    probe.join(postings, "shingle")
      .groupBy("i", "j", "si", "sj")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("si") + col("sj") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash-LSH near-dup of a NEW batch against an EXISTING corpus:
    * band-bucket join between the two signature sets (new×corpus
    * candidate space only), then signature-estimated Jaccard ≥ threshold.
    * The corpus side's signatures are a pure function of its text — at
    * scale, persist [[minhashSignatures]]' (id, signature) table once and
    * pass it as `corpus` with `precomputedSignatures = true` (idCol/
    * textCol then only describe the NEW batch). */
  def minhashLshAgainst(newDf: DataFrame, corpus: DataFrame, idCol: String,
                        textCol: String, n: Int = 3, k: Int = 64,
                        bands: Int = 16, threshold: Double = 0.5,
                        precomputedSignatures: Boolean = false): DataFrame = {
    val rows = k / bands
    val newSigs = minhashSignatures(newDf, idCol, textCol, n, k)
      .repartition(col("id"))
    val corpusSigs = (if (precomputedSignatures)
        corpus.select(col("id"), col("signature"))
      else minhashSignatures(corpus, idCol, textCol, n, k))
      .repartition(col("id"))
    def banded(sigs: DataFrame): DataFrame =
      sigs.select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(array_join(
            transform(slice(col("signature"), b * rows + 1, lit(rows)),
              h => h.cast("string")), ",")))
      ).as(Seq("band", "bucket")))
    val cands = banded(newSigs).select(col("band"), col("bucket"), col("id").as("i"))
      .join(banded(corpusSigs).select(col("band"), col("bucket"), col("id").as("j")),
        Seq("band", "bucket"))
      .select("i", "j").distinct()
    val s1 = newSigs.select(col("id").as("i"), col("signature").as("sig_i"))
    val s2 = corpusSigs.select(col("id").as("j"), col("signature").as("sig_j"))
    cands.join(s1, "i").join(s2, "j")
      .withColumn("est_jaccard", graft.expressions.GraftExpressions
        .signatureAgreement(col("sig_i"), col("sig_j")))
      .filter(col("est_jaccard") >= threshold)
      .select("i", "j", "est_jaccard")
  }

  /** Embedding-cosine near-dup of a NEW batch against an EXISTING corpus
    * (the vector counterpart of [[jaccardPairsAgainst]]): candidate pairs
    * come from a BIPARTITE hyperplane-LSH bucket join — both sides sign
    * with the same deterministic hyperplanes, buckets join new×corpus
    * only — then exact cosine verifies ≥ threshold, so there are never
    * false pairs and corpus self-pairs never exist. Corpora up to
    * `autoLshMinRows` skip LSH and verify the full new×corpus cross
    * directly (exact small-side mode, same auto contract as
    * [[embeddingNearDup]]). Returns (i = new id, j = corpus id, sim). */
  def embeddingNearDupAgainst(newDf: DataFrame, corpus: DataFrame,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding",
                              threshold: Double = 0.9,
                              useLsh: Option[Boolean] = None,
                              nPlanes: Int = 12, nTables: Int = 8,
                              autoLshMinRows: Long = 20000L): DataFrame = {
    import graft.expressions.GraftExpressions.cosineSimilarity
    val nv = newDf.select(col(idCol).as("i"),
      col(vecCol).cast("array<double>").as("va"))
    val cv = corpus.select(col(idCol).as("j"),
      col(vecCol).cast("array<double>").as("vb"))
    val lsh = useLsh.getOrElse {
      if (autoLshMinRows + 1 > Int.MaxValue.toLong)
        corpus.count() > autoLshMinRows
      else corpus.limit((autoLshMinRows + 1).toInt).count() > autoLshMinRows
    }
    val cands =
      if (!lsh) nv.select("i").crossJoin(cv.select("j"))
      else {
        def signed(df: DataFrame, out: String) = df.select(col(out), posexplode(
            graft.expressions.GraftExpressions.hyperplaneSignatures(
              col(if (out == "i") "va" else "vb"), nPlanes, nTables))
          .as(Seq("table", "sig")))
        signed(nv, "i").join(signed(cv, "j"), Seq("table", "sig"))
          .select("i", "j").distinct()
      }
    // no i =!= j filter: newDf and corpus are independent tables, so equal
    // ids across them are legitimate cross pairs (e.g. a re-ingested doc
    // keyed by a stable id) — matching exactAgainst/jaccardPairsAgainst/
    // minhashLshAgainst; the bipartite join already prevents self-pairs
    cands
      .join(nv, "i").join(cv, "j")
      .select(col("i"), col("j"), cosineSimilarity(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("i"), col("j"), round(col("sim"), 6).as("sim"))
  }

  /** Greedy cluster-to-representative reduction of a pair list: every doc
    * connected to a smaller id is dropped (one pass — for full transitive
    * closure iterate [[connectedComponents]]). */
  def dropDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("j").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Connected components over dup pairs via min-label propagation with
    * pointer doubling. Returns (id, component) where component = min id
    * reachable.
    *
    * Each round does (a) a one-hop neighbor min and (b) a pointer jump
    * `comp := comp(comp)` — the label a node holds is itself a node id, so
    * looking up THAT node's label shortcuts the chain. The reachable
    * distance covered grows as d' = 2d + 2 per round, so a duplicate chain
    * of diameter D converges in O(log D) rounds (diameter 62 in 5), where
    * plain one-hop propagation needs D rounds — the difference between a
    * bounded loop and silent truncation on the >10-hop drifting-template
    * chains web corpora produce at 100 TB.
    *
    * An unconverged exit can never return silently: if labels still moved
    * at `maxIter`, this THROWS with the iteration budget in the message.
    * With pointer doubling the default budget covers diameters past 2^10,
    * so hitting it means something is genuinely wrong with the input, and
    * truncated closures must not masquerade as a clean dedup.
    *
    * One Spark job per round: the changed-label count rides the round's
    * own checkpoint materialization as a `Dataset.observe` metric (the
    * old label is carried through the jump join and compared in-flight),
    * instead of a separate join-and-count convergence job. Superseded
    * per-round checkpoint blocks (and the edge list's, once the result
    * is consumed) are reclaimed by the ContextCleaner as their RDDs go
    * out of reference — Dataset exposes no direct unpersist handle for
    * localCheckpoint storage. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // materialize the (often expensive) pair-producing subtree ONCE: every
    // round references `edges` from inside its join, so an unmaterialized
    // plan would re-run LSH/inverted-index pair generation per round —
    // the recompute bug class PlanShapeSpec polices, measured at ~4× on
    // dedup_components before this checkpoint
    val edges = ccEdges(pairs).localCheckpoint(eager = true)
    var labels = edges.select(col("i").as("id"))
      .union(edges.select(col("j").as("id"))).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(eager = true)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      val obs = org.apache.spark.sql.Observation()
      val next = ccRound(labels, edges, obs).localCheckpoint(eager = true)
      // the eager checkpoint has already run the job, so the metric
      // arrives with the (asynchronous) query-completion event moments
      // later; a bounded Await turns a lost listener event into a loud
      // TimeoutException instead of an unbounded obs.get() hang
      changed = scala.concurrent.Await
        .result(obs.future, scala.concurrent.duration.Duration(300, "s"))
        .getAs[Long]("moved") > 0L
      labels = next.select(col("id"), col("comp"))
      iter += 1
    }
    require(!changed,
      s"connectedComponents did not converge within maxIter=$maxIter " +
        "iterations: labels were still moving, so the returned components " +
        "would be silently truncated. Raise maxIter (pointer doubling " +
        "covers diameter ~2^maxIter) or inspect the pair list for " +
        "pathological structure.")
    lastRounds = iter
    labels
  }

  /** Incremental transitive closure — [[connectedComponents]]'
    * steady-state form for a growing corpus: compose YESTERDAY's
    * labels (as star edges id—comp, which compress every old component
    * to diameter ≤ 2) with only the NEW pair list, so the closure
    * re-runs over |new pairs| + |old nodes| star edges in O(1)
    * pointer-doubling rounds instead of re-deriving and re-closing the
    * full pair history — the same maintenance contract as
    * [[graft.llm.Graph.pageRank]]'s `ranks0` and
    * [[graft.llm.Similarity.extendVectorIndex]].
    *
    * EXACTNESS: the result equals
    * `connectedComponents(oldPairs ∪ newPairs)` whenever
    * `labels0 = connectedComponents(oldPairs)` — star compression
    * preserves the partition (every old member reaches its hub in one
    * hop) AND the min-label convention (old comp labels are min ids;
    * a merged component's min is the min of its parts' mins, reachable
    * through the hubs). Oracle-proven against the full-history
    * recursive-CTE twin. */
  def connectedComponentsIncremental(newPairs: DataFrame,
                                     labels0: DataFrame,
                                     maxIter: Int = 10): DataFrame =
    connectedComponents(
      newPairs.select(col("i"), col("j")).unionByName(
        labels0.select(col("id").as("i"), col("comp").as("j"))), maxIter)

  /** The LSH tuning S-curve — P(candidate | jaccard = s) for a
    * `bands × rows` MinHash banding: `p_band = s^rows`,
    * `p_detect = 1 − (1 − s^rows)^bands`. The operator that CONFIGURES
    * the dedup family (the eval-gates pattern): the detection knee sits
    * near `(1/bands)^(1/rows)` — ≈ 0.5 for the default 16 × 4 over
    * k = 64 — so choosing bands/rows is reading this curve against the
    * intended threshold, not folklore. One range scan, driver-free.
    *
    * Cross-engine discipline: every power is a LEFT-ASSOCIATED
    * multiply chain (libm `pow` differs by ulps between engines — the
    * PlatformLog lesson; explicit chains are bit-identical), so the
    * twin hash-matches on raw doubles. */
  def lshTuningCurve(spark: SparkSession, bands: Int = 16, rows: Int = 4,
                     gridPoints: Int = 100): DataFrame = {
    require(bands >= 1 && rows >= 1 && bands * rows <= 4096,
      s"lshTuningCurve: bands=$bands rows=$rows out of range")
    require(gridPoints >= 1 && gridPoints <= 100000,
      s"lshTuningCurve: gridPoints=$gridPoints out of range")
    val s = col("id").cast("double") / gridPoints
    val pBand = (1 until rows).foldLeft(s)((acc, _) => acc * s)
    val q = lit(1.0) - pBand
    val pMiss = (1 until bands).foldLeft(q)((acc, _) => acc * q)
    spark.range(0, gridPoints + 1L)
      .select(s.as("s"), pBand.as("p_band"),
        (lit(1.0) - pMiss).as("p_detect"))
  }

  /** Diagnostic: pointer-doubling rounds the LAST [[connectedComponents]]
    * call on this JVM ran (driver-side loop, so a plain var suffices for
    * the scale probe's O(log D) round-count evidence; not part of the
    * operator contract). */
  @volatile private[graft] var lastRounds: Int = 0

  /** Undirected edge list for [[connectedComponents]] (both orientations
    * of every pair) — factored so the per-round plan-shape guard builds
    * the exact production shape. */
  private[graft] def ccEdges(pairs: DataFrame): DataFrame =
    pairs.select(col("i"), col("j"))
      .unionByName(pairs.select(col("j").as("i"), col("i").as("j")))

  /** ONE pointer-doubling round of [[connectedComponents]], pre-
    * checkpoint — factored out so PlanShapeSpec asserts the round's
    * executed plan (the duplicated one-hop aggregate must come back as
    * a ReusedExchange, not run twice) against the exact plan production
    * runs.
    *
    * (a) one-hop: take the min label across self and all neighbors,
    * keeping the pre-round label alongside (only the self row carries
    * it; min() skips the neighbor rows' nulls) so convergence is decided
    * without a second pass over `labels`.
    *
    * (b) pointer jump: comp is itself a node id with a row in oneHop
    * (labels only ever hold reachable node ids), so an inner self-join
    * resolves comp -> comp(comp); least() keeps min-monotonicity
    * explicit. The join's build side is a FRESH oneHop() plan instance
    * (not the same Dataset object): both sides still read the one
    * checkpointed `labels` leaf, but distinct attribute ids sidestep the
    * analyzer's self-join dedup on unioned-grouped plans. The two
    * instances canonicalize identically, so the aggregate's exchange
    * executes once and the second read is an AQE ReusedExchange — the
    * plan-guarded property; without it every round pays the heaviest
    * aggregate twice.
    *
    * ONE Spark job per round: the changed-row count rides the round's
    * checkpoint materialization as a `Dataset.observe` metric (min
    * labels only ever decrease, so comp < old IS "this row moved") — no
    * separate join-and-count convergence job, and the eager checkpoint
    * keeps per-round lineage constant-depth. */
  private[graft] def ccRound(labels: DataFrame, edges: DataFrame,
                             obs: org.apache.spark.sql.Observation)
      : DataFrame = {
    def oneHop() = labels.select(col("id"), col("comp"), col("comp").as("old"))
      .unionByName(edges.join(labels, edges("j") === labels("id"))
        .select(edges("i").as("id"), col("comp"),
          lit(null).cast("long").as("old")))
      .groupBy("id").agg(min("comp").as("comp"), min("old").as("old"))
    oneHop()
      .join(oneHop().select(col("id").as("hid"), col("comp").as("hcomp")),
        col("comp") === col("hid"))
      .select(col("id"), least(col("comp"), col("hcomp")).as("comp"),
        col("old"))
      .observe(obs, sum(when(col("comp") < col("old"), 1L).otherwise(0L))
        .as("moved"))
  }

  /** Full near-dup corpus dedup: find pairs (EXACT Jaccard below
    * `exactCorpusLimit` rows — the hot-shingle cap is disabled there, so
    * "exact" means exact, while [[jaccardPairs]]' `exactBucketCeiling`
    * still turns a corpus-wide stop shingle into a loud error rather than
    * a C(f,2) runaway task; MinHash-LSH above), cluster them transitively,
    * keep each cluster's min-id representative. Returns (cleanedDf, stats).
    * The full `df.count()` is not a probe overhead: the stats contract
    * needs `total` regardless, and mode selection rides the same number. */
  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double = 0.8, n: Int = 3,
                  exactCorpusLimit: Long = 100000): (DataFrame, Map[String, Long]) = {
    val total = df.count()
    val pairs =
      if (total <= exactCorpusLimit)
        jaccardPairs(df, idCol, textCol, n, threshold,
          maxShingleFreq = None).select("i", "j")
      else
        minhashLsh(df, idCol, textCol, n, threshold = threshold).select("i", "j")
    val comps = connectedComponents(pairs)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    val cleaned = df.join(losers, Seq(idCol), "left_anti")
    val kept = cleaned.count()
    (cleaned, Map("total" -> total, "kept" -> kept, "removed" -> (total - kept)))
  }

  /** Incremental corpus-dedup facade — drop NEW documents that
    * near-duplicate the EXISTING corpus: the text-level counterpart of
    * [[graft.llm.Similarity.semanticDedupAgainst]], composing the
    * *Against pair operators the way [[dedupCorpus]] composes the
    * self-dedup ones. EXACT bipartite inverted-index Jaccard while the
    * corpus fits `exactCorpusLimit` — the hot-shingle posting cap is
    * disabled in that branch (a capped posting list undercounts `inter`
    * while `si`/`sj` stay full-size, which can let near-duplicates
    * dominated by corpus-hot shingles survive), so "exact" means exact —
    * MinHash-LSH banding above it. Mode selection probes the corpus with
    * `limit(exactCorpusLimit + 1).count()` (the
    * [[embeddingNearDupAgainst]] discipline): at the scale where the
    * answer is "use LSH", a full corpus count just to learn that is a
    * wasted scan. No transitive closure is needed — corpus membership IS
    * the verdict, so the decision is per-new-row (one anti-join). Returns
    * the cleaned new batch plus the same stats map as [[dedupCorpus]]. */
  def dedupCorpusAgainst(newDf: DataFrame, corpus: DataFrame,
                         idCol: String, textCol: String,
                         threshold: Double = 0.8, n: Int = 3,
                         exactCorpusLimit: Long = 100000)
      : (DataFrame, Map[String, Long]) = {
    require(exactCorpusLimit < Int.MaxValue.toLong, "exactCorpusLimit must fit an Int")
    val corpusSmall =
      corpus.limit(exactCorpusLimit.toInt + 1).count() <= exactCorpusLimit
    val pairs =
      if (corpusSmall)
        jaccardPairsAgainst(newDf, corpus, idCol, textCol, n, threshold,
          maxShingleFreq = None)
      else
        minhashLshAgainst(newDf, corpus, idCol, textCol, n,
          threshold = threshold)
    val dup = pairs.select(col("i").as(idCol)).distinct()
    val total = newDf.count()
    val cleaned = newDf.join(dup, Seq(idCol), "left_anti")
    val kept = cleaned.count()
    (cleaned,
      Map("total" -> total, "kept" -> kept, "removed" -> (total - kept)))
  }

  /** Quality-aware canonical-document selection after near-dup clustering:
    * collapse every transitive duplicate cluster of `pairs` to the single
    * member with the HIGHEST `score` (ties to the smallest id, so the
    * result is deterministic under any partitioning), and pass unclustered
    * documents through untouched. This is the keep-the-best complement to
    * [[dedupCorpus]]'s keep-the-min-id policy — real pipelines keep the
    * longest / highest-quality member of a duplicate cluster, not an
    * arbitrary one (cf. the reference's version dedup keeping the LATEST
    * row per key, documents.py:61).
    *
    * Returns `df`'s columns plus `comp` (the cluster label — min reachable
    * id, or the doc's own id for singletons) and `cluster_size`.
    *
    * Shuffle shape at 100 TB: the component table holds ONLY docs that
    * appear in a dup pair. Its row count is read off the already-
    * checkpointed closure result (cheap — no recompute), and below
    * `broadcastLabelLimit` (default 10M labels ≈ 160 MB) BOTH corpus-side
    * joins (inner for clustered docs, anti for singletons) get an explicit
    * broadcast hint — without it the checkpoint leaf has no stats, the
    * planner picks a sort-merge join, and even AQE's BHJ rescue still
    * pays a full-corpus shuffle WRITE. Above the limit the hint is
    * withheld (a pathologically clustered corpus must not OOM the
    * executors) and the joins co-shuffle on id. The representative choice
    * shuffles only the clustered slice, on `comp`, and the rank-1 filter
    * is pushed to the map side as a WindowGroupLimit (plan-guarded in
    * PlanShapeSpec, like [[graft.llm.Similarity.knnLabelVote]]'s).
    * Cluster sizes ride the already-tiny (id, comp) table, not the
    * corpus. */
  def keepClusterRepresentative(df: DataFrame, idCol: String, score: Column,
                                pairs: DataFrame, maxIter: Int = 10,
                                broadcastLabelLimit: Long = 10000000L)
      : DataFrame = {
    val comps0 = connectedComponents(pairs, maxIter)
    val comps =
      if (comps0.count() <= broadcastLabelLimit) broadcast(comps0) else comps0
    val sizes = comps.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    val clustered = df.join(comps.withColumnRenamed("id", idCol), Seq(idCol))
    val w = Window.partitionBy(col("comp"))
      .orderBy(score.desc, col(idCol).asc)
    val reps = clustered
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
      .join(sizes, Seq("comp"))
    val singletons = df
      .join(comps.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      .withColumn("comp", col(idCol))
      .withColumn("cluster_size", lit(1L))
    reps.unionByName(singletons.select(reps.columns.map(col): _*))
  }

  // ------------------------------------------------------------ minhash
  /** Deterministic seed list for the signature hash family. */
  private def seeds(k: Int): Seq[Int] = (0 until k).map(i => 0x9e3779b9 + i * 0x85ebca6b)

  /** MinHash signatures: k permutation-mins per document, computed by the
    * native [[graft.expressions.GraftExpressions.MinHashSignature]] Catalyst
    * expression — one compiled pass per row, ZERO shuffle, cost independent
    * of k·|shingles| interpretation overhead. At 100 TB this runs entirely
    * inside the scan stage. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, k: Int = 64): DataFrame =
    df.select(col(idCol).as("id"),
      graft.expressions.GraftExpressions
        .minhashSignature(shingles(col(textCol), n), k).as("signature"))

  /** LSH banding: (band, hash-of-band-rows) buckets; docs sharing a bucket
    * are candidate pairs. bands×rows must equal the signature length.
    *
    * The signature column is referenced by the banding lambda (per band)
    * AND by both sides of the candidate self-join; without a
    * materialization boundary Catalyst inlines (= recomputes) the whole
    * signature fold per reference. The boundary is therefore enforced HERE,
    * idempotently: if the incoming plan already ends in a repartition (as
    * [[minhashLsh]]'s does), it is reused — no second exchange — otherwise
    * a `repartition(id)` is inserted so direct callers get the
    * compute-once plan too (the self-join then shows ReusedExchange). */
  def lshCandidates(signatures: DataFrame, bands: Int = 16, rows: Int = 4): DataFrame = {
    val bounded = signatures.queryExecution.logical match {
      case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation =>
        signatures
      case _ => signatures.repartition(col("id"))
    }
    val banded = bounded.select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(array_join(
            transform(slice(col("signature"), b * rows + 1, lit(rows)),
              h => h.cast("string")), ",")))
      ).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("id").as("i"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("j"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** Estimated Jaccard from signature agreement, for candidate filtering.
    * The agreement fraction is the compiled
    * [[graft.expressions.GraftExpressions.SignatureAgreement]] expression
    * (participates in whole-stage codegen) — semantically identical to the
    * interpreted `size(filter(zip_with(..)))/size(..)` column stack it
    * replaced (parity-tested in ExpressionsSpec). */
  def estimateJaccard(signatures: DataFrame, candidates: DataFrame): DataFrame = {
    val s1 = signatures.select(col("id").as("i"), col("signature").as("sig_i"))
    val s2 = signatures.select(col("id").as("j"), col("signature").as("sig_j"))
    candidates.join(s1, "i").join(s2, "j")
      .withColumn("est_jaccard", graft.expressions.GraftExpressions
        .signatureAgreement(col("sig_i"), col("sig_j")))
      .select("i", "j", "est_jaccard")
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → bucket candidates →
    * signature-estimated Jaccard ≥ threshold. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
                 k: Int = 64, bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    // repartition = deliberate materialization boundary: the banding and
    // both estimate-join sides reference the signature column; without a
    // boundary Catalyst would inline (= recompute) the signature expression
    // per reference, and with one the single exchange is deduplicated by
    // ReusedExchange across all three consumers
    val sigs = minhashSignatures(df, idCol, textCol, n, k).repartition(col("id"))
    val cands = lshCandidates(sigs, bands, k / bands)
    estimateJaccard(sigs, cands).filter(col("est_jaccard") >= threshold)
  }

  // ------------------------------------------------------------ simhash
  /** 64-bit SimHash over shingle hashes: bit i of the signature is the sign
    * of Σ_shingles (±1 per shingle depending on bit i of its hash).
    * Native [[graft.expressions.GraftExpressions.SimHash64]] expression —
    * one compiled pass per row, ZERO shuffle, runs inside the scan stage at
    * any scale. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
      graft.expressions.GraftExpressions
        .simhash64(shingles(col(textCol), n)).as("simhash"))

  // ------------------------------------------------------------ embeddings
  /** Embedding-cosine near-duplicate pairs: all (i<j) with cosine ≥
    * threshold.
    *
    * MODE SELECTION DEFAULTS TO AUTO: corpora up to `autoLshMinRows` rows
    * are scored exactly (all-pairs — quadratic but cheap at that size and
    * oracle-exact); anything larger automatically switches to the
    * random-hyperplane LSH pre-filter, which buckets candidates and scores
    * only collisions — the 100 TB path, where all-pairs is not runnable.
    * The auto probe is `limit(autoLshMinRows+1).count()`: per-partition
    * work is bounded at the limit (LocalLimit caps each partition's scan;
    * there is no cross-partition short-circuit), which is the right
    * trade-off when `df` is an expensive derived pipeline. Callers passing
    * a RAW parquet-backed frame may prefer `useLsh = Some(..)`: for those,
    * a plain `count()` is a metadata-only job that the limit-probe
    * forgoes. When `autoLshMinRows + 1` exceeds Int.MaxValue (limit()'s
    * domain), the probe falls back to a full `count()` rather than
    * silently capping — the exact mode must never be auto-selected for an
    * arbitrarily large corpus. Pass `useLsh = Some(..)` to skip the probe
    * and force a mode (mirrors [[dedupCorpus]]'s exact/LSH cutover for
    * Jaccard).
    */
  def embeddingNearDup(df: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding", threshold: Double = 0.9,
                       useLsh: Option[Boolean] = None, nPlanes: Int = 12,
                       nTables: Int = 8,
                       autoLshMinRows: Long = 20000L): DataFrame = {
    import graft.expressions.GraftExpressions.cosineSimilarity
    val vecs = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val lsh = useLsh.getOrElse {
      if (autoLshMinRows + 1 > Int.MaxValue.toLong) df.count() > autoLshMinRows
      else df.limit((autoLshMinRows + 1).toInt).count() > autoLshMinRows
    }
    val pairs = if (lsh) {
      graft.llm.Similarity.lshBucketCandidates(df, nPlanes, nTables,
        idCol, vecCol)
    } else {
      val a = vecs.select(col("id").as("i"))
      val b = vecs.select(col("id").as("j"))
      a.crossJoin(b).filter(col("i") < col("j"))
    }
    val va = vecs.select(col("id").as("i"), col("v").as("va"))
    val vb = vecs.select(col("id").as("j"), col("v").as("vb"))
    pairs.join(va, "i").join(vb, "j")
      .select(col("i"), col("j"), cosineSimilarity(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("i"), col("j"), round(col("sim"), 6).as("sim"))
  }

  /** SimHash near-dup of a NEW batch against an EXISTING corpus — the
    * signature-domain counterpart of [[jaccardPairsAgainst]] /
    * [[minhashLshAgainst]]: bipartite 16-bit chunk-band join
    * (pigeonhole-complete for hamming ≤ 3 with 4 chunks), then the exact
    * hamming filter. Candidate space is new×corpus band collisions only —
    * never either side squared. Both inputs are (id, simhash) tables from
    * [[simhashSignatures]]; the corpus side's signatures are a pure
    * function of its text, so at scale persist them once and reuse across
    * arriving batches. Returns (i = new id, j = corpus id, hamming).
    * Sides are distinct corpora by contract (callers key by a stable id);
    * an id appearing on both sides is a legitimate cross-corpus pair,
    * matching the *Against family's discipline. */
  def simhashNearPairsAgainst(newSigs0: DataFrame, corpusSigs0: DataFrame,
                              maxHamming: Int = 3): DataFrame = {
    def chunksOf(sigs0: DataFrame, idOut: String,
                 shOut: String): DataFrame =
      // materialization boundary, as in simhashNearPairs: the 4 chunk
      // expressions would otherwise each recompute the signature fold
      sigs0.repartition(col("id")).select(col("id"), col("simhash"),
          posexplode(array((0 until 4).map(c =>
            shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
            .as(Seq("chunk", "val")))
        .select(col("chunk"), col("val"), col("id").as(idOut),
          col("simhash").as(shOut))
    chunksOf(newSigs0, "i", "sh_i")
      .join(chunksOf(corpusSigs0, "j", "sh_j"), Seq("chunk", "val"))
      .select(col("i"), col("j"),
        bit_count(col("sh_i").bitwiseXOR(col("sh_j"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Candidate pairs within `maxHamming` bits, using 4×16-bit chunk banding
    * (pigeonhole: any pair within hamming ≤ 3 shares at least one exact
    * 16-bit chunk). */
  def simhashNearPairs(sigs0: DataFrame, maxHamming: Int = 3): DataFrame = {
    // materialization boundary: the 4 chunk expressions + both join sides
    // would otherwise each recompute the signature fold (see lshCandidates)
    val sigs = sigs0.repartition(col("id"))
    val chunks = sigs.select(col("id"), col("simhash"), posexplode(
        array((0 until 4).map(c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("chunk", "val")))
    val a = chunks.select(col("chunk"), col("val"), col("id").as("i"), col("simhash").as("sh_i"))
    val b = chunks.select(col("chunk"), col("val"), col("id").as("j"), col("simhash").as("sh_j"))
    a.join(b, Seq("chunk", "val"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        bit_count(col("sh_i").bitwiseXOR(col("sh_j"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Pair-level evaluation of a dedup candidate list against a ground-
    * truth pair set — the dedup family's own measurement harness (the
    * [[TextAnalysis.langIdConfusion]] discipline applied to pairs):
    * one row `(n_pred, n_truth, tp, fp, fn, precision, recall, f1)`.
    * Both inputs are canonicalized first — `(least, greatest)` order,
    * self-pairs and null ids dropped, duplicates collapsed — so any
    * pair orientation convention scores identically. Counts are exact
    * BIGINTs; the ratios are derived from them in one exact IEEE
    * division each at the very end (bit-stable across engines), NULL
    * when their denominator is 0 (an empty prediction list has no
    * precision — SQL-null beats a fake 0).
    *
    * Interpretation contract: `recall` is meaningful whenever `truth`
    * is a genuine subset of the real duplicate pairs (e.g. planted
    * mutations — the `dedup_eval` oracle's setup); `precision` is only
    * meaningful when `truth` is COMPLETE, since real-but-unlisted
    * duplicates score as false positives.
    *
    * Scale shape: one distinct exchange per input (pair-keyed), one
    * pair-keyed left join counting hits and misses in a single pass
    * over the predictions, and two 1-row aggregates cross-joined —
    * nothing here ever exceeds the pair lists themselves. */
  def dedupEval(pred: DataFrame, truth: DataFrame,
                iCol: String = "i", jCol: String = "j"): DataFrame = {
    def canon(df: DataFrame): DataFrame = df.select(
        least(col(iCol), col(jCol)).as("a"),
        greatest(col(iCol), col(jCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
    val p = canon(pred)
    val tr = canon(truth)
    val stats = p.join(tr.withColumn("__hit", lit(1L)), Seq("a", "b"),
        "left")
      .agg(count(lit(1)).as("n_pred"),
        coalesce(sum("__hit"), lit(0L)).as("tp"))
    val nt = tr.agg(count(lit(1)).as("n_truth"))
    stats.crossJoin(nt)
      .select(col("n_pred"), col("n_truth"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("n_truth") - col("tp")).as("fn"),
        when(col("n_pred") > 0,
          col("tp").cast("double") / col("n_pred")).as("precision"),
        when(col("n_truth") > 0,
          col("tp").cast("double") / col("n_truth")).as("recall"),
        when(col("n_pred") + col("n_truth") > 0,
          (col("tp") * 2).cast("double") /
            (col("n_pred") + col("n_truth"))).as("f1"))
  }
}
