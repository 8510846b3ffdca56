package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (exact; one broadcast of the query
  * set, no corpus shuffle). Scale paths: IVF coarse quantization (probe a
  * fraction of the corpus) and random-hyperplane LSH bucketing — both keep
  * the corpus partition-local and shuffle only (id, bucket) assignments.
  */
object Similarity {

  /** Elementwise dot product of two double-array columns (column-level
    * formulation; kept for composability — the hot path below uses the
    * native single-pass expression). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native Catalyst expression: one compiled pass computing
    * Σab, Σa², Σb² with identical left-to-right accumulation order to the
    * SQL formulation (bit-stable vs the DuckDB oracle). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.GraftExpressions.cosineSimilarity(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors for each query vector, by cosine similarity.
    * The query side should be small (it is broadcast); the corpus is
    * scanned once with no shuffle except the final per-query top-k.
    * Ties broken by ascending corpus id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("cv"), col("qv")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("sim"), 6).as("sim"))
  }

  /** Embedding-space label coherence — for each query vector, its best
    * same-label and best other-label cosine over the corpus and whether
    * the same-label side wins: the margin diagnostic behind k-NN label
    * audits / mislabeled-example mining on training sets (a query whose
    * nearest neighbors are another class is a labeling or embedding
    * problem). `same_wins` is NULL when a side is empty (a singleton
    * label has no same-label neighbor) — the comparison, like the maxes
    * it compares, is decided on unrounded values so engine and oracle
    * agree bit-for-bit; the published maxes are rounded for display.
    *
    * 100 TB shape: queries broadcast, the corpus never shuffles (the
    * per-query maxes aggregate map-side before one query-keyed
    * exchange of 2 doubles per query). Corpus-×-corpus margin audits
    * should route candidate generation through the LSH/IVF machinery
    * ([[semanticNearDupPairs]]' bucketing) rather than this broadcast
    * form. */
  def labelMargin(corpus: DataFrame, queries: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).as("__cl"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("label"), asDouble(col(vecCol)).as("qv"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("label"),
        cosine(col("cv"), col("qv")).as("sim"),
        (col("__cl") === col("label")).as("__same"))
      .groupBy("query_id", "label")
      .agg(max(when(col("__same"), col("sim"))).as("__bs"),
        max(when(!col("__same"), col("sim"))).as("__bo"))
      .select(col("query_id"), col("label"),
        round(col("__bs"), 6).as("best_same"),
        round(col("__bo"), 6).as("best_other"),
        (col("__bs") > col("__bo")).as("same_wins"))
  }

  /** Hard-negative mining for contrastive / metric-learning training
    * sets: for each query vector, its `k` NEAREST corpus vectors with a
    * DIFFERENT label — the highest-similarity wrong-class examples that
    * make the strongest triplet/InfoNCE negatives (easy random negatives
    * teach nothing; the near-boundary ones carry the gradient). Ties
    * break by ascending corpus id, so engine and oracle rank
    * identically.
    *
    * 100 TB shape: same contract as [[bruteForceTopK]] — queries
    * broadcast, corpus scanned once unshuffled, per-query top-k pruned
    * map-side (WindowGroupLimit) before the single query-keyed
    * exchange; route candidate generation through [[ivfTopK]]-style
    * indexing for corpus-×-corpus mining. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).as("__cl"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("label"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id") &&
        col("__cl") =!= col("label"))
      .select(col("query_id"), col("label"), col("corpus_id"),
        col("__cl").as("neg_label"), cosine(col("cv"), col("qv")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("label"), col("rank"), col("corpus_id"),
        col("neg_label"), round(col("sim"), 6).as("sim"))
  }

  /** k-NN majority-vote label prediction with the quality rollup — the
    * standard embedding-quality probe over a labeled corpus (kNN-probe
    * evaluation): each query's k nearest corpus vectors by cosine vote;
    * ties break deterministically (highest vote count, then smallest
    * label), so engine and oracle elect the same winner bit-for-bit.
    * Returns per query `(query_id, label, predicted, correct)`.
    *
    * 100 TB shape: neighbor generation is pluggable — `strategy` picks
    * [[bruteForceTopK]] (default: exact, corpus unshuffled, right for
    * eval-sized query sets), [[ivfTopK]] (`"ivf"`) or [[ivfPqTopK]]
    * (`"ivfpq"`) at their default index parameters for billion-vector
    * corpora, and `candidates` overrides with ANY pre-computed neighbor
    * frame carrying `(query_id, corpus_id)` (e.g. an `ivfTopK` call with
    * tuned nlist/nprobe) — so the scale swap is an argument, not a code
    * edit. The vote itself aggregates k·queries rows, negligible at any
    * scale. */
  def knnLabelVote(corpus: DataFrame, queries: DataFrame, k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   labelCol: String = "label",
                   strategy: String = "brute",
                   candidates: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"k=$k")
    val neighbors = candidates.getOrElse(strategy match {
      case "brute" => bruteForceTopK(corpus, queries, k, idCol, vecCol)
      case "ivf"   => ivfTopK(corpus, queries, k, idCol = idCol, vecCol = vecCol)
      case "ivfpq" => ivfPqTopK(corpus, queries, k, idCol = idCol, vecCol = vecCol)
      case other => throw new IllegalArgumentException(
        s"knnLabelVote: unknown neighbor strategy '$other' — use " +
          "brute | ivf | ivfpq, or pass candidates = Some(df) with " +
          "(query_id, corpus_id) from any top-k call")
    })
    val corpusLabels = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).as("__nl"))
    val votes = neighbors.join(corpusLabels, "corpus_id")
      .groupBy("query_id", "__nl").agg(count(lit(1)).as("__votes"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__votes").desc, col("__nl").asc)
    val predicted = votes.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("query_id"), col("__nl").as("predicted"))
    queries.select(col(idCol).as("query_id"), col(labelCol).as("label"))
      .join(predicted, "query_id")
      .withColumn("correct", col("predicted") === col("label"))
  }

  // ------------------------------------------------------------ IVF
  /** Deterministic coarse centroids: the first `nlist` corpus vectors by id
    * (the oracle-mode quantizer AND the Lloyd seed). The centroid id IS
    * the source vector id, so the untrained pipeline is deterministic and
    * oracle-checkable; [[trainCentroids]] refines these seeds when recall
    * matters more than a SQL-expressible oracle. */
  def centroids(corpus: DataFrame, nlist: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("centroid_id"),
        asDouble(col(vecCol)).as("centroid"))

  /** Deterministic Lloyd refinement of the first-N seed: a FIXED number of
    * assign→mean iterations, no RNG anywhere, so two runs (on any
    * partitioning) produce bit-identical centroids:
    *
    *   - assignment reuses [[ivfAssign]] (broadcast centroids, corpus
    *     stays partition-local, deterministic cosine tie-break);
    *   - per-dimension means aggregate through DECIMAL (exact and
    *     associative, the [[graft.functions.Exact]] discipline), so the
    *     shuffle order can't wiggle the last ulp;
    *   - an emptied cell keeps its previous centroid (standard Lloyd
    *     guard, deterministic here).
    *
    * Driver traffic per iteration is nlist×dim mean rows (KB at any
    * corpus scale); the heavy work — assignment and partial dimension
    * sums — is executor-side with one shuffle per iteration. At 100 TB
    * one would train on a sample; the machinery is identical.
    */
  def trainCentroids(corpus: DataFrame, nlist: Int, iters: Int = 3,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     metric: String = "cosine"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val seed = centroids(corpus, nlist, idCol, vecCol)
      .select("centroid_id", "centroid").as[(Long, Seq[Double])].collect()
      .sortBy(_._1)
    // re-id the seeds 0..nlist-1: trained centroids are means, not corpus
    // vectors, so source-vector ids would be misleading downstream
    var current: Array[(Long, Seq[Double])] =
      seed.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    // one scan pass per iteration hits this cached projection instead of
    // re-reading the source (dropped before returning)
    val c = corpus.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("v"))
      .cache()
    var it = 0
    while (it < iters) {
      val centsDf = current.toSeq.toDF("centroid_id", "centroid")
      val assigned = ivfAssign(c, centsDf, "vid", "v", metric)
      // exact per-dimension means: posexplode → decimal sums per
      // (cell, dim) — one shuffle, ~nlist×dim result rows
      val sums = assigned
        .select(col("centroid_id"), posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(sum(col("x").cast(DecimalType(38, 18))).as("s"),
          count(lit(1)).as("n"))
        .select(col("centroid_id"), col("dim"),
          (col("s") / col("n")).cast("double").as("mean"))
        .as[(Long, Int, Double)].collect()
      val means = sums.groupBy(_._1).map { case (cid, rows) =>
        cid -> rows.sortBy(_._2).map(_._3).toSeq
      }
      current = current.map { case (cid, old) =>
        (cid, means.getOrElse(cid, old)) // empty cell keeps its centroid
      }
      it += 1
    }
    c.unpersist(blocking = false)
    current.toSeq.toDF("centroid_id", "centroid")
  }

  /** Assign every corpus vector to its nearest centroid as a MAP-ONLY
    * projection: the centroid table is collected driver-side (nlist×dim
    * doubles — KB at any corpus scale, nlist is bounded by design) and
    * baked into the compiled
    * [[graft.expressions.GraftExpressions.NearestCentroid]] kernel, the
    * same discipline as [[pqEncode]]'s PqAssign. The previous
    * crossJoin(broadcast)+row_number formulation shuffled corpus×nlist
    * scored rows into a per-vector window just to keep one — at 100 TB
    * that exchange IS the assignment cost; the kernel removes it from
    * every Lloyd iteration and every IVF query. Scores, tie-breaks, and
    * NaN ordering bit-match the window formulation (asserted in
    * SimilaritySpec). `metric` is "cosine" (IVF over unit-ish vectors)
    * or "l2" (subspace quantization, where per-subvector norms carry
    * information cosine would discard). */
  def ivfAssign(corpus: DataFrame, cents: DataFrame,
                idCol: String = "vec_id", vecCol: String = "embedding",
                metric: String = "cosine"): DataFrame = {
    require(metric == "cosine" || metric == "l2",
      s"unknown metric: $metric")
    val spark = cents.sparkSession
    import spark.implicits._
    val centArr = cents
      .select(col("centroid_id").cast("long"), asDouble(col("centroid")))
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val base = corpus.select(col(idCol).as("corpus_id"),
      asDouble(col(vecCol)).as("cv"))
    // empty centroid set (empty corpus seed) assigns nothing — the
    // crossJoin formulation's behavior, kept rather than made an error
    if (centArr.isEmpty)
      base.withColumn("centroid_id", lit(null).cast("long")).limit(0)
    else base.withColumn("centroid_id", graft.expressions.GraftExpressions
        .nearestCentroid(col("cv"), centArr, metric))
      .select(col("corpus_id"), col("cv"), col("centroid_id"))
  }

  /** Per-cluster corpus profile — the input a SemDeDup-style semantic
    * domain-balancing step works from: assign every vector to its
    * nearest centroid and report each cluster's population and cohesion
    * (how tight the members sit around the centroid), so over-represented
    * semantic domains can be downsampled (feed the counts to
    * [[graft.llm.Corpus.temperatureMixWithReference]]) and diffuse junk
    * clusters flagged for inspection.
    *
    * Returns (centroid_id, n_members, sum_scaled_sim, mean_sim, min_sim,
    * max_sim). The cohesion mean is derived from an INTEGER sum of
    * 1e-6-quantized member similarities — float addition is not
    * associative, so a double sum would make the result depend on
    * partitioning; the scaled-integer sum is exact and
    * shuffle-order-proof (the corpus_report discipline).
    *
    * Shape at 100 TB: assignment is the baked [[ivfAssign]] kernel (zero
    * shuffle), the centroid join broadcasts nlist rows, and the rollup
    * is one partial-aggregated exchange over the bounded nlist domain —
    * the map side reduces every partition to ≤ nClusters rows.
    * `trainIters` = 0 uses the deterministic first-N quantizer (the
    * oracle mode); > 0 Lloyd-refines via [[trainCentroids]];
    * `nClusters` ≤ 0 auto-derives the SemDeDup cluster count (the
    * family convention — never a silently empty result). */
  def clusterProfile(corpus: DataFrame, nClusters: Int, trainIters: Int = 0,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    import graft.expressions.GraftExpressions.cosineSimilarity
    val cents = resolvedCentroids(corpus, nClusters, trainIters, idCol, vecCol)
    val assigned = ivfAssign(corpus, cents, idCol, vecCol)
    assigned.join(broadcast(cents), Seq("centroid_id"))
      .withColumn("sim", cosineSimilarity(col("cv"), col("centroid")))
      .withColumn("scaled_sim", round(col("sim") * 1e6).cast("long"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_members"),
        sum("scaled_sim").as("sum_scaled_sim"),
        min(round(col("sim"), 6)).as("min_sim"),
        max(round(col("sim"), 6)).as("max_sim"))
      .withColumn("mean_sim",
        round(col("sum_scaled_sim").cast("double") / 1e6 / col("n_members"), 6))
      .select("centroid_id", "n_members", "sum_scaled_sim", "mean_sim",
        "min_sim", "max_sim")
  }

  /** Cluster-balanced exact-k subset — the action [[clusterProfile]]'s
    * report points at: cap every semantic cluster at `kPerCluster`
    * deterministically-chosen members (SemDeDup-adjacent semantic
    * rebalancing, where over-represented domains lose mass and rare
    * domains keep all of theirs). Assignment is the baked zero-shuffle
    * [[ivfAssign]] kernel; the per-cluster pick is
    * [[graft.llm.Corpus.stratifiedSample]]'s bounded `TopKByKey`
    * aggregate over the content-independent `md5(seed + ":" + id)`
    * order, so the exchange carries O(k · nClusters) rows — never the
    * corpus — and the result is identical under any partitioning.
    * `nClusters` ≤ 0 auto-derives the SemDeDup cluster count (the
    * family convention). Returns (centroid_id, rk, idCol). */
  def clusterBalancedSample(corpus: DataFrame, nClusters: Int,
                            kPerCluster: Int, trainIters: Int = 0,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            seed: String = "cbal"): DataFrame = {
    val cents = resolvedCentroids(corpus, nClusters, trainIters, idCol, vecCol)
    val assigned = ivfAssign(corpus, cents, idCol, vecCol)
      .select(col("corpus_id").as(idCol), col("centroid_id"))
    graft.llm.Corpus.stratifiedSample(assigned, "centroid_id", idCol,
      kPerCluster, seed)
  }

  /** IVF search: probe the `nprobe` nearest centroids per query, then exact
    * cosine within the probed cells only. Approximate; recall grows with
    * nprobe (and with `trainIters`: 0 = the first-N quantizer, the
    * deterministic oracle mode; >0 = Lloyd-refined centroids via
    * [[trainCentroids]], strictly better cell shapes). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
              nprobe: Int = 4, idCol: String = "vec_id",
              vecCol: String = "embedding", trainIters: Int = 0): DataFrame = {
    val cents = (if (trainIters > 0)
        trainCentroids(corpus, nlist, trainIters, idCol, vecCol)
      else centroids(corpus, nlist, idCol, vecCol)).cache()
    val assigned = ivfAssign(corpus, cents, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val qprobe = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        cosine(col("qv"), col("centroid")).as("csim"))
    val wq = Window.partitionBy("query_id").orderBy(col("csim").desc, col("centroid_id"))
    val probes = qprobe.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe).select("query_id", "qv", "centroid_id")
    val scored = assigned.join(probes, Seq("centroid_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("cv"), col("qv")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), round(col("sim"), 6).as("sim"))
  }

  // ------------------------------------------------------------- PQ
  /** Product quantization — the memory layout behind billion-vector ANN
    * (IVF-PQ): split each d-dim vector into `m` contiguous subvectors,
    * learn a small L2 codebook per subspace with the SAME deterministic
    * Lloyd machinery as [[trainCentroids]], and store each corpus vector
    * as `m` small codes. At d=64/m=8 that is 256 bytes of floats → 8
    * bytes per vector — the corpus index fits in memory where raw vectors
    * never would. Scoring is asymmetric (ADC): the exact query builds one
    * dot-product lookup table per subspace against the codebook, and a
    * corpus vector's approximate dot is the sum of its codes' table
    * entries — no corpus-side float math at query time.
    *
    * Everything is deterministic (first-N seeds, fixed iterations,
    * decimal-exact means, id tie-breaks): identical runs bit-agree.
    *
    * Returns codebooks as (sub, centroid_id, centroid). */
  def pqTrain(corpus: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 3,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    pqTrainArrays(corpus, m, k, iters, idCol, vecCol)._2.toSeq
      .toDF("sub", "centroid_id", "centroid")
  }

  /** Joint Lloyd training of all m sub-codebooks, returning (subspace
    * width, rows). Semantics per subspace are identical to
    * trainCentroids(metric="l2"): first-N seeds, decimal-exact means, id
    * tie-breaks, empty cells persist — bit-stable across partitionings.
    * Each iteration is ONE map-only assignment pass (the compiled
    * [[graft.expressions.GraftExpressions.PqAssign]] argmin — codebooks
    * are a broadcast-by-construction driver constant) feeding a
    * partially-aggregated (sub, centroid, dim) mean — the per-(id,sub)
    * row_number window the first formulation used shuffled the whole
    * exploded corpus every iteration. */
  private def pqTrainArrays(corpus: DataFrame, m: Int, k: Int, iters: Int,
                            idCol: String, vecCol: String)
      : (Int, Array[(Int, Long, Seq[Double])]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // The Lloyd loop takes iters+2 passes over the projected corpus (dim
    // probe, seeds, one assignment/mean pass per iteration) — cache the
    // projection for the duration of training instead of re-running the
    // scan each pass. At 100 TB you would pass a hash-sampled corpus to
    // train on (the codebooks converge on a sample); the pinned oracle
    // defaults train on the full corpus, so the cache is scoped to this
    // method and dropped before returning.
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .cache()
    val dim = c.select(size(col("v"))).limit(1).collect()(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val w = dim / m
    val seedRows = c.orderBy(col("id")).limit(k)
      .select(col("v")).as[Seq[Double]].collect()
    var current: Array[(Int, Long, Seq[Double])] =
      (for (sub <- 0 until m; (v, i) <- seedRows.zipWithIndex)
        yield (sub, i.toLong, v.slice(sub * w, sub * w + w): Seq[Double])).toArray
    var it = 0
    while (it < iters) {
      val codes = graft.expressions.GraftExpressions
        .pqAssign(col("v"), current.toSeq)
      val sums = c.select(col("v"), posexplode(codes).as(Seq("sub", "cid")))
        .select(col("sub"), col("cid"),
          posexplode(slice(col("v"), col("sub") * w + 1, lit(w)))
            .as(Seq("dim", "x")))
        .groupBy("sub", "cid", "dim")
        .agg(sum(col("x").cast(DecimalType(38, 18))).as("s"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("cid"), col("dim"),
          (col("s") / col("n")).cast("double").as("mean"))
        .as[(Int, Long, Int, Double)].collect()
      val means = sums.groupBy(r => (r._1, r._2)).map { case (key, rows) =>
        key -> rows.sortBy(_._3).map(_._4).toSeq
      }
      current = current.map { case (sub, cid, old) =>
        (sub, cid, means.getOrElse((sub, cid), old))
      }
      it += 1
    }
    c.unpersist(blocking = false)
    (w, current)
  }

  /** Encode each corpus vector as its per-subspace nearest-codeword ids:
    * (id, codes array — position = subspace). A pure map-only projection —
    * the codebooks are collected driver-side (m·k·w doubles, trivially
    * small at any corpus scale) and baked into the compiled
    * [[graft.expressions.GraftExpressions.PqAssign]] kernel, so the corpus
    * is scanned once with NO explode, join, window, or shuffle. At 100 TB
    * this is the difference between a map-only encode pass and m·k-way
    * shuffled assignment. */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    import corpus.sparkSession.implicits._
    val books = codebooks.select(col("sub").cast("int"), col("centroid_id"),
      col("centroid")).as[(Int, Long, Seq[Double])].collect()
    pqEncodeWith(corpus, books, idCol, vecCol)
  }

  private def pqEncodeWith(corpus: DataFrame,
                           books: Array[(Int, Long, Seq[Double])],
                           idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("id"),
      graft.expressions.GraftExpressions
        .pqAssign(asDouble(col(vecCol)), books.toSeq).as("codes"))

  /** PQ top-k search with exact re-ranking: ADC-score every encoded
    * corpus vector against each query's lookup tables, keep the
    * `rerank·k` best approximate candidates per query, then re-score
    * THOSE exactly by cosine — output sims are exact, PQ only prunes.
    * The scan joins (id, sub, code) rows against the broadcast per-query
    * tables and sums `m` entries per (query, corpus) pair; corpus floats
    * are never touched until the final small re-rank join. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
             codebookSize: Int = 16, iters: Int = 3, rerank: Int = 4,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    import corpus.sparkSession.implicits._
    val (w, trained) =
      pqTrainArrays(corpus, m, codebookSize, iters, idCol, vecCol)
    val books = trained.toSeq.toDF("sub", "centroid_id", "centroid")
    val encoded = pqEncodeWith(corpus, trained, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val luts = adcLuts(q, books, m, w)
    val corpusCodes = encoded.select(col("id").as("corpus_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val approx = corpusCodes.join(broadcast(luts), Seq("sub", "code"))
      .filter(col("query_id") =!= col("corpus_id"))
      .groupBy("query_id", "corpus_id")
      .agg(sum("part").as("approx_dot"))
    exactRerank(topApprox(approx, k, rerank), corpus, q, k, idCol, vecCol)
  }

  /** Per-query ADC lookup tables — dot(query subvector, codeword) per
    * (sub, code); the shared head of [[pqTopK]] and [[ivfPqTopK]]. */
  private def adcLuts(q: DataFrame, books: DataFrame,
                      m: Int, w: Int): DataFrame =
    q.select(col("query_id"), posexplode(
        array((0 until m).map(s => slice(col("qv"), s * w + 1, w)): _*))
      .as(Seq("sub", "qsv")))
      .join(broadcast(books), "sub")
      .select(col("query_id"), col("sub"), col("centroid_id").as("code"),
        dot(col("qsv"), col("centroid")).as("part"))

  /** The `rerank·k` best approximate candidates per query with the
    * deterministic (approx_dot desc, corpus_id) tie-break — the shared
    * pruning step of [[pqTopK]] and [[ivfPqTopK]]. */
  private def topApprox(approx: DataFrame, k: Int, rerank: Int): DataFrame = {
    val wTop = Window.partitionBy("query_id")
      .orderBy(col("approx_dot").desc, col("corpus_id"))
    approx.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k * rerank).select("query_id", "corpus_id")
  }

  /** IVF-PQ composed index — the standard billion-vector ANN layout
    * (coarse inverted lists × product-quantized residual-free codes):
    *
    *  1. coarse quantizer: `nlist` deterministic first-N centroids, L2
    *     metric (the conventional IVF-PQ coarse assignment; the
    *     cosine-metric [[ivfTopK]] remains the oracle-mode variant);
    *  2. PQ codebooks trained on the full corpus ([[pqTrainArrays]]);
    *  3. index build: ONE map-only projection computes BOTH the cell and
    *     the m codes per vector (two [[graft.expressions.GraftExpressions.PqAssign]]
    *     kernels over driver-constant tables — the corpus is scanned once
    *     and never shuffled);
    *  4. search: each query probes its `nprobe` nearest cells, ADC-scores
    *     only vectors in those cells against broadcast lookup tables,
    *     keeps `rerank·k` candidates, and re-scores those exactly by
    *     cosine — output sims are exact, the index only prunes.
    *
    * Everything is deterministic (first-N seeds, fixed iterations,
    * decimal-exact means, id tie-breaks): bit-stable across runs and
    * partitionings, hence golden-parquet oracle-able. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 8,
                codebookSize: Int = 16, iters: Int = 3, rerank: Int = 4,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Seq[Double])] =
      corpus.orderBy(col(idCol)).limit(nlist)
        .select(asDouble(col(vecCol))).as[Seq[Double]].collect()
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val coarseBooks = cents.map { case (cid, v) => (0, cid, v) }.toSeq
    val (w, trained) = pqTrainArrays(corpus, m, codebookSize, iters, idCol, vecCol)
    val ge = graft.expressions.GraftExpressions
    val index = corpus.select(col(idCol).as("corpus_id"),
      ge.pqAssign(asDouble(col(vecCol)), coarseBooks).getItem(0).as("cell"),
      ge.pqAssign(asDouble(col(vecCol)), trained.toSeq).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    // nprobe nearest cells per query, same L2 coarse metric, id tie-break
    val centsDf = cents.toSeq.toDF("cell", "centroid")
    val wq = Window.partitionBy("query_id").orderBy(col("d2").asc, col("cell"))
    val probes = q.crossJoin(broadcast(centsDf))
      .select(col("query_id"), col("cell"),
        ge.l2DistanceSq(col("qv"), col("centroid")).as("d2"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nprobe)
      .select("query_id", "cell")
    val books = trained.toSeq.toDF("sub", "centroid_id", "centroid")
    val luts = adcLuts(q, books, m, w)
    // probed cells only: the inverted-list prune BEFORE any scoring work
    val approx = index.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(luts), Seq("query_id", "sub", "code"))
      .groupBy("query_id", "corpus_id")
      .agg(sum("part").as("approx_dot"))
    exactRerank(topApprox(approx, k, rerank), corpus, q, k, idCol, vecCol)
  }

  /** Exact cosine re-rank of a pruned (query_id, corpus_id) candidate
    * set: the shared tail of [[pqTopK]] and [[ivfPqTopK]] — corpus floats
    * are only touched for candidates. */
  private def exactRerank(cands: DataFrame, corpus: DataFrame, q: DataFrame,
                          k: Int, idCol: String, vecCol: String): DataFrame = {
    val cv = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cv"))
    val rescored = cands.join(cv, "corpus_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("corpus_id"),
        cosine(col("cv"), col("qv")).as("sim"))
    val wFinal = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id").asc)
    rescored.withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("sim"), 6).as("sim"))
  }

  // ------------------------------------------------------------ LSH
  /** Random-hyperplane signature for one LSH table: bit h = sign(v · r_h)
    * with deterministic pseudo-random hyperplanes derived from
    * (table, plane, dim) hashes. Cosine-similar vectors agree on most bits.
    *
    * This is the REFERENCE column formulation, kept as the executable spec
    * for the compiled
    * [[graft.expressions.GraftExpressions.HyperplaneSignatures]] kernel
    * (bit-parity asserted in ExpressionsSpec). The hot path below uses the
    * compiled expression — the interpreted `aggregate`×`zip_with` stack
    * here evaluates its lambdas per element × plane × table through the
    * interpreter, the known 10-50× penalty.
    */
  /** Expected cluster size the SemDeDup auto mode targets. Within-cluster
    * pairing does O(size²) cosine work per cluster, so holding SIZE
    * constant (by growing cluster COUNT with the corpus) is what keeps
    * per-task work flat at 100 TB — ~300² ≈ 45k comparisons per task. */
  val SemDeDupTargetClusterSize = 300L

  /** Auto-derived SemDeDup cluster count: one `count()` job, then
    * `ceil(count / SemDeDupTargetClusterSize)`, floored at 16 so tiny
    * corpora still partition. Deterministic — same corpus, same answer. */
  def semanticAutoClusters(corpus: DataFrame): Int = {
    val n = corpus.count()
    math.max(16L, (n + SemDeDupTargetClusterSize - 1) /
      SemDeDupTargetClusterSize).toInt
  }

  private def resolveClusters(corpus: DataFrame, nClusters: Int): Int =
    if (nClusters > 0) nClusters else semanticAutoClusters(corpus)

  /** Resolved centroid table shared by the profile/balance family:
    * `nClusters` ≤ 0 auto-derives the SemDeDup cluster count (so the
    * convention never yields a silently empty centroid set);
    * `trainIters` = 0 keeps the deterministic first-N quantizer,
    * > 0 Lloyd-refines. */
  private def resolvedCentroids(corpus: DataFrame, nClusters: Int,
                                trainIters: Int, idCol: String,
                                vecCol: String): DataFrame = {
    val k = resolveClusters(corpus, nClusters)
    if (trainIters == 0) centroids(corpus, k, idCol, vecCol)
    else trainCentroids(corpus, k, trainIters, idCol, vecCol)
  }

  /** SemDeDup-style semantic near-duplicate PAIRS (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the embedding space, then compare pairs
    * WITHIN each cluster only — candidate space Σ_c C(|c|, 2), never
    * corpus², and every cluster's pairs generate independently after
    * one exchange on the cluster id. Returns (i, j, sim) with i < j
    * and cosine ≥ `threshold`.
    *
    * `trainIters = 0` seeds centroids first-N (fully relational — the
    * DuckDB oracle mode); > 0 runs the deterministic Lloyd refinement
    * for better cluster balance. A near-dup pair split across cluster
    * boundaries is not compared — exactly the paper's recall trade;
    * raise `nClusters` for speed, lower it for recall.
    *
    * 100 TB note: within-cluster pairing is quadratic in CLUSTER size,
    * so `nClusters` must scale with the corpus to keep clusters
    * bounded (the paper runs ~100k clusters at web scale — expected
    * cluster size, not cluster count, is the knob that fixes per-task
    * work). The default `nClusters = 0` therefore AUTO-SIZES from the
    * corpus: `ceil(count / SemDeDupTargetClusterSize)` clusters, which
    * holds expected cluster size — and so per-task pairing work — flat
    * as the corpus grows. Pass an explicit positive `nClusters` to pin
    * the cluster count (the sf-pinned oracle query does). */
  def semanticNearDupPairs(corpus: DataFrame, nClusters: Int = 0,
                           threshold: Double = 0.9, trainIters: Int = 0,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val k = resolveClusters(corpus, nClusters)
    val cents =
      if (trainIters == 0) centroids(corpus, k, idCol, vecCol)
      else trainCentroids(corpus, k, trainIters, idCol, vecCol)
    val asg = ivfAssign(corpus, cents, idCol, vecCol)
    val a = asg.select(col("centroid_id"), col("corpus_id").as("i"),
      col("cv").as("vi"))
    val b = asg.select(col("centroid_id"), col("corpus_id").as("j"),
      col("cv").as("vj"))
    a.join(b, "centroid_id")
      .filter(col("i") < col("j"))
      .withColumn("sim", cosine(col("vi"), col("vj")))
      .filter(col("sim") >= threshold)
      .select("i", "j", "sim")
  }

  /** SemDeDup of a NEW batch against an EXISTING reference corpus — the
    * batch counterpart of
    * [[graft.streaming.Streaming.semanticDedupStream]] and the semantic
    * member of the *Against family: cluster structure (centroids AND the
    * auto cluster count) comes from the REFERENCE, both sides assign to
    * those cells, and each new vector compares against reference members
    * of ITS cell only — candidate space new×(reference∩cell), never a
    * full cross. Returns (i = new id, j = reference id, sim ≥
    * threshold). An id on both sides is a legitimate cross-corpus pair,
    * matching the family's discipline. */
  def semanticNearDupPairsAgainst(newDf: DataFrame, reference: DataFrame,
                                  nClusters: Int = 0,
                                  threshold: Double = 0.9,
                                  trainIters: Int = 0,
                                  idCol: String = "vec_id",
                                  vecCol: String = "embedding"): DataFrame = {
    val k = resolveClusters(reference, nClusters)
    val cents =
      if (trainIters == 0) centroids(reference, k, idCol, vecCol)
      else trainCentroids(reference, k, trainIters, idCol, vecCol)
    val a = ivfAssign(newDf, cents, idCol, vecCol)
      .select(col("centroid_id"), col("corpus_id").as("i"),
        col("cv").as("vi"))
    val b = ivfAssign(reference, cents, idCol, vecCol)
      .select(col("centroid_id"), col("corpus_id").as("j"),
        col("cv").as("vj"))
    a.join(b, "centroid_id")
      .withColumn("sim", cosine(col("vi"), col("vj")))
      .filter(col("sim") >= threshold)
      .select("i", "j", "sim")
  }

  /** Incremental-dedup facade over [[semanticNearDupPairsAgainst]]: keep
    * only new rows with NO semantic near-dup in the reference. */
  def semanticDedupAgainst(newDf: DataFrame, reference: DataFrame,
                           nClusters: Int = 0, threshold: Double = 0.9,
                           trainIters: Int = 0, idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val dup = semanticNearDupPairsAgainst(newDf, reference, nClusters,
      threshold, trainIters, idCol, vecCol).select("i").distinct()
    newDf.join(dup, newDf(idCol) === dup("i"), "left_anti")
  }

  /** SemDeDup facade: drop every embedding whose semantic near-dup
    * component (transitive closure over [[semanticNearDupPairs]])
    * contains a smaller id — one survivor per semantic group, the
    * [[graft.llm.Dedup.dedupCorpus]] representative discipline.
    *
    * The pairs are checkpointed ONCE before label propagation — the
    * iterative closure would otherwise re-execute the whole
    * cluster-assign + pairwise-cosine plan on every iteration. Label
    * propagation pointer-doubles (see
    * [[graft.llm.Dedup.connectedComponents]]), so `maxIter` bounds a
    * duplicate-chain DIAMETER of roughly 2^maxIter and an unconverged
    * closure throws instead of returning truncated components. */
  def semanticDedup(corpus: DataFrame, nClusters: Int = 0,
                    threshold: Double = 0.9, trainIters: Int = 0,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    maxIter: Int = 10): DataFrame = {
    val pairs = semanticNearDupPairs(corpus, nClusters, threshold,
        trainIters, idCol, vecCol)
      .select("i", "j").localCheckpoint(true)
    val drop = graft.llm.Dedup.connectedComponents(pairs, maxIter)
      .filter(col("id") =!= col("comp")).select("id")
    corpus.join(drop, corpus(idCol) === drop("id"), "left_anti")
  }

  /** Deterministic ±1 sign matrix for [[randomProjection]]: entry (k, j)
    * is +1 when the first hex digit of `md5("<seed>:<k>:<j>")` is below
    * '8'. md5 is the ONE hash every engine in the gate computes
    * identically (Spark `md5`, DuckDB `md5`, JVM `MessageDigest`), so
    * the oracle can re-derive the identical matrix in pure SQL instead
    * of trusting a shipped literal. */
  def projectionSigns(seed: String, outDim: Int,
                      inDim: Int): Array[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (k, j) =>
      digest.reset()
      val h = digest.digest(s"$seed:$k:$j".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xF) < 8) 1.0 else -1.0
    }
  }

  /** Johnson–Lindenstrauss random projection `inDim → outDim` with ±1
    * (Achlioptas) signs and 1/√outDim scaling — the embedding-compression
    * step of a training pipeline (store/cluster/search 16 dims instead
    * of 64+ while approximately preserving pairwise distances).
    *
    * Engine-portable determinism: the sign matrix derives from md5 (see
    * [[projectionSigns]]), is computed ONCE driver-side, and rides the
    * plan as literal arrays — per row the projection is outDim·inDim
    * fused multiply-adds with ZERO hashing and zero shuffle (a pure
    * scan-stage projection; compare [[hyperplaneSignature]], which pays
    * an xxhash per (plane, dim) per row for its weights). The left-fold
    * accumulation order (j = 0..inDim−1 per component) matches DuckDB's
    * `list_sum`, so output doubles are bit-identical cross-engine.
    *
    * Output is EXPLODED to (id, k, value) rows — scalar columns, the
    * driver compare's native shape. */
  def randomProjection(df: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding", inDim: Int = 64,
                       outDim: Int = 16,
                       seed: String = "rp"): DataFrame = {
    require(outDim > 0 && inDim > 0, s"bad dims $inDim -> $outDim")
    val signs = projectionSigns(seed, outDim, inDim)
    // length guard: zip_with silently null-pads a mismatched vector and
    // the fold would emit NULL components (worse: an oracle's list_sum
    // SKIPS nulls and returns a partial sum) — fail loudly instead
    val raw = asDouble(col(vecCol))
    val v = when(size(raw) === inDim, raw)
      .otherwise(raise_error(concat(
        lit(s"randomProjection: expected $inDim-dim vector, got "),
        size(raw).cast("string"))).cast("array<double>"))
    val scale = math.sqrt(outDim.toDouble)
    val comps = signs.map { row =>
      aggregate(
        zip_with(v, array(row.map(lit).toIndexedSeq: _*), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x) / lit(scale)
    }
    df.select(col(idCol), posexplode(array(comps.toIndexedSeq: _*))
        .as(Seq("k", "value")))
  }

  /** Per-vector affine int8 quantization — 4× embedding compression for
    * billion-vector stores (the float32→int8 step every production ANN
    * index applies before PQ even enters the picture).
    *
    * Each vector is quantized independently: `lo = min(v)`,
    * `scale = (max(v) − lo)/255`, `code_i = round((v_i − lo)/scale) − 128`
    * (shifted into signed tinyint range; the +128 zero-point comes back
    * at dequantize time). A constant vector (scale = 0) maps every
    * element to code −128 and dequantizes exactly to `lo`. Null vectors
    * propagate null. Reconstruction is `lo + (code + 128)·scale`, max
    * error scale/2 per element.
    *
    * Zero shuffle — a pure scan-side projection through the compiled
    * [[graft.expressions.GraftExpressions.ScalarQuantizeVec]] kernel
    * (the built-in `transform`/`array_min` formulation interprets its
    * lambda per element — measured ~15× slower). Every op is
    * engine-portable IEEE arithmetic (subtract / divide / exact
    * half-away rounding), so codes AND reconstructions are
    * bit-identical in the DuckDB oracle — no transcendentals anywhere,
    * unlike the BM25 ln saga ([[Retrieval]]).
    *
    * Output: (id, lo, scale, codes array<tinyint>). */
  def scalarQuantize(df: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = graft.expressions.GraftExpressions
      .scalarQuantizeVec(asDouble(col(vecCol)))
    df.select(col(idCol), q.getField("lo").as("lo"),
      q.getField("scale").as("scale"), q.getField("codes").as("codes"))
  }

  /** Dequantized vector for a [[scalarQuantize]] row: per element
    * `lo + (code + 128)·scale`, compiled single pass. */
  def dequantize(codes: Column, lo: Column, scale: Column): Column =
    graft.expressions.GraftExpressions.dequantizeVec(codes, lo, scale)

  /** Asymmetric scalar-quantized top-k — serving from the int8 store:
    * the corpus side is [[scalarQuantize]]d (4× smaller scan — at
    * billion-vector scale the IO saving IS the operator) and
    * dequantized on the fly; queries stay full precision (the standard
    * asymmetric scheme — no query-side quantization error). Same
    * contract as [[bruteForceTopK]] otherwise: broadcast queries,
    * corpus scanned once unshuffled, per-query top-k map-side
    * rank-pruned, (sim desc, corpus_id) determinism, sim rounded to 6
    * for display with ranks decided on unrounded values.
    *
    * Accuracy: recon error ≤ scale/2 per element shifts cosines by
    * O(scale/‖v‖) — rank flips only between near-equal neighbors (spec
    * asserts top-k agreement with the exact search on the test
    * corpus). */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    sqTopKAgainst(scalarQuantize(corpus, idCol, vecCol), queries, k,
      idCol, vecCol)

  /** [[sqTopK]] against a PRE-quantized (possibly parquet-reloaded)
    * store — the Against/serving form: `quantized` is a
    * [[scalarQuantize]] output frame (id, lo, scale, codes), quantized
    * once, served many times. */
  def sqTopKAgainst(quantized: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val recon = quantized.select(col(idCol).as("corpus_id"),
      dequantize(col("codes"), col("lo"), col("scale")).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val scored = recon.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("cv"), col("qv")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("sim"), 6).as("sim"))
  }

  /** Exact per-group mean vector — the "prototype" primitive behind
    * nearest-class-mean baselines, chunk→document embedding pooling,
    * and per-cluster centroid export. Components are quantized to
    * 1e-9 BEFORE summing (`round(x·10⁹)` longs accumulated in
    * DECIMAL(38,0) — exact and associative at any corpus size, so the
    * shuffle order cannot wiggle an ulp and the SQL twin rebuilds the
    * identical integers; the corpus_report discipline — 1e-9 is far
    * below embedding noise and the documented contract), then divided
    * once: `mean = CAST(Σ AS DOUBLE) / (10⁹ · n)` — two exact
    * integers through one correctly-rounded conversion and one
    * division, bit-identical cross-engine.
    *
    * RAGGED GROUPS THROW: a group mixing vector lengths would silently
    * mean over different supports per dimension — the plan
    * `raise_error`s naming the group instead (the heavyHitters
    * exact-or-loud stance). Null vectors are excluded (no components
    * to pool). Output: (keyCol, n_vectors, centroid ARRAY<DOUBLE> in
    * dimension order).
    *
    * Shape: one scan, one (group, dim) partial-agg exchange
    * (|groups|·dim rows — bounded by the label/cluster domain), one
    * bounded per-group assembly. */
  def meanPoolVectors(df: DataFrame, keyCol: String,
                      vecCol: String = "embedding"): DataFrame = {
    val base = df.select(col(keyCol).as("__g"), asDouble(col(vecCol)).as("__v"))
      .filter(col("__v").isNotNull)
    val sums = base
      .select(col("__g"), posexplode(col("__v")).as(Seq("__d", "__x")))
      .groupBy("__g", "__d")
      .agg(sum(round(col("__x") * 1e9).cast("long")
          .cast(DecimalType(38, 0))).as("__s"),
        count(lit(1)).as("__n"))
      .withColumn("__m",
        col("__s").cast("double") / (lit(1000000000.0) * col("__n")))
    sums.groupBy("__g")
      .agg(min("__n").as("__mn"), max("__n").as("__mx"),
        sort_array(collect_list(struct(col("__d").as("d"),
          col("__m").as("m")))).as("__dm"))
      .select(col("__g").as(keyCol),
        when(col("__mn") =!= col("__mx"),
          raise_error(concat(lit("meanPoolVectors: ragged vector " +
            "lengths in group "), col("__g").cast("string"))))
          .otherwise(col("__mn")).as("n_vectors"),
        transform(col("__dm"), s => s.getField("m")).as("centroid"))
  }

  /** Nearest-class-mean classification — the cheapest embedding
    * classifier baseline (Rocchio / NCM): each query takes the label
    * of its most-cosine-similar class prototype
    * ([[meanPoolVectors]] of the labeled corpus). Useful as the
    * sanity floor under [[knnLabelVote]] and as a drift alarm (NCM
    * accuracy collapsing on fresh data means the embedding space or
    * the labels moved). Output: (query_id, label, predicted, correct)
    * — the [[knnLabelVote]] eval contract.
    *
    * Shape: prototypes are a |labels|-row broadcast; the query side
    * never shuffles (map-side WindowGroupLimit argmax). Ties break on
    * the smaller label (deterministic); every cosine runs on
    * bit-exact prototype vectors (see [[meanPoolVectors]]), so the
    * SQL twin ranks identically. */
  def prototypeClassify(corpus: DataFrame, queries: DataFrame,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        labelCol: String = "label"): DataFrame = {
    val protos = meanPoolVectors(corpus.filter(col(labelCol).isNotNull),
        labelCol, vecCol)
      .select(col(labelCol).as("__pl"), col("centroid"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"), col(labelCol).as("label"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__sim").desc, col("__pl").asc)
    q.crossJoin(broadcast(protos))
      .withColumn("__sim", cosine(col("qv"), col("centroid")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("query_id"), col("label"),
        col("__pl").as("predicted"),
        (col("__pl") === col("label")).as("correct"))
  }

  // --------------------------------------------------- bitext mining
  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019 — the
    * CCMatrix/LASER recipe): for every SOURCE vector, its best TARGET
    * by the RATIO margin
    * `cos(x,y) / ((avgTopK(x→tgt) + avgTopK(y→src)) / 2)` — raw cosine
    * normalized by how "promiscuous" each side's neighborhood is, which
    * is what separates a true translation pair from a hub vector that
    * is everyone's nearest neighbor. The mined pairs (threshold the
    * margin downstream) are the standard source for parallel/aligned
    * training corpora from two monolingual embedding spaces.
    *
    * Cross-engine discipline: the two top-k neighbor means ride EXACT
    * integer sums of 1e-6-quantized cosines (float sums are
    * partition-order-dependent — the corpus_report rule); the margin is
    * then one fixed-association double expression, quantized to 10 dp
    * BEFORE ranking with a target-id tie-break (the BM25 ln rule), so
    * engine and SQL twin rank identically. Published sim/margin are
    * rounded to 6 for display.
    *
    * Shape: two broadcast-queries brute passes (corpus sides never
    * shuffle; map-side WindowGroupLimit top-k) + two bounded per-id
    * rollups + one candidate join. At 100 TB route BOTH direction's
    * top-k through a [[VectorIndex]] (`ivfTopKAgainst`) instead of the
    * brute scans and feed the same margin tail — the math is identical;
    * the contract here (and what the oracle pins) is the margin
    * semantics. Sides must carry DISJOINT id spaces (two corpora — the
    * Against-family contract); k is capped by each side's size, and
    * the means divide by the ACTUAL neighbor count. */
  /** `mutual = true` keeps only RECIPROCAL best pairs — Artetxe &
    * Schwenk's "intersection" strategy: the pair survives when y is
    * x's margin-best target AND x is y's margin-best source over the
    * backward candidate set (the margin value itself is symmetric by
    * construction, so both directions rank with the same scores —
    * only the candidate sets differ). Higher precision, the standard
    * mining mode when both sides are large. */
  def marginBitext(src: DataFrame, tgt: DataFrame, k: Int = 4,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   mutual: Boolean = false): DataFrame = {
    require(k >= 1 && k <= 1000, s"marginBitext: k=$k outside [1, 1000]")
    def topSims(corpus: DataFrame, queries: DataFrame,
                qName: String, cName: String): DataFrame = {
      val c = corpus.select(col(idCol).as(cName), asDouble(col(vecCol)).as("cv"))
      val q = queries.select(col(idCol).as(qName), asDouble(col(vecCol)).as("qv"))
      val w = Window.partitionBy(qName)
        .orderBy(col("sim").desc, col(cName).asc)
      c.crossJoin(broadcast(q))
        .select(col(qName), col(cName), cosine(col("cv"), col("qv")).as("sim"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select(qName, cName, "sim")
    }
    // each direction's top-k frame feeds BOTH its mean-sum aggregate
    // and the candidate join. Reusing one Dataset instance would let
    // the analyzer's self-join dedup rewrite one side's attribute ids
    // and break exchange-reuse canonicalization (the
    // [[Dedup.connectedComponents]] ccRound lesson) — FRESH plan
    // instances canonicalize identically, so the cross-join + window
    // exchange executes once and the second read is a ReusedExchange
    // (plan-asserted in PlanShapeSpec).
    def fwdF() = topSims(tgt, src, "src_id", "tgt_id")
    def bwdF() = topSims(src, tgt, "tgt_id", "src_id")
    val fwd = fwdF()
    val bwd = bwdF()
    val sf = fwdF().groupBy("src_id")
      .agg(sum(round(col("sim") * 1e6).cast("long")).as("sf"),
        count(lit(1)).as("cf"))
    val sb = bwdF().groupBy("tgt_id")
      .agg(sum(round(col("sim") * 1e6).cast("long")).as("sb"),
        count(lit(1)).as("cb"))
    def marginOf(cands: DataFrame): DataFrame = cands
      .join(sf, "src_id").join(sb, "tgt_id")
      .withColumn("margin",
        col("sim") / ((col("sf").cast("double") / (lit(1000000.0) * col("cf")) +
          col("sb").cast("double") / (lit(1000000.0) * col("cb"))) * 0.5))
    val wBest = Window.partitionBy("src_id")
      .orderBy(round(col("margin"), 10).desc, col("tgt_id").asc)
    val fwdBest = marginOf(fwd)
      .withColumn("best", row_number().over(wBest))
      .filter(col("best") === 1)
      .select(col("src_id"), col("tgt_id"),
        round(col("sim"), 6).as("sim"),
        round(col("margin"), 6).as("margin"))
    if (!mutual) fwdBest
    else {
      val wBack = Window.partitionBy("tgt_id")
        .orderBy(round(col("margin"), 10).desc, col("src_id").asc)
      val bwdBest = marginOf(bwd)
        .withColumn("best", row_number().over(wBack))
        .filter(col("best") === 1)
        .select(col("src_id"), col("tgt_id"))
      fwdBest.join(bwdBest, Seq("src_id", "tgt_id"), "left_semi")
    }
  }

  // ---------------------------------------------------- VectorIndex
  /** A materialized ANN index: the three frames [[buildVectorIndex]]
    * trains and [[ivfTopKAgainst]]/[[ivfPqTopKAgainst]] serve — the
    * train-once/serve-many form of the ANN family, mirroring
    * [[graft.llm.Retrieval.Bm25Index]] exactly. Each member is a plain
    * DataFrame so the index persists as parquet (vectors bucketed by
    * `cell` is the 100 TB layout — a probe then prunes to nprobe/nlist
    * of the files) and reloads for serving with ZERO training work:
    * per-call Lloyd + codebook training is the bulk of a one-shot
    * `ivfPqTopK`'s cost and the wrong steady state when the corpus is
    * indexed once and queried forever.
    *
    *   - `centroids`: (cell LONG 0..nlist−1, centroid ARRAY<DOUBLE>) —
    *     the coarse quantizer, re-idd in ascending source order (a
    *     MONOTONE re-map of the one-shot ops' centroid ids, so every
    *     id tie-break resolves identically).
    *   - `codebooks`: (sub INT, centroid_id LONG, centroid
    *     ARRAY<DOUBLE>) — the PQ sub-codebooks ([[pqTrain]] layout).
    *   - `vectors`: (corpus_id, cell, pq_cell, codes ARRAY<BIGINT>,
    *     cv ARRAY<DOUBLE>, geo_fp BIGINT) — one row per indexed
    *     vector: `cell` is the cosine coarse assignment ([[ivfTopK]]
    *     semantics), `pq_cell` the L2 coarse assignment ([[ivfPqTopK]]
    *     semantics — both are computed in the same map-only encode
    *     pass, so carrying both costs one long per row), `codes` the
    *     PQ codes, `cv` the raw vector (the inverted-list payload
    *     exact re-ranking needs; drop it externally if only
    *     ADC-approximate serving is wanted), and `geo_fp` the
    *     [[geometryFingerprint]] of the centroids+codebooks the row
    *     was encoded under — the pinned-geometry stamp
    *     (docs/sketches.md lifecycle) that merge and serve VERIFY, so
    *     a mixed-geometry index is a loud error, never a silently
    *     wrong answer. */
  final case class VectorIndex(centroids: DataFrame, codebooks: DataFrame,
                               vectors: DataFrame) {
    /** Memoized [[geometryFingerprint]]: the geometry is immutable for
      * a given index (extend/merge never mutate it — they build NEW
      * indexes), so repeated serves against the same instance pay the
      * O(geometry) driver collect once instead of twice per
      * [[ivfTopKAgainst]] call on the hot serving path. A parquet
      * reload constructs a fresh instance and re-derives it — the
      * memo can never go stale. */
    lazy val geometryFp: Long = geometryFingerprint(this)
  }

  /** Content fingerprint of a [[VectorIndex]]'s GEOMETRY — the
    * centroids and PQ codebooks, i.e. everything an encoded row's
    * meaning depends on: a 64-bit splitmix-style fold over the sorted
    * (cell, dims) and (sub, centroid_id, dims) tuples, on the raw
    * IEEE bits (no rounding — geometry equality is bit equality).
    * O(geometry) to compute: the frames are nlist·dim + m·k·w doubles
    * — KB at any corpus scale — collected driver-side exactly like the
    * serving kernels already do. Two indexes with equal fingerprints
    * encode vectors identically; [[mergeVectorIndexes]] and the
    * serving paths REQUIRE equality instead of taking it on faith. */
  def geometryFingerprint(index: VectorIndex): Long = {
    val spark = index.vectors.sparkSession
    import spark.implicits._
    val centArr = index.centroids
      .select(col("cell").cast("long"), asDouble(col("centroid")))
      .as[(Long, Seq[Double])].collect()
    val books = index.codebooks
      .select(col("sub").cast("int"), col("centroid_id").cast("long"),
        asDouble(col("centroid")))
      .as[(Int, Long, Seq[Double])].collect()
    geometryFpArrays(centArr, books)
  }

  /** splitmix64-style accumulate: order-sensitive, avalanching. */
  private def fpMix(h0: Long, v: Long): Long = {
    var h = (h0 ^ v) * 0x9E3779B97F4A7C15L
    h ^= (h >>> 32)
    h * 0xBF58476D1CE4E5B9L ^ (h >>> 29)
  }

  private[graft] def geometryFpArrays(
      centArr: Array[(Long, Seq[Double])],
      books: Array[(Int, Long, Seq[Double])]): Long = {
    var h = 0x67656F6D65747279L // "geometry"
    centArr.sortBy(_._1).foreach { case (cid, v) =>
      h = fpMix(h, cid)
      v.foreach(d => h = fpMix(h, java.lang.Double.doubleToLongBits(d)))
    }
    books.sortBy(b => (b._1, b._2)).foreach { case (sub, cid, v) =>
      h = fpMix(h, sub.toLong)
      h = fpMix(h, cid)
      v.foreach(d => h = fpMix(h, java.lang.Double.doubleToLongBits(d)))
    }
    h
  }

  /** Plan-side geometry guard for the serving paths: when the vectors
    * frame carries the `geo_fp` stamp, every served row is checked
    * against the serving geometry's fingerprint INSIDE the scan it
    * already pays (zero extra passes) — a vector encoded under a
    * different geometry raises mid-query naming both fingerprints.
    * Stamp-less frames (pre-stamp parquet) pass unchecked, documented
    * as the caller's contract. Null-safe: an unexpectedly-null stamp
    * fails the check rather than slipping through. */
  private def guardGeometry(vectors: DataFrame, expected: Long,
                            where: String): DataFrame =
    if (!vectors.columns.contains("geo_fp")) vectors
    else vectors.filter(
      when(!(col("geo_fp") <=> lit(expected)),
        raise_error(concat(
          lit(s"$where: VectorIndex geometry mismatch — vectors encoded " +
            "under fingerprint "), col("geo_fp").cast("string"),
          lit(s" but the serving geometry fingerprints to $expected; " +
            "re-encode the vectors or serve with the matching index"))))
        .otherwise(lit(true)))

  /** Train a [[VectorIndex]]: coarse centroids (first-N deterministic
    * quantizer at `trainIters` = 0 — the oracle mode — or Lloyd-refined
    * past it), PQ codebooks ([[pqTrain]] machinery, shared
    * determinism), then ONE map-only encode pass computing cell,
    * pq_cell and codes per vector against the driver-constant geometry
    * (the [[pqEncode]] discipline — the corpus is scanned once and
    * never shuffled). Serving parity: [[ivfTopKAgainst]] over this
    * index ≡ [[ivfTopK]] of the same corpus at matching (nlist,
    * nprobe, trainIters), and [[ivfPqTopKAgainst]] ≡ [[ivfPqTopK]] at
    * matching params with `trainIters` = 0 (the one-shot IVF-PQ always
    * uses the first-N coarse quantizer). At 100 TB, pass a hash-sample
    * as `trainOn` to fit the geometry and the full corpus as `corpus`
    * — training converges on a sample; encoding is map-only either
    * way. */
  def buildVectorIndex(corpus: DataFrame, nlist: Int = 16, m: Int = 8,
                       codebookSize: Int = 16, iters: Int = 3,
                       trainIters: Int = 0,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       trainOn: DataFrame = null): VectorIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val train = Option(trainOn).getOrElse(corpus)
    val centsRaw = if (trainIters > 0)
      trainCentroids(train, nlist, trainIters, idCol, vecCol)
    else centroids(train, nlist, idCol, vecCol)
    val centArr: Array[(Long, Seq[Double])] = centsRaw
      .select(col("centroid_id").cast("long"), asDouble(col("centroid")))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    require(centArr.nonEmpty, "buildVectorIndex: empty training corpus")
    val (_, books) = pqTrainArrays(train, m, codebookSize, iters, idCol, vecCol)
    VectorIndex(
      centArr.toSeq.toDF("cell", "centroid"),
      books.toSeq.toDF("sub", "centroid_id", "centroid"),
      encodeIntoIndex(corpus, centArr, books, idCol, vecCol))
  }

  /** The shared map-only encode pass: cell (cosine coarse), pq_cell
    * (L2 coarse — the [[ivfPqTopK]] assignment), codes — all three
    * from baked driver-constant kernels, zero shuffle. Package-visible
    * so [[graft.streaming.Streaming.encodeVectorsStream]] runs the
    * IDENTICAL kernels over an arriving stream. */
  private[graft] def encodeIntoIndex(corpus: DataFrame,
                              centArr: Array[(Long, Seq[Double])],
                              books: Array[(Int, Long, Seq[Double])],
                              idCol: String, vecCol: String): DataFrame = {
    val ge = graft.expressions.GraftExpressions
    val coarseBooks = centArr.map { case (cid, v) => (0, cid, v) }.toSeq
    corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cv"))
      .select(col("corpus_id"),
        ge.nearestCentroid(col("cv"), centArr.toSeq, "cosine").as("cell"),
        ge.pqAssign(col("cv"), coarseBooks).getItem(0).as("pq_cell"),
        ge.pqAssign(col("cv"), books.toSeq).as("codes"),
        col("cv"),
        // the pinned-geometry stamp: a constant per encode pass, so it
        // costs one long per row, survives parquet, and lets merge and
        // serve verify geometry instead of trusting the caller
        lit(geometryFpArrays(centArr, books)).as("geo_fp"))
  }

  /** Encode a NEW batch with an existing index's geometry and add it —
    * incremental index MAINTENANCE, the ANN sibling of
    * [[graft.llm.Retrieval.mergeBm25Indexes]]: yesterday's index plus
    * today's batch equals one index over the union, with the geometry
    * (centroids + codebooks) FIXED — so the result is bit-identical to
    * [[buildVectorIndex]] of the union whenever the union's training
    * prefix equals the original's (e.g. first-N ids sit in the original
    * slice), and a valid same-geometry index regardless. The encode is
    * the same map-only pass as the build (geometry collected
    * driver-side — nlist·dim + m·k·w doubles, KB at any scale).
    *
    * CONTRACT: batches must cover DISJOINT corpus-id sets (each vector
    * indexed once) — the caller's invariant, as with BM25 parts. */
  def extendVectorIndex(index: VectorIndex, batch: DataFrame,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): VectorIndex = {
    val spark = index.vectors.sparkSession
    import spark.implicits._
    val centArr = index.centroids
      .select(col("cell").cast("long"), asDouble(col("centroid")))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val books = index.codebooks
      .select(col("sub").cast("int"), col("centroid_id").cast("long"),
        asDouble(col("centroid")))
      .as[(Int, Long, Seq[Double])].collect()
    // plan-side stamp check on the EXISTING rows (zero extra passes):
    // extending a hand-assembled index whose vectors were encoded under
    // a different geometry raises when the union is consumed, instead
    // of quietly mixing two coordinate systems
    val guarded = guardGeometry(index.vectors,
      geometryFpArrays(centArr, books), "extendVectorIndex")
    VectorIndex(index.centroids, index.codebooks,
      guarded.unionByName(
        encodeIntoIndex(batch, centArr, books, idCol, vecCol)))
  }

  /** Materialize a [[VectorIndex]] to parquet — the serving-side
    * lifecycle [[graft.llm.Retrieval.compactBm25Index]] gives the
    * sparse family: three frames under one root, `vectors`
    * repartitioned by coarse cell so each inverted list lands
    * contiguously (the probe join's access pattern). Returns the
    * reloaded (flat-lineage) index. At 100 TB the vectors write is
    * the one data-sized job; centroids/codebooks are geometry-sized
    * (KBs). */
  def saveVectorIndex(index: VectorIndex, path: String): VectorIndex = {
    val base = path.stripSuffix("/")
    index.centroids.write.mode("overwrite").parquet(s"$base/centroids")
    index.codebooks.write.mode("overwrite").parquet(s"$base/codebooks")
    index.vectors.repartition(col("cell"))
      .write.mode("overwrite").parquet(s"$base/vectors")
    loadVectorIndex(index.vectors.sparkSession, base)
  }

  /** Reload a [[saveVectorIndex]]-materialized index from parquet. */
  def loadVectorIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): VectorIndex = {
    val base = path.stripSuffix("/")
    VectorIndex(spark.read.parquet(s"$base/centroids"),
      spark.read.parquet(s"$base/codebooks"),
      spark.read.parquet(s"$base/vectors"))
  }

  /** [[saveVectorIndex]] for an index whose GEOMETRY frames are the ones
    * already materialized at `fromPath` — the feed-apply / extend
    * lifecycle shape ([[applyFeedToVectorIndex]] and
    * [[extendVectorIndex]] return the input index's `centroids` /
    * `codebooks` references untouched, and a tracked consumer's input
    * index IS a load of the previous immutable state dir). Centroids and
    * codebooks are copied FILE-LEVEL from `fromPath` (byte-identical
    * parquet, zero Spark jobs instead of two read→shuffle-free→write
    * cycles per maintenance tick); only the vectors frame — the one
    * data-sized job — is written. CONTRACT: `index.centroids` /
    * `index.codebooks` must be (or be value-equal to) the frames
    * persisted under `fromPath`; callers that mutated geometry must use
    * [[saveVectorIndex]]. Reloads ride explicit schemas — zero
    * footer-inference jobs. */
  def saveVectorIndexFrom(index: VectorIndex, fromPath: String,
                          path: String): VectorIndex = {
    val spark = index.vectors.sparkSession
    val base = path.stripSuffix("/")
    val from = fromPath.stripSuffix("/")
    val hconf = spark.sessionState.newHadoopConf()
    Seq("centroids", "codebooks").foreach { part =>
      val src = new org.apache.hadoop.fs.Path(s"$from/$part")
      val dst = new org.apache.hadoop.fs.Path(s"$base/$part")
      val fs = src.getFileSystem(hconf)
      if (fs.exists(dst)) fs.delete(dst, true)
      require(org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst,
        false, hconf),
        s"saveVectorIndexFrom: copy $src -> $dst failed")
    }
    val vSchema = index.vectors.schema
    index.vectors.repartition(col("cell"))
      .write.mode("overwrite").parquet(s"$base/vectors")
    VectorIndex(
      spark.read.schema(index.centroids.schema)
        .parquet(s"$base/centroids"),
      spark.read.schema(index.codebooks.schema)
        .parquet(s"$base/codebooks"),
      spark.read.schema(vSchema).parquet(s"$base/vectors"))
  }

  /** Consume a [[graft.core.Lakehouse.changesBetween]] feed into a
    * [[VectorIndex]] — FEED-DRIVEN index maintenance: the index tracks
    * a mutating lakehouse corpus by applying window deltas instead of
    * re-encoding (or even re-reading) the corpus. The feed's keys
    * (delete AND insert — the upsert treatment, like
    * [[graft.core.Lakehouse.applyChangesByKey]], so re-applying a
    * re-pulled open window refreshes rather than duplicates) retract
    * their vectors with one anti-join over the index's OWN vectors
    * frame, and the insert rows encode against the index's pinned
    * geometry (the [[extendVectorIndex]] map-only pass — the
    * geometry-drift gate stays [[maintainVectorIndex]]'s certify job,
    * at its own cadence). Cost: one pass over the index plus one over
    * the feed — the SOURCE table is never read; that is the point of
    * consuming the feed. Epoch/floor discipline rides the feed
    * itself: [[graft.core.Lakehouse.changesBetween]] already raises on
    * expired or cross-compaction windows. Oracled: bootstrap + feed ≡
    * the one-shot index of the live corpus, serve-for-serve. */
  def applyFeedToVectorIndex(index: VectorIndex, feed: DataFrame,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding"): VectorIndex = {
    val spark = index.vectors.sparkSession
    import spark.implicits._
    val centArr = index.centroids
      .select(col("cell").cast("long"), asDouble(col("centroid")))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val books = index.codebooks
      .select(col("sub").cast("int"), col("centroid_id").cast("long"),
        asDouble(col("centroid")))
      .as[(Int, Long, Seq[Double])].collect()
    val keys = feed.select(col(idCol).as("corpus_id")).distinct()
    val kept = guardGeometry(index.vectors,
        geometryFpArrays(centArr, books), "applyFeedToVectorIndex")
      .join(keys, Seq("corpus_id"), "left_anti")
    val inserts = feed.filter(col("__op") === "insert")
    VectorIndex(index.centroids, index.codebooks,
      kept.unionByName(
        encodeIntoIndex(inserts, centArr, books, idCol, vecCol)))
  }

  /** Merge same-geometry [[VectorIndex]] parts (disjoint corpus-id
    * slices, each encoded against IDENTICAL centroids + codebooks —
    * e.g. via [[extendVectorIndex]] or per-batch
    * [[buildVectorIndex]] with a shared `trainOn`): vectors union;
    * geometry is taken from the head. Geometry equality is VERIFIED,
    * not trusted: every part's [[geometryFingerprint]] is recomputed
    * (O(geometry) — KB-scale driver collects, no data-plane work) and
    * a mismatch throws naming the offending parts, turning what used
    * to be a silent wrong-answer merge into a loud error
    * (docs/sketches.md geometry pinning, enforced). Disjointness of
    * the corpus-id slices remains the caller's contract (checking it
    * IS a data-plane join). */
  def mergeVectorIndexes(parts: Seq[VectorIndex]): VectorIndex = {
    require(parts.nonEmpty, "mergeVectorIndexes needs at least one part")
    val fps = parts.map(_.geometryFp)
    val bad = fps.zipWithIndex.filter(_._1 != fps.head)
    require(bad.isEmpty,
      s"mergeVectorIndexes: geometry fingerprint mismatch — part 0 has " +
        s"${fps.head} but " +
        bad.map { case (fp, i) => s"part $i has $fp" }.mkString(", ") +
        "; parts must be encoded under identical centroids+codebooks " +
        "(extendVectorIndex or a shared trainOn)")
    VectorIndex(parts.head.centroids, parts.head.codebooks,
      parts.map(_.vectors).reduce(_ unionByName _))
  }

  /** IVF top-k against a pre-built (possibly parquet-reloaded)
    * [[VectorIndex]] — the serving path: queries probe their `nprobe`
    * nearest centroids by cosine (nlist broadcast rows), then exact
    * cosine ONLY within probed cells, map-side rank-pruned top-k.
    * Semantics and output exactly as [[ivfTopK]] — which this
    * reproduces bit-for-bit over `buildVectorIndex` of the same corpus
    * (monotone cell re-map preserves every tie-break) — but with zero
    * training or assignment work in the serving plan. Geometry is
    * verified in-plan via the `geo_fp` stamp (see
    * [[geometryFingerprint]]): a vectors frame encoded under different
    * centroids raises mid-query instead of scoring wrong cells. */
  def ivfTopKAgainst(index: VectorIndex, queries: DataFrame, k: Int,
                     nprobe: Int = 4, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val vectors = guardGeometry(index.vectors,
      index.geometryFp, "ivfTopKAgainst")
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val qprobe = q.crossJoin(broadcast(index.centroids))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("centroid")).as("csim"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("csim").desc, col("cell"))
    val probes = qprobe.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe).select("query_id", "qv", "cell")
    val scored = vectors.join(probes, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("cv"), col("qv")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        round(col("sim"), 6).as("sim"))
  }

  /** IVF-PQ top-k against a pre-built [[VectorIndex]] — the serving
    * path of [[ivfPqTopK]]: probe `nprobe` nearest L2 coarse cells,
    * ADC-score only vectors in those cells against broadcast per-query
    * lookup tables, keep `rerank·k` candidates, re-score those exactly
    * by cosine (sims exact; the index only prunes). Bit-identical to
    * the one-shot [[ivfPqTopK]] over an index built with matching
    * params and `trainIters` = 0, with zero training stages in the
    * serving plan. */
  def ivfPqTopKAgainst(index: VectorIndex, queries: DataFrame, k: Int,
                       nprobe: Int = 4, rerank: Int = 4,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val spark = index.vectors.sparkSession
    import spark.implicits._
    val ge = graft.expressions.GraftExpressions
    val books = index.codebooks
      .select(col("sub").cast("int"), col("centroid_id").cast("long"),
        asDouble(col("centroid")))
      .as[(Int, Long, Seq[Double])].collect()
    require(books.nonEmpty, "ivfPqTopKAgainst: empty codebooks")
    val centArr = index.centroids
      .select(col("cell").cast("long"), asDouble(col("centroid")))
      .as[(Long, Seq[Double])].collect()
    val vectors = guardGeometry(index.vectors,
      geometryFpArrays(centArr, books), "ivfPqTopKAgainst")
    val m = books.map(_._1).max + 1
    val w = books.head._3.size
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("d2").asc, col("cell"))
    val probes = q.crossJoin(broadcast(index.centroids))
      .select(col("query_id"), col("cell"),
        ge.l2DistanceSq(col("qv"), col("centroid")).as("d2"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cell").as("pq_cell"))
    val luts = adcLuts(q, index.codebooks, m, w)
    val approx = vectors
      .join(broadcast(probes), Seq("pq_cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(luts), Seq("query_id", "sub", "code"))
      .groupBy("query_id", "corpus_id")
      .agg(sum("part").as("approx_dot"))
    exactRerank(topApprox(approx, k, rerank), index.vectors, q, k,
      "corpus_id", "cv")
  }

  /** Certify a [[VectorIndex]]'s serving quality — the
    * docs/sketches.md lifecycle's "certification failure → regenerate"
    * trigger as a reusable, driver-visible operator: recall@k /
    * reciprocal rank / nDCG of the IVF SERVING path
    * ([[ivfTopKAgainst]], or [[ivfPqTopKAgainst]] with
    * `strategy = "ivfpq"` — whichever path production queries take)
    * against brute-force cosine truth over the index's own vectors, on a
    * HASH-DETERMINISTIC query sample (ordered by md5 of the id —
    * engine-portable, content-independent, so the certificate is
    * reproducible and twin-checkable, never a random() draw). One row
    * per sampled query ([[graft.llm.Retrieval.rankingMetrics]]
    * schema); gate on `min(recall)` or `avg(recall)` against the
    * deployment's floor and retrain below it.
    *
    * Scale shape: the sample is `sampleN` rows (TakeOrderedAndProject
    * — never a full sort materialization); truth is one broadcast
    * sample × vectors scan; the serving run is the normal probed-cells
    * path. Everything downstream is |sample|·k-bounded. */
  def certifyVectorIndex(index: VectorIndex, k: Int = 10,
                         nprobe: Int = 4, sampleN: Int = 16,
                         strategy: String = "ivf",
                         rerank: Int = 4): DataFrame = {
    require(k > 0 && nprobe > 0 && sampleN > 0,
      s"certifyVectorIndex: bad k=$k / nprobe=$nprobe / sampleN=$sampleN")
    require(Set("ivf", "ivfpq").contains(strategy),
      s"certifyVectorIndex: strategy '$strategy' not in {ivf, ivfpq}")
    val sample = index.vectors
      .orderBy(md5(col("corpus_id").cast("string").cast("binary")),
        col("corpus_id"))
      .limit(sampleN)
      .select(col("corpus_id").as("vec_id"), col("cv").as("embedding"))
    val served =
      if (strategy == "ivf") ivfTopKAgainst(index, sample, k, nprobe)
      else ivfPqTopKAgainst(index, sample, k, nprobe, rerank)
    val run = served
      .select(col("query_id"), col("corpus_id").as("doc_id"), col("rank"))
    val truth = bruteForceTopK(
        index.vectors.select(col("corpus_id").as("vec_id"),
          col("cv").as("embedding")),
        sample, k)
      .select(col("query_id"), col("corpus_id").as("doc_id"))
    graft.llm.Retrieval.rankingMetrics(run, truth, k)
  }

  /** The outcome of one [[maintainVectorIndex]] cycle: the index to
    * serve from, its (re-)certification frame
    * ([[graft.llm.Retrieval.rankingMetrics]] schema over the
    * deterministic sample), whether the regenerate path fired, and the
    * two gate readings (avg recall of the extended index, avg recall
    * of the returned index — equal when no rebuild happened). */
  final case class VectorMaintenance(index: VectorIndex,
                                     certificate: DataFrame,
                                     rebuilt: Boolean,
                                     extendedRecall: Double,
                                     finalRecall: Double)

  private def avgRecall(cert: DataFrame): Double = {
    val r = cert.agg(avg("recall")).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** The certify→regenerate maintenance LOOP, wired shut — the
    * docs/sketches.md lifecycle trigger as one operator instead of a
    * runbook: extend the serving index with today's batch (fixed
    * geometry, map-only encode), certify the extended index on the
    * hash-deterministic sample ([[certifyVectorIndex]]), and when
    * `avg(recall@k) < minRecall` — the centroid-drift failure repeated
    * [[extendVectorIndex]] accumulates, exactly what the docs name —
    * REBUILD from the full corpus (fresh geometry: nlist/m/codebookSize
    * derived from the old index, `trainIters` Lloyd rounds over
    * `trainOn` — pass a hash-sample at 100 TB; the geometry-training
    * discipline of [[buildVectorIndex]]) and re-certify. Returns the
    * index that PASSED (or the rebuilt one with its honest certificate
    * if even a rebuild cannot reach the floor — the caller's signal
    * that k/nprobe, not the geometry, is the problem), never a
    * silently-degraded extension.
    *
    * Batch-vs-index disjointness stays the extend contract; the
    * gate itself costs one |sample|-bounded certify (plus one full
    * re-encode scan ONLY when the trigger fires — the paid
    * regeneration, by design a rare event at a maintenance cadence). */
  def maintainVectorIndex(index: VectorIndex, batch: DataFrame,
                          corpus: DataFrame, minRecall: Double,
                          k: Int = 10, nprobe: Int = 4,
                          sampleN: Int = 16, strategy: String = "ivf",
                          rerank: Int = 4, iters: Int = 3,
                          trainIters: Int = 0,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          trainOn: DataFrame = null): VectorMaintenance = {
    require(minRecall >= 0.0 && minRecall <= 1.0,
      s"maintainVectorIndex: minRecall=$minRecall outside [0, 1]")
    val spark = index.vectors.sparkSession
    import spark.implicits._
    val extended = extendVectorIndex(index, batch, idCol, vecCol)
    // materialized once driver-side (|sample| rows — bounded): the
    // gate below and the caller consume the same executed audit. NOT
    // persist() — a leaked cache entry would substitute into any
    // later canonically-equal plan (the r17 bench bimodality; see
    // [[graft.llm.Retrieval.materializeBounded]]).
    val cert = Retrieval.materializeBounded(
      certifyVectorIndex(extended, k, nprobe, sampleN, strategy,
        rerank))
    val extRecall = avgRecall(cert)
    if (extRecall >= minRecall)
      VectorMaintenance(extended, cert, rebuilt = false, extRecall,
        extRecall)
    else {
      // geometry shape derives from the OLD index (KB-scale driver
      // reads); the retrain itself sees the full corpus (or trainOn)
      val nlist = index.centroids.count().toInt
      val books = index.codebooks
        .select(col("sub").cast("int")).as[Int].collect()
      val m = books.max + 1
      val codebookSize = books.length / m
      val regenerated = buildVectorIndex(corpus, nlist, m, codebookSize,
        iters, trainIters, idCol, vecCol, trainOn)
      val recert = Retrieval.materializeBounded(
        certifyVectorIndex(regenerated, k, nprobe, sampleN, strategy,
          rerank))
      VectorMaintenance(regenerated, recert, rebuilt = true, extRecall,
        avgRecall(recert))
    }
  }

  def hyperplaneSignature(vec: Column, nPlanes: Int = 16, table: Int = 0): Column = {
    val planes = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(asDouble(vec), sequence(lit(0), size(vec) - 1),
          // deterministic pseudo-random weight in [-1,1) per (table, plane, dim)
          (x, i) => x * (pmod(xxhash64(lit(table * 4096 + p), i), lit(2000001L))
            .cast("double") / 1000000.0 - 1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Multi-table bucketed neighbor candidates: vectors are candidates when
    * they share a full signature in ANY of `nTables` independent tables —
    * the standard OR-construction (per-table recall p^nPlanes, overall
    * 1-(1-p^nPlanes)^nTables). Used as the pre-filter in front of exact
    * re-ranking; shuffle cost is (id, table, sig) rows, never vectors. */
  def lshBucketCandidates(corpus: DataFrame, nPlanes: Int = 16,
                          nTables: Int = 8,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    // ONE compiled pass computes all nTables signatures (vs the column
    // formulation's nTables×nPlanes interpreted folds over the vector)
    val sigArray = graft.expressions.GraftExpressions
      .hyperplaneSignatures(col(vecCol), nPlanes, nTables)
    val sigs = corpus
      .select(col(idCol).as("id"), posexplode(sigArray).as(Seq("table", "sig")))
      .repartition(col("id")) // materialization boundary (see Dedup.lshCandidates)
    val a = sigs.select(col("table"), col("sig"), col("id").as("i"))
    val b = sigs.select(col("table"), col("sig"), col("id").as("j"))
    a.join(b, Seq("table", "sig")).filter(col("i") < col("j"))
      .select("i", "j").distinct()
  }
}
