package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Link-graph centrality for corpus curation. Web-scale training
  * pipelines weight documents by the quality of their source in the
  * hyperlink graph (the CommonCrawl host-ranking recipe); this is the
  * relational PageRank behind that signal, built for the same
  * cross-engine determinism bar as the rest of the library.
  *
  * Everything runs in SCALED-INTEGER arithmetic: float PageRank sums
  * are partition-order-dependent (the corpus_report lesson — IEEE
  * addition does not associate), so ranks are maintained as longs in
  * units of `scale = max(10⁴, 9·10¹⁶ DIV |V|)`, contributions use
  * integer division (`rank DIV outdeg` — dropped remainders leak a
  * negligible ≤ outdeg·|V| units per iteration and keep every value
  * exactly reproducible on any engine), and damping is the integer
  * `(dampingPct · Σ) DIV 100`. The scale formula makes overflow
  * impossible by construction FOR |V| ≤ 9·10¹² (enforced loudly):
  * total mass starts at |V|·scale ≤ 9·10¹⁶ and the update rule
  * preserves that invariant (Σr' ≤ |V|·scale·(100−d)/100 +
  * d/100·Σcontrib ≤ |V|·scale), so even a star graph concentrating the
  * ENTIRE mass on one node keeps the damping product
  * `99 · 9·10¹⁶ = 8.91·10¹⁸` under 2⁶³−1 ≈ 9.22·10¹⁸ for every
  * dampingPct ≤ 99; past the 10⁴ scale floor the bound would lapse,
  * so larger graphs are refused rather than silently wrapped.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list.
    *
    * Semantics: ranks start at `scale` per node;
    * `r'(v) = (scale·(100−dampingPct)) DIV 100 +
    * (dampingPct · Σ_{u→v} r(u) DIV outdeg(u)) DIV 100`. Duplicate
    * edges are collapsed (multi-edges would double-count mass);
    * dangling nodes (no out-edges) keep receiving the base term but
    * their mass is not redistributed — the standard "removed dangling
    * mass" variant; feed reciprocal edges if the graph should conserve
    * it. Output: (node STRING, rank_scaled LONG) for every node, in
    * units of the internal scale (ratios and order are the product —
    * the scale cancels).
    *
    * 100 TB shape: the node set and the outdeg-annotated edge list are
    * materialized ONCE (eager localCheckpoint — the
    * [[Dedup.connectedComponents]] discipline; left lazy, every
    * iteration would re-derive them and the plan doubles per round:
    * measured 2^iters source scans). Each iteration then costs one
    * src-keyed join of the rank vector against the checkpointed edges
    * plus one dst-keyed aggregate; the edge side's exchange is
    * identical across iterations, so AQE reads it back as a
    * ReusedExchange (executed-plan-asserted in PlanShapeSpec — exactly
    * one edge-leaf exchange executes). `checkpointInterval` truncates
    * the rank lineage every k iterations for deep runs. A sizing
    * `count()` runs eagerly to fix the scale (the Similarity
    * auto-cluster precedent). */
  /** WARM START (`ranks0`): pass a previous [[pageRank]] output
    * (node, rank_scaled) to seed iteration 1 from it instead of the
    * uniform `scale` — the maintainable form for a GROWING crawl
    * graph: `warm(coldRun(j), k)` ≡ `coldRun(j + k)` exactly on an
    * unchanged graph (so a converged state is a fixed point), and on a
    * grown graph the converged old ranks skip most of the cold
    * iterations. Nodes absent from `ranks0` seed at `scale` (the cold
    * value); duplicate warm rows collapse deterministically to min;
    * negative warm ranks are refused loudly. Because a grown graph
    * SHRINKS the internal scale, the combined seed mass can exceed the
    * |V|·scale overflow budget — when it does, every seed is rescaled
    * by the exact DECIMAL factor (|V|·scale)/Σ (floor, monotone — the
    * relative ordering warm-starting preserves is untouched), restoring
    * the mass invariant the overflow-impossibility argument needs. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, dampingPct: Int = 85,
               checkpointInterval: Int = 10,
               ranks0: DataFrame = null): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters=$iters outside [1, 100]")
    require(dampingPct >= 1 && dampingPct <= 99,
      s"dampingPct=$dampingPct outside [1, 99]")
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty edge list")
    // the overflow-impossibility argument (total mass ≤ |V|·scale ≤
    // 9·10¹⁶, so 99·mass < 2⁶³ even if a star graph lands it all on
    // one node) needs scale = 9·10¹⁶ DIV |V|; past 9·10¹² nodes the
    // 10⁴ floor would take over and the bound no longer holds — refuse
    // loudly
    require(n <= 9000000000000L,
      s"pageRank: $n nodes exceeds the 9*10^12 overflow-safety ceiling")
    val scale = math.max(10000L, 90000000000000000L / n)
    val base = scale * (100 - dampingPct) / 100
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(true)
    var ranks =
      if (ranks0 == null) nodes.withColumn("rank_scaled", lit(scale))
      else {
        val warm = ranks0.select(col("node").cast("string").as("node"),
            col("rank_scaled").cast("long").as("__warm"))
          .groupBy("node").agg(min("__warm").as("__warm"))
        val seeded = nodes.join(warm, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__warm"), lit(scale)).as("rank_scaled"))
        // one bounded aggregate decides the mass clamp; its min doubles
        // as the non-negativity gate (a negative warm rank is corrupt
        // input, not a mass to propagate)
        val chk = seeded.agg(
          sum(col("rank_scaled").cast(DecimalType(38, 0))).as("t"),
          min("rank_scaled").as("mn")).collect()(0)
        require(chk.getLong(1) >= 0L,
          s"pageRank: ranks0 contains a negative rank (${chk.getLong(1)})")
        val total = BigDecimal(chk.getDecimal(0))
        val cap = BigDecimal(scale) * BigDecimal(n)
        if (total <= cap) seeded
        else seeded.withColumn("rank_scaled",
          floor(col("rank_scaled").cast(DecimalType(38, 0)) *
            lit(cap.toBigInt.toString).cast(DecimalType(38, 0)) /
            lit(total.toBigInt.toString).cast(DecimalType(38, 0)))
            .cast("long"))
      }
    for (i <- 1 to iters) {
      val contrib = ranks.join(ew, col("node") === col("src"))
        .select(col("dst"), expr("rank_scaled DIV outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampingPct * coalesce(s, 0L)) DIV 100"))
            .as("rank_scaled"))
      if (checkpointInterval > 0 && i % checkpointInterval == 0 &&
          i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002's hard-
    * label variant): spread a sparse seed labeling through a directed
    * edge list — the weak-supervision recipe for labeling a corpus from
    * a small annotated set when a similarity/link graph exists (near-dup
    * clusters, citation links, host graphs). Each iteration, every
    * non-seed node takes the MAJORITY label among its in-neighbors'
    * current labels, ties broken by the lexicographically smallest
    * label (deterministic — no RNG, no engine dependence); seed nodes
    * stay pinned; nodes no label has reached yet stay NULL. Fixed
    * `iters` rounds, no convergence oracle needed.
    *
    * 100 TB shape: the edge list is checkpointed once (the [[pageRank]]
    * lesson); each iteration is one src-keyed join, one (dst, label)
    * count aggregate, and a per-dst argmax window whose partitions are
    * ≤ |label domain| rows AFTER aggregation (bounded — never raw
    * votes), then a node-keyed join pinning seeds. Output:
    * (node STRING, label STRING nullable). */
  /** WARM START (`labels0`): pass a previous [[labelPropagation]]
    * output (node, label) to seed round 1 from it instead of the bare
    * seed set — `warm(coldRun(j), k)` ≡ `coldRun(j + k)` exactly on an
    * unchanged graph (seeds stay pinned and always win over a
    * conflicting warm label; nodes absent from `labels0` start NULL as
    * in a cold run), so a converged labeling is a fixed point and a
    * grown graph re-labels incrementally instead of from scratch. */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
                       srcCol: String = "src", dstCol: String = "dst",
                       nodeCol: String = "node", labelCol: String = "label",
                       iters: Int = 5,
                       checkpointInterval: Int = 10,
                       labels0: DataFrame = null): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters=$iters outside [1, 100]")
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
      .localCheckpoint(true)
    // nodes feeds ONLY the checkpointed base below — checkpointing it
    // separately would buy nothing and cost an extra eager job
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // conflicting seed rows for one node collapse to the smallest
    // label (the same deterministic tie rule the votes use) — left as
    // two rows they would double-count that node's vote in every
    // neighbor's majority and emit duplicate output rows
    val sd = seeds.select(col(nodeCol).cast("string").as("node"),
      col(labelCol).cast("string").as("seed_label"))
      .filter(col("seed_label").isNotNull)
      .groupBy("node").agg(min("seed_label").as("seed_label"))
    // the node⊳seed join is loop-invariant — materialize it once and
    // re-join only the per-round votes
    val base = nodes.join(sd, Seq("node"), "left").localCheckpoint(true)
    val w = Window.partitionBy("dst")
      .orderBy(col("cnt").desc, col("label"))
    var labels =
      if (labels0 == null) base.select(col("node"), col("seed_label").as("label"))
      else {
        // duplicate warm rows collapse to min (the seed rule); seeds
        // pinned over warm labels via coalesce order
        val warm = labels0.select(col("node").cast("string").as("node"),
            col("label").cast("string").as("__warm"))
          .filter(col("__warm").isNotNull)
          .groupBy("node").agg(min("__warm").as("__warm"))
        base.join(warm, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("seed_label"), col("__warm")).as("label"))
      }
    for (i <- 1 to iters) {
      // the vote aggregate keeps its own (dst, label) exchange so the
      // raw vote stream map-side combines; the argmax window's input is
      // the aggregated (≤ |nodes|·|labels|) table, so its dst exchange
      // moves bounded rows
      val vote = labels.filter(col("label").isNotNull)
        .join(e, col("node") === col("src"))
        .groupBy("dst", "label").agg(count(lit(1)).as("cnt"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("dst").as("node"), col("label").as("vote_label"))
      labels = base.join(vote, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("seed_label"), col("vote_label")).as("label"))
      if (checkpointInterval > 0 && i % checkpointInterval == 0 &&
          i < iters)
        labels = labels.localCheckpoint(true)
    }
    labels
  }
}
