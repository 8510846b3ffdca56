package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation. Web-scale training
  * pipelines weight documents by the quality of their source in the
  * hyperlink graph (the CommonCrawl host-ranking recipe); this is the
  * relational PageRank behind that signal, built for the same
  * cross-engine determinism bar as the rest of the library.
  *
  * Everything runs in SCALED-INTEGER arithmetic: float PageRank sums
  * are partition-order-dependent (the corpus_report lesson — IEEE
  * addition does not associate), so ranks are maintained as longs in
  * units of `scale = max(10⁴, 10¹⁷ DIV |V|)`, contributions use
  * integer division (`rank DIV outdeg` — dropped remainders leak a
  * negligible ≤ outdeg·|V| units per iteration and keep every value
  * exactly reproducible on any engine), and damping is the integer
  * `(dampingPct · Σ) DIV 100`. The scale formula makes overflow
  * IMPOSSIBLE by construction: total mass never exceeds |V|·scale ≤
  * 10¹⁷, so the worst single-node sum times 99 stays under 2⁶³.
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
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 10, dampingPct: Int = 85,
               checkpointInterval: Int = 10): DataFrame = {
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
    val scale = math.max(10000L, 100000000000000000L / n)
    val base = scale * (100 - dampingPct) / 100
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(true)
    var ranks = nodes.withColumn("rank_scaled", lit(scale))
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
}
