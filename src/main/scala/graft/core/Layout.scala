package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional lake layout: Z-order (Morton-curve) clustering so
  * parquet row-group and file min/max stats prune scans with
  * predicates over SEVERAL columns at once.
  *
  * Why this exists at 100 TB: a lake table is written once and scanned
  * thousands of times, and the scan cost is decided by how many row
  * groups the reader can SKIP. A linear sort on one column makes that
  * column's min/max ranges disjoint (perfect pruning) and leaves every
  * other column's ranges spanning the whole domain (zero pruning). The
  * Z-curve interleaves the bits of k quantized column ranks
  * ([[graft.expressions.InterleaveBits]]), so consecutive keys are
  * neighbors in EVERY dimension — each output file covers a small
  * hyper-rectangle of the value space, and a predicate box touches
  * O(selectivity) of them instead of all (the OPTIMIZE ZORDER pattern;
  * Morton 1966). The layout changes WHERE rows land, never what they
  * are — results of any query are invariant (oracled).
  *
  * Plan shape: one tiny min/max aggregate (k columns, ONE row,
  * broadcast), one map-side quantize+interleave projection, one range
  * exchange on the Z key, an intra-partition sort. No shuffle beyond
  * the one the layout IS; scales as a single pass over the table. */
object Layout {

  /** Quantized cell index of `c` within [mn, mx]: `floor((c − mn) /
    * (mx − mn) · 2^bits)` clamped to [0, 2^bits − 1] — plain min-max
    * scaling (each cell an equal value-width slice; IEEE-deterministic
    * and cheap to reproduce in any engine). Nulls and degenerate
    * domains (mx ≤ mn) map to cell 0: layout needs SOME total order
    * for every row, and a constant column carries no pruning signal
    * anyway. */
  private def quantize(c: Column, mn: Column, mx: Column,
                       bits: Int): Column = {
    val cells = 1L << bits
    when(c.isNull || mx <= mn, lit(0L))
      .otherwise(least(lit(cells - 1), greatest(lit(0L),
        floor((c.cast("double") - mn) / (mx - mn) * cells))))
  }

  /** Append the Morton key of `cols` as `zCol` (default `__z`): each
    * column min-max-quantized to `bits` bits over ITS OWN observed
    * domain (one broadcast stats row), then bit-interleaved. The key
    * is what [[zorder]] partitions and sorts by; exposed separately so
    * callers can bucket, range-join, or oracle it directly.
    * Numeric/timestamp columns only (cast to double for scaling);
    * `k · bits ≤ 63`. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 12,
             zCol: String = "__z"): DataFrame = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"k·bits must fit a signed LONG: got ${cols.size} cols × $bits bits")
    val stats = df.agg(
      min(col(cols.head).cast("double")).as("__mn0"),
      (cols.tail.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(col(c).cast("double")).as(s"__mn${i + 1}"),
          max(col(c).cast("double")).as(s"__mx${i + 1}"))
      } :+ max(col(cols.head).cast("double")).as("__mx0")): _*)
    // ONE stats row joined to every row — Spark broadcasts a 1-row side
    val withStats = df.crossJoin(broadcast(stats))
    val cells = cols.zipWithIndex.map { case (c, i) =>
      quantize(col(c), col(s"__mn$i"), col(s"__mx$i"), bits)
    }
    withStats
      .withColumn(zCol,
        graft.expressions.GraftExpressions.interleaveBits(cells, bits))
      .drop(cols.indices.flatMap(i => Seq(s"__mn$i", s"__mx$i")): _*)
  }

  /** Z-order-cluster `df` for writing: Morton key → ONE range exchange
    * into `partitions` output slices → intra-partition sort → key
    * dropped. Write the result straight to parquet; each output file
    * then covers a compact hyper-rectangle of (`cols`) space and
    * min/max row-group stats prune multi-column predicate boxes
    * (spec'd: strictly fewer files intersect a 2-D box than under a
    * single-column sort of the same data). Content is untouched —
    * every query over the result is bit-identical (oracled). */
  def zorder(df: DataFrame, cols: Seq[String], bits: Int = 12,
             partitions: Int = 0): DataFrame = {
    val keyed = zValue(df, cols, bits)
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions("__z").drop("__z")
  }
}
