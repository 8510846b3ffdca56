package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over event streams: as-of join and bounded
  * range join. Spark has no native ASOF/range join, and the naive
  * formulations (per-row correlated subquery; unbounded theta join) do
  * not survive scale — these are the standard shuffle-bounded
  * re-expressions:
  *
  *  - [[asofJoin]] is ONE window pass over the union of both sides (the
  *    "merge the streams, carry the last right row forward" layout): a
  *    single exchange on the join keys, no per-row probing, no range
  *    explosion.
  *  - [[rangeJoin]] buckets time into `hi-lo`-wide bins so each left row
  *    equi-joins at most two right bins: the cross-product is bounded by
  *    actual temporal locality instead of key cardinality.
  */
object TemporalJoins {

  /** As-of join: for each left row, the single right row with the
    * greatest `rightTsCol <= leftTsCol` in the same `on` group (inclusive
    * match at equal timestamps — the conventional ASOF `>=` semantics).
    * Left rows with no prior right row keep NULL carried columns. NULL
    * join keys never match (SQL ASOF/equi-join semantics; a null-keyed
    * left row always carries NULLs), matching the streaming
    * [[graft.streaming.Streaming.enrichAsOf]].
    *
    * `carry` maps right-side column → output name. Right rows that tie on
    * (keys, timestamp) are reduced to one deterministic representative —
    * the lexicographic max of the carried struct — BEFORE the merge, so
    * results never depend on partitioning.
    *
    * Plan shape: right groupBy (partial-agg) → union with left → one
    * window exchange on `on` → filter. The window partition is the join
    * key group, so skew follows key skew exactly like any keyed join and
    * AQE's skew handling applies. */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTsCol: String, rightTsCol: String,
               carry: Map[String, String]): DataFrame = {
    require(on.nonEmpty, "asofJoin needs at least one equality key")
    val outNames = carry.values.toSeq.sorted
    // null join keys never match (SQL ASOF/equi-join semantics — and
    // parity with the streaming enrichAsOf, whose === condition drops
    // them): without this filter the window's partitionBy would group
    // null-keyed left and right rows TOGETHER and "match" them
    val rightNonNull = right.filter(on.map(col(_).isNotNull).reduce(_ && _))
    // one right representative per (keys, ts): lexicographic-max struct
    val rightAgg = rightNonNull.groupBy(
        (on.map(col) :+ col(rightTsCol).as("__ts")): _*)
      .agg(max(struct(carry.toSeq.sortBy(_._1).map { case (c, out) =>
        col(c).as(out) }: _*)).as("__carry"))
    val leftTagged = left.select(
      (left.columns.map(col).toSeq :+ col(leftTsCol).as("__ts") :+
        lit(1).as("__side") :+ lit(null).cast(rightAgg.schema("__carry")
          .dataType).as("__carry")): _*)
    val rightTagged = rightAgg.select(
      (left.columns.map(c => if (on.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)).toSeq :+
        col("__ts") :+ lit(0).as("__side") :+ col("__carry")): _*)
    // right rows sort before left at equal ts → inclusive as-of match
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = leftTagged.unionByName(rightTagged)
      .withColumn("__match", last(col("__carry"), ignoreNulls = true).over(w))
    merged.filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        outNames.map(n => col(s"__match.$n").as(n)): _*)
  }

  /** Bounded range join: pairs (left, right) in the same `on` group with
    * `rightUs - leftUs` in `[loUs, hiUs]` (microsecond epoch columns).
    * Returns left ++ right-carried columns ++ `dt_us`.
    *
    * Each side is bucketed into `hi-lo`-wide time bins; a left row can
    * only match rights in ⌈window/bin⌉+1 ≤ 2 consecutive bins, so the
    * plan is a plain equi-join on (keys, bin) — shuffle bounded by
    * temporal density, never a full per-key cross product — followed by
    * the exact range filter. */
  def rangeJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                leftUsCol: String, rightUsCol: String,
                loUs: Long, hiUs: Long,
                carry: Map[String, String]): DataFrame = {
    require(hiUs >= loUs, s"empty range [$loUs, $hiUs]")
    val binUs = math.max(hiUs - loUs, 1L)
    // integral DIV, not double floor-division: epoch-µs values approach
    // 2^51 where float quotients can misround a bin boundary. With a
    // negative loUs (look-back range) `ts + loUs` CAN go negative, where
    // truncating DIV ≠ floor — correctness does not rest on that: BOTH
    // sides bucket with the identical monotone truncating DIV, so every
    // in-range (left, right) pair still lands within one bin of each
    // other and the exact range filter below decides membership. Do not
    // "simplify" one side to a different division.
    val l = left.withColumn("__bin",
      explode(sequence(expr(s"(`$leftUsCol` + $loUs) DIV $binUs"),
        expr(s"(`$leftUsCol` + $hiUs) DIV $binUs"))))
    val r = right.select(
      (on.map(col) :+ col(rightUsCol).as("__rus") :+
        expr(s"`$rightUsCol` DIV $binUs").as("__bin")) ++
        carry.toSeq.sortBy(_._1).map { case (c, out) => col(c).as(out) }: _*)
    l.join(r, on :+ "__bin")
      .filter((col("__rus") - col(leftUsCol)).between(loUs, hiUs))
      .select(left.columns.map(col).toSeq ++
        carry.values.toSeq.sorted.map(col) :+
        (col("__rus") - col(leftUsCol)).as("dt_us"): _*)
  }
}
