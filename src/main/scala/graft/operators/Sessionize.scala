package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: a new session starts when
  * the gap to the previous event of the same key exceeds `gapSeconds`.
  * Batch formulation = lag + cumulative sum over a per-key window (two
  * passes over one shuffle of the events by key); the streaming equivalent
  * is `session_window`/`flatMapGroupsWithState` (graft.streaming).
  */
object Sessionize {

  /** Tag every event with its session ordinal per key (1-based).
    * `tieBreak` columns pin a total order under equal timestamps. */
  def withSessionIds(events: DataFrame, keyCol: String, tsCol: String,
                     gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val order = col(tsCol) +: tieBreak.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    // whole-second gap (floor of epoch) — portable across engines
    val gap = unix_timestamp(col(tsCol)) -
      unix_timestamp(lag(col(tsCol), 1).over(w))
    events
      .withColumn("__new_session",
        when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-session rollup: start/end, event count, decimal-exact value sum. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gapSeconds: Long, valueCol: String,
               tieBreak: Seq[String] = Nil): DataFrame =
    withSessionIds(events, keyCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"),
        graft.functions.Exact.dsum(col(valueCol)).as("total_value"))
}
