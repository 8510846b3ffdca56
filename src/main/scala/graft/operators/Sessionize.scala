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

  // ------------------------------------------------ incremental forms
  // The steady state for a growing event log: instead of re-windowing
  // the full history per run, carry ONE row of open-session state per
  // key — (last event's whole-second epoch, last session ordinal) —
  // and tag each day's batch against it. Under the append-only
  // contract (every batch event at or after the carried state's last
  // event, per key — violations raise, never mis-tag) the incremental
  // ids are EXACTLY the ids a full recompute would assign to the same
  // rows: the first batch event per key continues the carried session
  // when its gap to the carried epoch is within `gapSeconds` and opens
  // session last+1 otherwise, which is precisely what lag+cumsum over
  // the full history computes at that row. State is |keys|-sized, the
  // batch window shuffles only the batch.

  /** The carried state: one row per key —
    * `(keyCol, last_ts_unix, last_session)` — from a full-history
    * [[withSessionIds]] pass (the bootstrap) or from
    * [[extendSessionState]] thereafter. `last_ts_unix` is the
    * whole-second epoch (the gap unit — portable, and sub-second order
    * never affects gaps); `last_session` the running per-key ordinal.
    * Persist as parquet; |keys| rows at any history length. */
  def sessionState(events: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long,
                   tieBreak: Seq[String] = Nil): DataFrame =
    withSessionIds(events, keyCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(keyCol))
      // session ids are nondecreasing in window order, so max(session)
      // IS the last event's session; max(epoch) its (floored) time
      .agg(max(unix_timestamp(col(tsCol))).as("last_ts_unix"),
        max(col("session_id")).as("last_session"))

  /** Tag a NEW batch with globally-consistent session ids against
    * carried [[sessionState]] — the serving path: one state join + one
    * batch-sized window, zero history rescan. Keys absent from the
    * state start at session 1 (a genuinely new key). The append-only
    * contract is enforced LOUDLY: a batch event strictly earlier
    * (whole-second) than its key's carried state raises mid-query
    * rather than silently mis-tagging — out-of-order arrivals need a
    * history rebuild, not an increment. Output rows ≡ the full-history
    * [[withSessionIds]] restricted to the batch (spec'd + oracled). */
  def withSessionIdsIncremental(state: DataFrame, events: DataFrame,
                                keyCol: String, tsCol: String,
                                gapSeconds: Long,
                                tieBreak: Seq[String] = Nil): DataFrame = {
    val st = state.select(col(keyCol).as("__sk"),
      col("last_ts_unix").as("__last_ts_unix"),
      col("last_session").as("__last_session"))
    // null-safe key join: a null key is a session key like any other
    // (the robustStats discipline)
    val ev = events.join(st, col(keyCol) <=> col("__sk"), "left")
      .drop("__sk")
    val order = col(tsCol) +: tieBreak.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val tsUnix = unix_timestamp(col(tsCol))
    // first batch event per key falls back to the carried epoch; within
    // the batch the window order makes raw gaps non-negative, so a
    // negative gap can ONLY mean the batch reaches behind the state
    val gapRaw = tsUnix - coalesce(lag(tsUnix, 1).over(w),
      col("__last_ts_unix"))
    val gap = when(gapRaw < 0, raise_error(lit(
        "withSessionIdsIncremental: batch event earlier than carried " +
          "session state — append-only contract violated; rebuild the " +
          "state from full history instead")).cast("long"))
      .otherwise(gapRaw)
    ev.withColumn("__new_session",
        when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id",
        coalesce(col("__last_session"), lit(0L)) + sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session", "__last_ts_unix", "__last_session")
  }

  /** Fold a tagged batch back into the state:
    * `extendSessionState(sessionState(old), batch) ≡
    * sessionState(old ∪ batch)` exactly, under the append contract
    * (spec'd). Keys untouched by the batch keep their row; touched
    * keys take the batch's last epoch/ordinal (which already carries
    * the old state through [[withSessionIdsIncremental]]). */
  def extendSessionState(state: DataFrame, events: DataFrame,
                         keyCol: String, tsCol: String, gapSeconds: Long,
                         tieBreak: Seq[String] = Nil): DataFrame = {
    val updated =
      withSessionIdsIncremental(state, events, keyCol, tsCol, gapSeconds,
          tieBreak)
        .groupBy(col(keyCol))
        .agg(max(unix_timestamp(col(tsCol))).as("last_ts_unix"),
          max(col("session_id")).as("last_session"))
    val untouched = state.join(
      updated.select(col(keyCol).as("__uk")),
      col(keyCol) <=> col("__uk"), "left_anti")
    untouched.unionByName(updated)
  }
}
