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

  /** HOT-KEY GUARD for the per-key windows below: a celebrity key
    * concentrates its entire event slice into ONE window partition, and
    * AQE's skew handling cannot split a window the way it splits a join
    * — the partition must sort and fold sequentially, so one hot key
    * sets the stage's wall clock (and, past executor memory, spills or
    * OOMs). `maxEventsPerKey > 0` adds a per-key count that RIDES THE
    * SAME key exchange (a second window over the identical
    * partitioning — no extra shuffle, no extra scan) and raises loudly
    * naming the key and its count when the ceiling is crossed — the
    * library's established discipline: a bound violation is an error
    * with guidance, never a silent 10-hour straggler. Remedies in the
    * message: shard the key upstream (sessionizing a bot/service
    * account rarely means anything), or batch more often so per-batch
    * slices stay bounded ([[withSessionIdsIncremental]] only ever
    * windows THE BATCH — its ceiling is per-batch, which daily
    * batching keeps small no matter how long the full history grows).
    * Default 0 = off (small corpora, specs). */
  private def guardHotKeys(events: DataFrame, keyCol: String,
                           maxEventsPerKey: Long,
                           where: String): DataFrame =
    if (maxEventsPerKey <= 0) events
    else {
      val wk = Window.partitionBy(col(keyCol))
      events.withColumn("__key_n", count(lit(1)).over(wk))
        .filter(when(col("__key_n") > maxEventsPerKey, raise_error(concat(
            lit(s"$where: key "), col(keyCol).cast("string"),
            lit(" carries "), col("__key_n").cast("string"),
            lit(s" events in this slice — above the hot-key ceiling " +
              s"maxEventsPerKey=$maxEventsPerKey. One key's events fold " +
              "sequentially in a single window partition (AQE cannot " +
              "split windows); shard or drop the key upstream, or batch " +
              "more often so per-batch slices stay bounded"))))
          .otherwise(lit(true)))
        .drop("__key_n")
    }

  /** Tag every event with its session ordinal per key (1-based).
    * `tieBreak` columns pin a total order under equal timestamps.
    * `maxEventsPerKey` (0 = off) raises on hot keys — [[guardHotKeys]]. */
  def withSessionIds(events: DataFrame, keyCol: String, tsCol: String,
                     gapSeconds: Long, tieBreak: Seq[String] = Nil,
                     maxEventsPerKey: Long = 0L): DataFrame = {
    val order = col(tsCol) +: tieBreak.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    // whole-second gap (floor of epoch) — portable across engines
    val gap = unix_timestamp(col(tsCol)) -
      unix_timestamp(lag(col(tsCol), 1).over(w))
    guardHotKeys(events, keyCol, maxEventsPerKey, "withSessionIds")
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
                                tieBreak: Seq[String] = Nil,
                                maxEventsPerKey: Long = 0L): DataFrame = {
    val st = state.select(col(keyCol).as("__sk"),
      col("last_ts_unix").as("__last_ts_unix"),
      col("last_session").as("__last_session"))
    // null-safe key join: a null key is a session key like any other
    // (the robustStats discipline). The hot-key ceiling is PER BATCH —
    // the window only ever sorts the batch slice, so frequent batching
    // bounds it regardless of history length (guardHotKeys scaladoc).
    val ev = guardHotKeys(events, keyCol, maxEventsPerKey,
        "withSessionIdsIncremental")
      .join(st, col(keyCol) <=> col("__sk"), "left")
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

  /** The incremental per-session ROLLUP ledger: sessions provably
    * CLOSED by this batch (a later session now exists for the key)
    * plus the carried open-session state — see
    * [[sessionsIncremental]]. */
  final case class SessionLedger(closed: DataFrame, state: DataFrame)

  /** [[sessionState]] plus the LAST (open) session's partial rollup —
    * the state [[sessionsIncremental]] carries: one row per key with
    * `(keyCol, last_ts_unix, last_session, open_start TIMESTAMP,
    * open_n, open_value DECIMAL(38,2))`. The value partial stays
    * DECIMAL so cross-batch accumulation is exact; it is cast to
    * double ONCE at finalize, exactly like [[sessions]]' Exact.dsum.
    * Equal to `sessionsBootstrap(...).state` — use the bootstrap when
    * the history's own closed sessions should be emitted too. */
  def sessionRollupState(events: DataFrame, keyCol: String, tsCol: String,
                         gapSeconds: Long, valueCol: String,
                         tieBreak: Seq[String] = Nil): DataFrame =
    sessionsBootstrap(events, keyCol, tsCol, gapSeconds, valueCol,
      tieBreak).state

  /** Day-0 of the rollup ledger: sessionize the history once, emit
    * every session that already has a later sibling for its key as
    * CLOSED ([[sessions]] schema), carry each key's last session as
    * the open state. `bootstrap.closed ∪ (increments' closed) ∪
    * finalize(last state)` ≡ [[sessions]] of everything, exactly. */
  def sessionsBootstrap(events: DataFrame, keyCol: String, tsCol: String,
                        gapSeconds: Long, valueCol: String,
                        tieBreak: Seq[String] = Nil): SessionLedger = {
    val tagged = withSessionIds(events, keyCol, tsCol, gapSeconds, tieBreak)
    val roll = tagged.groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("__start"),
        max(unix_timestamp(col(tsCol))).as("__last"),
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 2))
          .as("__value"))
      .withColumnRenamed(keyCol, "__key")
    splitLedger(roll, keyCol)
  }

  /** Split a normalized per-session rollup frame
    * (__key, session_id, __start, __last, __n, __value) into closed
    * emits + open state: one key-partitioned max window — a session is
    * provably over iff a later session exists for its key. */
  private def splitLedger(roll: DataFrame, keyCol: String): SessionLedger = {
    val wk = Window.partitionBy(col("__key"))
    val ranked = roll.withColumn("__max_s", max(col("session_id")).over(wk))
    val closed = ranked.filter(col("session_id") < col("__max_s"))
      .select(col("__key").as(keyCol), col("session_id"),
        date_format(col("__start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(from_unixtime(col("__last")), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("__n").as("n_events"),
        col("__value").cast("double").as("total_value"))
    val open = ranked.filter(col("session_id") === col("__max_s"))
      .select(col("__key").as(keyCol), col("__last").as("last_ts_unix"),
        col("session_id").as("last_session"),
        col("__start").as("open_start"), col("__n").as("open_n"),
        col("__value").as("open_value"))
    SessionLedger(closed, open)
  }

  /** Incremental [[sessions]] — the rollup form of the steady state: a
    * batch is tagged against the carried [[sessionRollupState]], its
    * per-session partials are merged with the state's open-session
    * partial (decimal-exact), and every session that now has a LATER
    * session for its key is emitted as CLOSED in the [[sessions]]
    * output schema; each key's last session stays open in the returned
    * state (a session is only provably over when a later one starts —
    * emitting it early would double-emit when the next batch continues
    * it). Keys untouched by the batch pass through the state
    * unchanged.
    *
    * EXACTNESS (spec'd + oracled): for any append-ordered split,
    * `closed ∪ finalizeSessionState(state') ≡ sessions(full history)`
    * — bit-for-bit, including the double cast (decimal partials add
    * associatively; the cast happens once at emit). Cost per batch:
    * one state join + one batch window + |keys ∩ batch| merges — the
    * history is never rescanned. */
  def sessionsIncremental(state: DataFrame, events: DataFrame,
                          keyCol: String, tsCol: String, gapSeconds: Long,
                          valueCol: String,
                          tieBreak: Seq[String] = Nil): SessionLedger = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 2)
    val idState =
      state.select(col(keyCol), col("last_ts_unix"), col("last_session"))
    val tagged = withSessionIdsIncremental(idState, events, keyCol, tsCol,
      gapSeconds, tieBreak)
    val broll = tagged.groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("b_start"),
        max(unix_timestamp(col(tsCol))).as("b_last"),
        count(lit(1)).as("b_n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(dec38).as("b_value"))
    // the state's open partial joins its own session id; keys whose
    // open session receives no batch rows but DO appear in the batch
    // (the gap closed it) surface through the full-outer side
    val touchedKeys = broll.select(col(keyCol).as("__tk")).distinct()
    val st = state.join(touchedKeys, col(keyCol) <=> col("__tk"), "left_semi")
      .select(col(keyCol).as("__k"), col("last_session").as("__ls"),
        col("open_start"), col("last_ts_unix"), col("open_n"),
        col("open_value"))
    val merged = broll.join(st,
        col(keyCol) <=> col("__k") && col("session_id") === col("__ls"),
        "full_outer")
      .select(
        coalesce(col(keyCol), col("__k")).as("__key"),
        coalesce(col("session_id"), col("__ls")).as("session_id"),
        coalesce(col("open_start"), col("b_start")).as("__start"),
        coalesce(col("b_last"), col("last_ts_unix")).as("__last"),
        (coalesce(col("open_n"), lit(0L)) + coalesce(col("b_n"), lit(0L)))
          .as("__n"),
        // sum-of-union null semantics: all-null partials merge to NULL
        // (what sessions() emits for an all-null-value session), a
        // single non-null side carries through, both add exactly
        when(col("open_value").isNull && col("b_value").isNull,
            lit(null).cast(dec38))
          .otherwise((coalesce(col("open_value"), lit(0).cast(dec38)) +
            coalesce(col("b_value"), lit(0).cast(dec38))).cast(dec38))
          .as("__value"))
    val led = splitLedger(merged, keyCol)
    val untouched = state.join(touchedKeys, col(keyCol) <=> col("__tk"),
      "left_anti")
    SessionLedger(led.closed, untouched.unionByName(led.state))
  }

  /** Close out a state frame (end of history / final drain): the open
    * sessions as [[sessions]]-schema rows. `closed ∪ finalize(state)`
    * after any chain of [[sessionsIncremental]] batches equals
    * [[sessions]] over the full history exactly. */
  def finalizeSessionState(state: DataFrame, keyCol: String): DataFrame =
    state.select(col(keyCol), col("last_session").as("session_id"),
      date_format(col("open_start"), "yyyy-MM-dd HH:mm:ss")
        .as("session_start"),
      date_format(from_unixtime(col("last_ts_unix")), "yyyy-MM-dd HH:mm:ss")
        .as("session_end"),
      col("open_n").as("n_events"),
      col("open_value").cast("double").as("total_value"))

  /** Session-duration distribution: exact DISCRETE percentiles (whole
    * seconds, actual data values — the
    * [[graft.llm.Corpus.lengthQuantiles]] kernel, shared with the
    * funnel's conversion latency) over `last − first` of every
    * session. Single-event sessions contribute duration 0 — they are
    * sessions, not noise (the bounce-rate population).
    *
    * 100 TB shape: the per-session rollup is the [[sessions]] exchange;
    * the quantile ride is over the DISTINCT duration domain (gap-bounded
    * seconds), guarded by the kernel's domain ceiling. */
  def durationQuantiles(events: DataFrame, keyCol: String, tsCol: String,
                        gapSeconds: Long,
                        tieBreak: Seq[String] = Nil): DataFrame =
    graft.llm.Corpus.lengthQuantiles(
      withSessionIds(events, keyCol, tsCol, gapSeconds, tieBreak)
        .groupBy(col(keyCol), col("session_id"))
        .agg((max(unix_timestamp(col(tsCol))) -
          min(unix_timestamp(col(tsCol)))).as("duration_s")),
      "duration_s")

  /** Fold a tagged batch back into the state:
    * `extendSessionState(sessionState(old), batch) ≡
    * sessionState(old ∪ batch)` exactly, under the append contract
    * (spec'd). Keys untouched by the batch keep their row; touched
    * keys take the batch's last epoch/ordinal (which already carries
    * the old state through [[withSessionIdsIncremental]]). */
  def extendSessionState(state: DataFrame, events: DataFrame,
                         keyCol: String, tsCol: String, gapSeconds: Long,
                         tieBreak: Seq[String] = Nil): DataFrame =
    extendSessionStateFromTagged(state,
      withSessionIdsIncremental(state, events, keyCol, tsCol, gapSeconds,
        tieBreak), keyCol, tsCol)

  /** [[extendSessionState]] when the caller ALREADY holds the tagged
    * batch (e.g. a streamed ledger that emits the tagged rows AND
    * folds the state — tagging once, ideally behind a persist(), is
    * half the per-batch work of tagging in both branches). */
  def extendSessionStateFromTagged(state: DataFrame, tagged: DataFrame,
                                   keyCol: String,
                                   tsCol: String): DataFrame = {
    val updated = tagged
      .groupBy(col(keyCol))
      .agg(max(unix_timestamp(col(tsCol))).as("last_ts_unix"),
        max(col("session_id")).as("last_session"))
    val untouched = state.join(
      updated.select(col(keyCol).as("__uk")),
      col(keyCol) <=> col("__uk"), "left_anti")
    untouched.unionByName(updated)
  }
}
