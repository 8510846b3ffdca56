package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered multi-step funnel analysis over an event stream — "of the
  * users who did A, how many went on to do B, then C, within the
  * conversion window?" — the event-analytics sibling of
  * [[TemporalJoins]]' as-of/range joins and [[Sessionize]].
  *
  * Semantics (greedy-earliest, the standard funnel definition): a user
  * enters the funnel at their EARLIEST step-1 event (`t1`); step k+1
  * completes at the earliest step-(k+1) event STRICTLY after step k's
  * completion time; with a conversion window, every later step must
  * also land within `withinUs` microseconds of `t1` (anchored at entry
  * — the usual product-analytics contract). Strictly-after ordering
  * makes simultaneous events count as ONE step, never two; greedy
  * choice makes the result deterministic and order-independent.
  * Output: one row per user who entered the funnel —
  * (user, steps_completed, ts_first, ts_last), `ts_last` = completion
  * time of the deepest step reached.
  *
  * 100 TB shape: step k is one user-keyed join of the (filtered,
  * type-pruned) event slice against the funnel-so-far plus a user
  * rollup that rides the join's partitioning — k−1 bounded joins
  * total, no self-join of the full stream, no per-user event sorting,
  * no window over raw events. The step filters push to the scan
  * (`PushedFilters` on the type column), so each stage reads only its
  * step's slice. */
object Funnel {

  /** The calendar rungs [[funnel]]'s `withinPeriod` and [[retention]]'s
    * `period` accept — every `date_trunc` bucket with a cross-engine
    * contract (Monday-anchored weeks, month/quarter/year starts,
    * identical in DuckDB). */
  val CalendarPeriods: Set[String] =
    Set("day", "week", "month", "quarter", "year")

  /** CONVERSION ANCHORS: `withinUs` bounds every later step to an
    * entry-anchored DURATION (t1 + µs); `withinPeriod` (a
    * [[CalendarPeriods]] rung) bounds them to the entry's CALENDAR
    * period instead — `date_trunc(period, ts) = date_trunc(period,
    * t1)`, the [[retention]] bucketing (Monday-anchored weeks,
    * identical in the SQL twin), matching the product-analytics
    * "converted within the same calendar day/week/quarter" contract
    * where a Sunday-23:00 entry gets one hour, not 24. The two anchors
    * are mutually exclusive. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             withinUs: Option[Long] = None,
             withinPeriod: Option[String] = None): DataFrame = {
    validate(steps, withinUs, withinPeriod)
    val cur = chain(normalized(events, userCol, typeCol, tsCol),
      steps, withinUs, withinPeriod)
    val ts = (1 to steps.size).map(i => col(s"t$i"))
    cur.select(col("user"),
      ts.map(t => when(t.isNotNull, 1L).otherwise(0L))
        .reduce(_ + _).as("steps_completed"),
      col("t1").as("ts_first"),
      coalesce(ts.reverse: _*).as("ts_last"))
  }

  private def validate(steps: Seq[String], withinUs: Option[Long],
                       withinPeriod: Option[String]): Unit = {
    require(steps.size >= 2 && steps.size <= 8,
      s"funnel: ${steps.size} steps outside [2, 8]")
    require(steps.distinct.size == steps.size,
      s"funnel: duplicate step types in $steps — a repeated stage is " +
        "ambiguous; disambiguate the event types upstream")
    withinUs.foreach(w => require(w > 0, s"funnel: withinUs=$w must be > 0"))
    withinPeriod.foreach(p => require(CalendarPeriods.contains(p),
      s"funnel: withinPeriod '$p' not in $CalendarPeriods"))
    require(withinUs.isEmpty || withinPeriod.isEmpty,
      "funnel: withinUs and withinPeriod are mutually exclusive anchors")
  }

  /** Normalized event frame `(user, __etype, __ts)`. Null-timestamped
    * events cannot participate in temporal ordering — dropped up front
    * (and in the oracle twin), so an all-null entry group can never
    * emit a steps_completed = 0 row. */
  private def normalized(events: DataFrame, userCol: String,
                         typeCol: String, tsCol: String): DataFrame =
    events.select(col(userCol).as("user"),
        col(typeCol).as("__etype"), col(tsCol).as("__ts"))
      .filter(col("__ts").isNotNull)

  /** The conversion-anchor predicate over a candidate `__ts` and the
    * entry time `t1` (whichever frame those columns live in). */
  private def anchorCond(withinUs: Option[Long],
                         withinPeriod: Option[String])
      : org.apache.spark.sql.Column =
    withinUs.map(w =>
        col("__ts") <= expr(s"timestampadd(MICROSECOND, $w, t1)"))
      .orElse(withinPeriod.map(p =>
        date_trunc(p, col("__ts")) === date_trunc(p, col("t1"))))
      .getOrElse(lit(true))

  /** The greedy step chain: `(user, t1..tK)`, one row per user with a
    * step-1 event. Step k is one user-keyed join of the type-pruned
    * slice against the funnel-so-far (null users group at entry but —
    * like the SQL twin's equi-joins — never match later steps). */
  private def chain(ev: DataFrame, steps: Seq[String],
                    withinUs: Option[Long],
                    withinPeriod: Option[String]): DataFrame = {
    var cur = ev.filter(col("__etype") === steps.head)
      .groupBy("user").agg(min("__ts").as("t1"))
    val inWindow = anchorCond(withinUs, withinPeriod)
    for (k <- 2 to steps.size) {
      val prev = col(s"t${k - 1}")
      val carried = (1 until k).map(i => col(s"t$i"))
      cur = cur.join(
          ev.filter(col("__etype") === steps(k - 1)).drop("__etype"),
          Seq("user"), "left")
        .groupBy((col("user") +: carried): _*)
        .agg(min(when(col("__ts") > prev && inWindow, col("__ts")))
          .as(s"t$k"))
    }
    cur
  }

  // ------------------------------------------------ incremental form
  // The funnel's steady state for a growing event log: greedy-earliest
  // funnel progress is APPEND-MERGEABLE — once a user's first j steps
  // are pinned, no later event can change them (greedy takes the
  // earliest candidate, and every carried completion time beat all
  // history), so a persisted per-user (stage, entry, last-step,
  // watermark) row plus a chase through each day's batch reproduces
  // the full-history funnel exactly. The contract is the sessionize
  // one: batches arrive append-only per user (enforced with a
  // mid-query raise, never a silent wrong stage). Cost per batch: K
  // user-keyed joins of BATCH slices against the |users|-sized state —
  // the history is never rescanned.

  /** The carried state behind [[funnel]]'s steady state: one row per
    * user with ≥1 step-typed (non-null-ts) event —
    * `(user, steps_completed, ts_first, ts_last, max_ts)` — from a
    * full-history pass here (the bootstrap; an EMPTY state frame with
    * this schema is also a valid day-0) or from [[funnelIncremental]]
    * thereafter. `max_ts` is the latest step-typed event seen for the
    * user (the append-only watermark the increment enforces);
    * `steps_completed = 0` rows (funnel-relevant activity but no entry
    * yet) are carried so a late out-of-order batch for such a user
    * raises instead of silently re-entering history. The state is
    * parameterized by `(steps, anchor)` — serve each configured funnel
    * from its own persisted frame. Persist as parquet; |users| rows at
    * any history length. */
  def funnelState(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  withinUs: Option[Long] = None,
                  withinPeriod: Option[String] = None): DataFrame = {
    validate(steps, withinUs, withinPeriod)
    val ev = normalized(events, userCol, typeCol, tsCol)
      .filter(col("__etype").isin(steps: _*))
    val cur = chain(ev, steps, withinUs, withinPeriod)
    val ts = (1 to steps.size).map(i => col(s"t$i"))
    val progressed = cur.select(col("user").as("__cu"),
      ts.map(t => when(t.isNotNull, 1L).otherwise(0L))
        .reduce(_ + _).as("__j"),
      col("t1").as("__t1"),
      coalesce(ts.reverse: _*).as("__tl"))
    // watermark rollup over the same type-pruned slice; null-safe join
    // (a null user is a user group like any other — entry is a groupBy)
    ev.groupBy("user").agg(max(col("__ts")).as("max_ts"))
      .join(progressed, col("user") <=> col("__cu"), "left")
      .select(col("user"),
        coalesce(col("__j"), lit(0L)).as("steps_completed"),
        col("__t1").as("ts_first"), col("__tl").as("ts_last"),
        col("max_ts"))
  }

  /** Chase a NEW batch through the funnel against carried
    * [[funnelState]] — the serving path: the state and the batch's
    * per-user rollup meet in one full-outer join, then each step's
    * type-pruned BATCH slice joins once (a user at stage j−1 takes the
    * earliest in-window slice event strictly after their last step —
    * exactly what the full-history greedy chain would pick, since every
    * batch event postdates every history event). Returns the NEW state
    * (≡ [[funnelState]] of the full history, spec'd + oracled); users
    * untouched by the batch pass through, users entering mid-batch can
    * advance multiple stages in one call. The append-only contract is
    * enforced LOUDLY: a batch event strictly earlier than its user's
    * watermark raises mid-query rather than silently mis-staging —
    * out-of-order arrivals need a state rebuild, not an increment. */
  def funnelIncremental(state: DataFrame, events: DataFrame,
                        userCol: String, typeCol: String, tsCol: String,
                        steps: Seq[String],
                        withinUs: Option[Long] = None,
                        withinPeriod: Option[String] = None): DataFrame = {
    validate(steps, withinUs, withinPeriod)
    val ev = normalized(events, userCol, typeCol, tsCol)
      .filter(col("__etype").isin(steps: _*))
    val broll = ev.groupBy("user")
      .agg(min(col("__ts")).as("__bmin"), max(col("__ts")).as("__bmax"))
    val st = state.select(col("user").as("__su"),
      col("steps_completed").as("__j0"), col("ts_first").as("__t10"),
      col("ts_last").as("__tl0"), col("max_ts").as("__mx0"))
    var cur = broll.join(st, col("user") <=> col("__su"), "full_outer")
      .select(coalesce(col("user"), col("__su")).as("user"),
        when(col("__bmin") < col("__mx0"), raise_error(lit(
            "funnelIncremental: batch event earlier than the carried " +
              "funnel watermark — append-only contract violated; " +
              "rebuild the state from full history instead"))
          .cast("timestamp"))
          .otherwise(greatest(col("__bmax"), col("__mx0"))).as("max_ts"),
        coalesce(col("__j0"), lit(0L)).as("__j"),
        col("__t10").as("t1"), col("__tl0").as("__tlast"))
    val inWindow = anchorCond(withinUs, withinPeriod)
    for (k <- 1 to steps.size) {
      val slice = ev.filter(col("__etype") === steps(k - 1))
        .select(col("user").as("__eu"), col("__ts"))
      // entry pools null users (the chain's groupBy semantics); later
      // steps equi-join (the chain's — and the twin's — join semantics)
      val jc = if (k == 1) col("user") <=> col("__eu")
               else col("user") === col("__eu")
      val cond = if (k == 1) col("__j") === 0
                 else col("__j") === (k - 1) &&
                   col("__ts") > col("__tlast") && inWindow
      cur = cur.join(slice, jc, "left")
        .groupBy(col("user"), col("max_ts"), col("__j"), col("t1"),
          col("__tlast"))
        .agg(min(when(cond, col("__ts"))).as("__n"))
        .select(col("user"), col("max_ts"),
          when(col("__n").isNotNull, lit(k.toLong)).otherwise(col("__j"))
            .as("__j"),
          (if (k == 1) coalesce(col("t1"), col("__n")) else col("t1"))
            .as("t1"),
          coalesce(col("__n"), col("__tlast")).as("__tlast"))
    }
    cur.select(col("user"), col("__j").as("steps_completed"),
      col("t1").as("ts_first"), col("__tlast").as("ts_last"),
      col("max_ts"))
  }

  /** The [[funnel]] output from a (persisted or freshly-extended)
    * [[funnelState]] — a projection: the users who entered, with the
    * watermark dropped. `funnelFromState(funnelState(h)) ≡ funnel(h)`,
    * and under the append contract
    * `funnelFromState(funnelIncremental(funnelState(h), b)) ≡
    * funnel(h ∪ b)` exactly. */
  def funnelFromState(state: DataFrame): DataFrame =
    state.filter(col("ts_first").isNotNull)
      .select(col("user"), col("steps_completed"), col("ts_first"),
        col("ts_last"))

  /** The UNCOLLAPSED funnel: one row per entered user with every
    * greedy step time `(user, t1 … tK)` — nulls from the first
    * unreached step on. [[funnel]] is a projection of this frame;
    * keep this form when per-stage timing questions ("median view →
    * click latency") need the intermediate anchors the collapsed
    * output drops. Same plan as [[funnel]]: K−1 user-keyed joins of
    * type-pruned slices. */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  withinUs: Option[Long] = None,
                  withinPeriod: Option[String] = None): DataFrame = {
    validate(steps, withinUs, withinPeriod)
    chain(normalized(events, userCol, typeCol, tsCol),
      steps, withinUs, withinPeriod)
  }

  /** The step-level rollup of a [[funnel]] (or [[funnelFromState]])
    * frame: one row per stage with the user count that reached AT
    * LEAST that stage, plus the two classic conversion ratios. Counts
    * are exact BIGINTs from one |users|→|K| aggregation; the ratios
    * are the only derived doubles, divided LAST from the two integer
    * counts (the retention discipline) so both engines compute the
    * same IEEE quotient. `nSteps` pins the report height — stages no
    * user reached still appear with count 0 (a report that silently
    * drops its empty tail misreads as a shorter funnel), and stages
    * BEYOND the height clamp into the top row (the counts are
    * users-at-stage-≥k, so a 4-step funnel summarized at height 3
    * counts its stage-4 users in every bucket, never drops them).
    *
    * 100 TB shape: one map-side-combined count aggregation (≤ K+1
    * groups) + a K-row cumulative sum — the single-partition window
    * is over the K-row rollup, never over users. */
  def conversionSummary(funnelOut: DataFrame, nSteps: Int): DataFrame = {
    require(nSteps >= 2 && nSteps <= 8,
      s"conversionSummary: $nSteps steps outside [2, 8]")
    val spark = funnelOut.sparkSession
    val byStage = funnelOut
      .select(least(col("steps_completed"), lit(nSteps.toLong)).as("__sc"))
      .groupBy(col("__sc"))
      .agg(count(lit(1)).as("__n"))
    val stages = spark.range(1, nSteps + 1).select(col("id").as("step"))
    // users at stage ≥ k = suffix sum of the per-stage exact counts;
    // all three windows run over the K-row report (single explicit
    // partition — bounded by construction, never user-sized)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(lit(1)).orderBy(col("step").desc)
      .rowsBetween(W.unboundedPreceding, 0)
    val entered = stages.join(byStage, col("step") === col("__sc"), "left")
      .select(col("step"), coalesce(col("__n"), lit(0L)).as("__exact"))
      .withColumn("users", sum(col("__exact")).over(w))
      .drop("__exact")
    entered.select(col("step"), col("users"),
      (col("users").cast("double") /
        first(col("users")).over(
          W.partitionBy(lit(1)).orderBy(col("step"))
            .rowsBetween(W.unboundedPreceding, 0)))
        .as("conv_from_entry"),
      (col("users").cast("double") /
        lag(col("users"), 1).over(
          W.partitionBy(lit(1)).orderBy(col("step"))))
        .as("conv_from_prev"))
  }

  /** The conversion DELTA between two funnel states: users fully
    * converted (stage = nSteps) in `after` but not yet in `before` —
    * [[funnel]]-schema rows. Greedy progress is write-once, so across
    * a chain of [[funnelIncremental]] states each user appears in
    * EXACTLY ONE delta: the per-batch deltas form an append-only
    * conversion feed (the natural `emitted` of a
    * [[graft.streaming.Streaming.foldLedgerStream]] fold), and
    * `conversions(bootstrap) ∪ per-batch deltas ≡ the one-shot
    * funnel's fully-converted rows` exactly. */
  def conversions(before: DataFrame, after: DataFrame,
                  nSteps: Int): DataFrame = {
    val done = funnelFromState(after)
      .filter(col("steps_completed") === nSteps)
    val prior = before.filter(col("steps_completed") === nSteps)
      .select(col("user").as("__pu"))
    done.join(prior, col("user") <=> col("__pu"), "left_anti")
  }

  /** Time-to-convert distribution: exact DISCRETE percentiles (actual
    * data values via rational-threshold percentile_disc — the
    * [[graft.llm.Corpus.lengthQuantiles]] kernel, so the integer-math
    * rank discipline is shared, not reimplemented) of
    * `ts_last − ts_first` in whole seconds over FULLY-converted users
    * (stage = nSteps). Returns `(q, value)` rows.
    *
    * 100 TB shape: the funnel rollup is user-sized; the quantile ride
    * is over the DISTINCT latency domain (seconds within the
    * conversion window — bounded by the window, not the corpus),
    * guarded by the kernel's domain ceiling. */
  def conversionLatency(funnelOut: DataFrame, nSteps: Int): DataFrame =
    graft.llm.Corpus.lengthQuantiles(
      funnelOut.filter(col("steps_completed") === nSteps)
        .select((unix_timestamp(col("ts_last")) -
          unix_timestamp(col("ts_first"))).as("latency_s")),
      "latency_s")

  /** Cohort retention — the funnel's longitudinal sibling: group users
    * by the period of their FIRST event (their cohort), then count how
    * many are active again k periods later, for every (cohort, offset)
    * cell. The classic product-analytics triangle, all exact integer
    * counts; `retention` is the one derived ratio, computed last from
    * the two BIGINTs (the langIdConfusion discipline).
    *
    * Periods are `date_trunc(period, ts)` [[CalendarPeriods]] buckets
    * (day/week/month/quarter/year), so the twin's date arithmetic
    * matches exactly; `offset` counts PERIOD BOUNDARIES crossed
    * (datediff of the truncated dates), not elapsed duration. Offset 0
    * is the cohort itself
    * (retention 1.0 by construction — kept: it carries n_cohort and
    * anchors the triangle).
    *
    * 100 TB shape: ONE scan — activity collapses to distinct
    * (user, period) rows (a chatty user costs one row per period, not
    * per event) and the cohort rollup derives from that same frame
    * (min over distinct periods ≡ min over raw events), so both
    * consumers share the scan and the (user, p) exchange via
    * ReusedExchange — then a user-keyed join and a (cohort, offset)
    * rollup whose domain is periods², bounded by the calendar, not
    * the corpus. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                period: String = "day"): DataFrame =
    retentionFromActivity(activityFrame(events, userCol, tsCol, period),
      period)

  /** The persisted frame behind [[retention]]'s steady state: the
    * DISTINCT `(user, p)` activity rows at `period` granularity — a
    * chatty user costs one row per period, not per event, so the frame
    * is |users|·|periods|-bounded and APPEND-INCREMENTAL by
    * construction: new events can only add rows, never change or
    * remove one, so [[extendActivity]] with each day's batch keeps it
    * exactly equal to recomputing it over the full history (min-cohort
    * over a distinct union is order-free — no append-order contract
    * needed, unlike sessionization). Train-once/serve-many lifecycle:
    * write parquet partitioned by `p` (new batches touch only recent
    * partitions), rebuild only when the period definition changes. */
  def activityFrame(events: DataFrame, userCol: String, tsCol: String,
                    period: String = "day"): DataFrame = {
    require(CalendarPeriods.contains(period),
      s"activityFrame: period '$period' not in $CalendarPeriods")
    events.select(col(userCol).as("user"),
        date_trunc(period, col(tsCol)).cast("date").as("p"))
      .filter(col("p").isNotNull)
      .distinct()
  }

  /** Fold a new event batch into a persisted [[activityFrame]]:
    * union + distinct — the whole increment. The distinct re-shuffles
    * only (user, p) rows; at scale the persisted side is parquet
    * partitioned by `p` and a date-bounded batch prunes to the
    * partitions it can touch. Result ≡ [[activityFrame]] of the full
    * history, exactly (set union of sets). */
  def extendActivity(activity: DataFrame, events: DataFrame,
                     userCol: String, tsCol: String,
                     period: String = "day"): DataFrame =
    activity.select(col("user"), col("p"))
      .unionByName(activityFrame(events, userCol, tsCol, period))
      .distinct()

  /** Growth accounting — the new/retained/resurrected/churned
    * decomposition of each period's active users (the standard
    * product-growth ledger), served from the SAME persisted
    * [[activityFrame]] as [[retentionFromActivity]]: one state frame,
    * two reports, and the steady state comes free via
    * [[extendActivity]].
    *
    * Per (user, period) row: `new` if it is the user's first period,
    * `retained` if the user was active exactly one period earlier,
    * `resurrected` otherwise; a user inactive in the period after an
    * active one is `churned` INTO that following period (attributed
    * forward, the growth-accounting convention), with churn rows
    * clipped at the frame's last observed period (whether the final
    * period's actives churn is not yet knowable). By construction
    * `new + retained + resurrected = actives(p)` — spec-asserted.
    * All counts exact BIGINTs; no derived ratios (quick ratio etc.
    * divide two of these — the caller's one-liner).
    *
    * 100 TB shape: lag and lead ride ONE user-keyed window pass over
    * the |user×period| activity frame, then one period-keyed
    * aggregation; both exchanges bounded by the frame, never the raw
    * event log. */
  def growthAccounting(active: DataFrame,
                       period: String = "day"): DataFrame = {
    require(CalendarPeriods.contains(period),
      s"growthAccounting: period '$period' not in $CalendarPeriods")
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy("user").orderBy("p")
    def units(a: org.apache.spark.sql.Column,
              b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (period match {
        case "day" => datediff(a, b)
        case "week" => datediff(a, b) / 7
        case "month" => months_between(a, b)
        case "quarter" => months_between(a, b) / 3
        case "year" => months_between(a, b) / 12
      }).cast("long")
    def nextPeriod(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      period match {
        case "day" => date_add(p, 1)
        case "week" => date_add(p, 7)
        case "month" => add_months(p, 1)
        case "quarter" => add_months(p, 3)
        case "year" => add_months(p, 12)
      }
    // ONE pass: each windowed row emits its own status cell plus (when
    // its successor gap proves a churn) the forward churn cell — a
    // 1-or-2 element explode instead of a union that would rescan the
    // frame, and no separate max-scan for the clip (the last observed
    // period is recovered from the K-row AGGREGATED report: it is the
    // latest period with any actives, since every frame row is an
    // active). Plan-guarded to a single frame scan.
    val cellType = "struct<p:date,status:string>"
    val cells = active.select(col("user"), col("p"))
      .withColumn("__prev", lag(col("p"), 1).over(wu))
      .withColumn("__next", lead(col("p"), 1).over(wu))
      .select(explode(filter(array(
        struct(col("p").as("p"),
          when(col("__prev").isNull, lit("new"))
            .when(units(col("p"), col("__prev")) === 1L, lit("retained"))
            .otherwise(lit("resurrected")).as("status")),
        when(col("__next").isNull || units(col("__next"), col("p")) > 1L,
            struct(nextPeriod(col("p")).as("p"),
              lit("churned").as("status")))
          .otherwise(lit(null).cast(cellType))),
        e => e.isNotNull)).as("e"))
      .select(col("e.p").as("p"), col("e.status").as("status"))
    val counts = cells.groupBy(col("p"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("new_users"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("resurrected"),
        sum(when(col("status") === "churned", 1L).otherwise(0L)).as("churned"))
    // the clip window runs over the |periods|-row report (calendar-
    // bounded at any corpus size), never the frame
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    counts.withColumn("__maxp",
        max(when(col("new_users") + col("retained") +
          col("resurrected") > 0, col("p"))).over(wAll))
      .filter(col("p") <= col("__maxp"))
      .drop("__maxp")
  }

  /** Stickiness — the DAU/WAU-style engagement ratio, the third report
    * off the persisted DAY-level [[activityFrame]]: for each coarser
    * `period` bucket, the exact BIGINT ingredients (sum of daily
    * active counts, observed days, period actives) plus the one
    * derived ratio `sum_daily / (n_days · actives)` — mean daily
    * actives over period actives — divided LAST from the integers
    * (the retention discipline) and rounded to 6 places.
    *
    * 100 TB shape: one period-keyed aggregation over the
    * |user×day| frame (count-distinct expansion bounded by the frame,
    * never the event log); output is |periods| rows. */
  def stickiness(activeDaily: DataFrame,
                 period: String = "week"): DataFrame = {
    require(CalendarPeriods.contains(period) && period != "day",
      s"stickiness: period '$period' must be a coarser-than-day rung " +
        s"of $CalendarPeriods")
    activeDaily.select(col("user"), col("p"),
        date_trunc(period, col("p")).cast("date").as("pp"))
      .groupBy("pp")
      .agg(count(lit(1)).as("sum_daily_actives"),
        countDistinct(col("p")).as("n_days"),
        countDistinct(col("user")).as("actives"))
      .select(col("pp"), col("sum_daily_actives"), col("n_days"),
        col("actives"),
        round(col("sum_daily_actives").cast("double") /
          (col("n_days") * col("actives")), 6).as("stickiness"))
  }

  /** Engagement histogram — the power-user curve, the fourth report
    * off the persisted [[activityFrame]]: how many users were active
    * in exactly n periods. Exact BIGINTs end to end: one user-keyed
    * count (map-side combined) then a ≤|periods|-group rollup.
    * The classic casual-to-power-user shape check (and the input to
    * any L28-style engagement gate). */
  def engagementHistogram(active: DataFrame): DataFrame =
    active.groupBy(col("user"))
      .agg(count(lit(1)).as("n_periods"))
      .groupBy(col("n_periods"))
      .agg(count(lit(1)).as("n_users"))

  /** The retention triangle from a (persisted or freshly-built)
    * [[activityFrame]] — the serving half. Cohort = min over the
    * distinct (user, period) rows (≡ min over raw events), attached as
    * a PER-USER WINDOW instead of a groupBy+self-join: ONE user
    * exchange feeds both the cell rollup and the cohort-size rollup
    * (the n_cohort branch counts the rows where `p = cohort` — exactly
    * one per user — so it needs no distinct-user pass), and the shared
    * windowed subtree is one ReusedExchange. Domains stay
    * calendar-bounded (periods² cells). Truncated dates make every
    * offset an exact integer: day/week differences are multiples of
    * the period length; month/quarter/year starts give integer-valued
    * months_between (÷1, ÷3, ÷12). */
  def retentionFromActivity(active: DataFrame,
                            period: String = "day"): DataFrame = {
    require(CalendarPeriods.contains(period),
      s"retentionFromActivity: period '$period' not in $CalendarPeriods")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user")
    val withCohort = active.select(col("user"), col("p"))
      .withColumn("cohort", min(col("p")).over(w))
    val offset = (period match {
      case "day" => datediff(col("p"), col("cohort"))
      case "week" => datediff(col("p"), col("cohort")) / 7
      case "month" => months_between(col("p"), col("cohort"))
      case "quarter" => months_between(col("p"), col("cohort")) / 3
      case "year" => months_between(col("p"), col("cohort")) / 12
    }).cast("long")
    val cells = withCohort
      .groupBy(col("cohort"), offset.as("offset"))
      .agg(count(lit(1)).as("n_active"))
    // one row per user has p = cohort (its first period) — counting
    // those IS the cohort size, off the same windowed frame
    val nc = withCohort.filter(col("p") === col("cohort"))
      .groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    cells.join(nc, "cohort")
      .select(col("cohort"), col("offset"), col("n_active"),
        col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
  }
}
