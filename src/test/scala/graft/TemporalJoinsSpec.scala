package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: greatest right ts <= left ts, inclusive, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (2L, 10L, ts("2024-01-01 00:00:10")), // equal-ts right must match
      (3L, 10L, ts("2024-01-01 00:00:01")), // before any right -> null
      (4L, 20L, ts("2024-01-01 00:00:30"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:03"), 1.5),
      (101L, 10L, ts("2024-01-01 00:00:10"), 2.5),
      (102L, 20L, ts("2024-01-01 00:00:29"), 3.5),
      (103L, 30L, ts("2024-01-01 00:00:00"), 9.9) // other user, never used
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Map("event_id" -> "rid", "value" -> "rval"))
      .select("event_id", "rid", "rval")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      (1L, Some(100L), Some(1.5)),
      (2L, Some(101L), Some(2.5)),
      (3L, None, None),
      (4L, Some(102L), Some(3.5))))
  }

  test("asofJoin: null join keys never match (equi-join semantics)") {
    // without the right-side null filter, Window.partitionBy would group
    // null-keyed left and right rows together and "match" them — unlike
    // an equi-join and unlike the streaming enrichAsOf's === condition
    val left = Seq(
      (1L, Option(10L), ts("2024-01-01 00:00:05")),
      (2L, Option.empty[Long], ts("2024-01-01 00:00:05"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, Option(10L), ts("2024-01-01 00:00:03"), 1.5),
      (101L, Option.empty[Long], ts("2024-01-01 00:00:03"), 6.6)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Map("value" -> "rval"))
      .select("event_id", "rval")
      .as[(Long, Option[Double])].collect().toSet
    assert(out == Set((1L, Some(1.5)), (2L, None)))
  }

  test("asofJoin: right ties on (key, ts) reduce to the max struct") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:10"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:05"), 1.0),
      (105L, 10L, ts("2024-01-01 00:00:05"), 2.0) // same ts: max event_id wins
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Map("event_id" -> "rid", "value" -> "rval"))
      .select("rid", "rval").as[(Long, Double)].head()
    assert(out == ((105L, 2.0)))
  }

  test("asofJoin: deterministic under repartitioning") {
    val ev = Tables.load(spark, sf0, "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "click")
    val a = TemporalJoins.asofJoin(l, r, Seq("user_id"), "ts", "ts",
      Map("event_id" -> "rid"))
    val b = TemporalJoins.asofJoin(l.repartition(7), r.repartition(5),
      Seq("user_id"), "ts", "ts", Map("event_id" -> "rid"))
    assert(a.count() == l.count())
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("rangeJoin: inclusive bounds, bin-crossing matches, keyed") {
    val left = Seq(
      (1L, 10L, 1000000L),
      (2L, 20L, 1000000L)
    ).toDF("lid", "user_id", "lus")
    val right = Seq(
      (100L, 10L, 1000000L), // dt = 0, boundary
      (101L, 10L, 1000100L), // dt = 100, boundary (hi)
      (102L, 10L, 1000101L), // dt = 101, outside
      (103L, 10L, 999999L),  // dt = -1, outside
      (104L, 20L, 1000050L)  // other key
    ).toDF("rid", "user_id", "rus")
    val out = TemporalJoins.rangeJoin(left, right, Seq("user_id"),
        "lus", "rus", loUs = 0L, hiUs = 100L, carry = Map("rid" -> "rid"))
      .select("lid", "rid", "dt_us").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 100L, 0L), (1L, 101L, 100L), (2L, 104L, 50L)))
  }

  test("asofJoin plan: window exchange on the key, no join operator") {
    val ev = Tables.load(spark, sf0, "events")
    val out = TemporalJoins.asofJoin(
      ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "click"),
      Seq("user_id"), "ts", "ts", Map("event_id" -> "rid"))
    val plan = out.queryExecution.executedPlan.toString
    // the merge-streams layout has NO join node — per-row probing never
    // appears; matching is a single window pass
    assert(!plan.contains("Join"), s"expected join-free plan, got:\n$plan")
    assert(plan.contains("Window"), "expected a window pass")
  }

  test("rangeJoin plan: equi-join on (key, bin), never a cross product") {
    val ev = Tables.load(spark, sf0, "events")
    val a = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("lid"), col("user_id"),
        unix_micros(col("ts")).as("lus"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("rid"), col("user_id"),
        unix_micros(col("ts")).as("rus"))
    val out = TemporalJoins.rangeJoin(a, b, Seq("user_id"), "lus", "rus",
      0L, 3600000000L, Map("rid" -> "rid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join, got:\n$plan")
  }

  test("rangeJoin: equals the naive theta join on real events") {
    val ev = Tables.load(spark, sf0, "events")
    val a = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("lid"), col("user_id"),
        unix_micros(col("ts")).as("lus"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("rid"), col("user_id").as("u2"),
        unix_micros(col("ts")).as("rus"))
    val fast = TemporalJoins.rangeJoin(a,
        b.withColumnRenamed("u2", "user_id"), Seq("user_id"),
        "lus", "rus", 0L, 3600000000L, Map("rid" -> "rid"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = a.join(b, a("user_id") === b("u2") &&
        (b("rus") - a("lus")).between(0L, 3600000000L))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("funnel: greedy-earliest entry, strictly-after steps, " +
      "entry-anchored window, one row per entered user") {
    import graft.operators.Funnel
    val ev = Seq(
      // u1: full A→B→C conversion
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 11:00:00")),
      (1L, "C", ts("2024-01-01 12:00:00")),
      // u2: B BEFORE A — must not count; stops at 1
      (2L, "B", ts("2024-01-01 09:00:00")),
      (2L, "A", ts("2024-01-01 10:00:00")),
      // u3: B simultaneous with A — strictly-after excludes it
      (3L, "A", ts("2024-01-01 10:00:00")),
      (3L, "B", ts("2024-01-01 10:00:00")),
      // u4: B outside the 2 h window from the EARLIEST A (greedy entry
      // pins t1 = 09:00 even though a later A at 11:30 would qualify)
      (4L, "A", ts("2024-01-01 09:00:00")),
      (4L, "A", ts("2024-01-01 11:30:00")),
      (4L, "B", ts("2024-01-01 11:59:00")),
      // u5: no A at all — never enters, no row
      (5L, "C", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "etype", "ts")
    val out = Funnel.funnel(ev, "user_id", "etype", "ts",
        steps = Seq("A", "B", "C"), withinUs = Some(7200000000L))
      .select("user", "steps_completed", "ts_last")
      .as[(Long, Long, Timestamp)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), out.toString)
    assert(out(1L) == ((3L, ts("2024-01-01 12:00:00"))), out(1L).toString)
    assert(out(2L)._1 == 1L && out(3L)._1 == 1L && out(4L)._1 == 1L, out.toString)
    // without a window u4 converts through the 11:59 B
    val open = Funnel.funnel(ev, "user_id", "etype", "ts",
        steps = Seq("A", "B"))
      .select("user", "steps_completed").as[(Long, Long)].collect().toMap
    assert(open(4L) == 2L, open.toString)
    intercept[IllegalArgumentException] {
      Funnel.funnel(ev, "user_id", "etype", "ts", steps = Seq("A"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(ev, "user_id", "etype", "ts", steps = Seq("A", "A"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(ev, "user_id", "etype", "ts", steps = Seq("A", "B"),
        withinUs = Some(0L))
    }
  }

  test("funnel calendar anchor: conversion must land in the entry's " +
      "calendar period — a day boundary cuts what a 24 h window allows") {
    import graft.operators.Funnel
    val ev = Seq(
      // u1: converts inside the entry day
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 23:00:00")),
      // u2: B only 2 h after entry but PAST MIDNIGHT — day mode cuts
      // it, a 24 h duration window would not
      (2L, "A", ts("2024-01-01 23:00:00")),
      (2L, "B", ts("2024-01-02 01:00:00")),
      // u3: same shape across a WEEK boundary (Sun 2024-01-07 → Mon
      // 2024-01-08): week mode cuts, day... also cuts; duration passes
      (3L, "A", ts("2024-01-07 23:00:00")),
      (3L, "B", ts("2024-01-08 01:00:00"))
    ).toDF("user_id", "etype", "ts")
    def steps(p: String): Map[Long, Long] =
      Funnel.funnel(ev, "user_id", "etype", "ts", steps = Seq("A", "B"),
          withinPeriod = Some(p))
        .select("user", "steps_completed").as[(Long, Long)].collect().toMap
    val day = steps("day")
    assert(day == Map(1L -> 2L, 2L -> 1L, 3L -> 1L), day.toString)
    // week mode: u2's Tue 01:00 is still the same Monday-anchored week
    // as its Mon 23:00 entry → converts; u3 crosses Sun→Mon → cut
    val week = steps("week")
    assert(week == Map(1L -> 2L, 2L -> 2L, 3L -> 1L), week.toString)
    // the duration window passes all three (24 h from entry)
    val dur = Funnel.funnel(ev, "user_id", "etype", "ts",
        steps = Seq("A", "B"), withinUs = Some(86400000000L))
      .select("user", "steps_completed").as[(Long, Long)].collect().toMap
    assert(dur == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), dur.toString)
    intercept[IllegalArgumentException] {
      Funnel.funnel(ev, "user_id", "etype", "ts", steps = Seq("A", "B"),
        withinPeriod = Some("hour"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(ev, "user_id", "etype", "ts", steps = Seq("A", "B"),
        withinUs = Some(1L), withinPeriod = Some("day"))
    }
    // month mode: Jan 31 → Feb 1 is cut, Jan 2 → Jan 30 converts —
    // real month arithmetic, not 30-day division (the retention
    // month-mode contract)
    val mev = Seq(
      (10L, "A", ts("2024-01-31 23:00:00")),
      (10L, "B", ts("2024-02-01 01:00:00")),
      (11L, "A", ts("2024-01-02 00:00:00")),
      (11L, "B", ts("2024-01-30 23:59:59"))
    ).toDF("user_id", "etype", "ts")
    val month = Funnel.funnel(mev, "user_id", "etype", "ts",
        steps = Seq("A", "B"), withinPeriod = Some("month"))
      .select("user", "steps_completed").as[(Long, Long)].collect().toMap
    assert(month == Map(10L -> 1L, 11L -> 2L), month.toString)
  }

  test("retention: weekly cohort triangle — exact cells, chatty users " +
      "count once per period, month mode uses month arithmetic") {
    import graft.operators.Funnel
    // 2024-01-01 is a Monday (week-bucket anchor in both engines)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // u1 cohort W0
      (1L, ts("2024-01-03 10:00:00")), // same week — must not double
      (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-08 10:00:00")), // W1: retained
      (2L, ts("2024-01-02 10:00:00")), // u2 cohort W0, never returns
      (3L, ts("2024-01-10 10:00:00"))  // u3 cohort W1
    ).toDF("user_id", "ts")
    val out = Funnel.retention(ev, "user_id", "ts", period = "week")
      .select("cohort", "offset", "n_active", "n_cohort", "retention")
      .as[(java.sql.Date, Long, Long, Long, Double)].collect()
      .map(r => (r._1.toString, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("2024-01-01", 0L)) == ((2L, 2L, 1.0)), out.toString)
    assert(out(("2024-01-01", 1L)) == ((1L, 2L, 0.5)), out.toString)
    assert(out(("2024-01-08", 0L)) == ((1L, 1L, 1.0)), out.toString)
    assert(out.size == 3, out.toString)
    // month mode: Jan 15 → Feb 20 is month-offset 1 (not 36 DIV 30)
    val m = Seq((7L, ts("2024-01-15 10:00:00")),
        (7L, ts("2024-02-20 10:00:00")))
      .toDF("user_id", "ts")
    val mo = Funnel.retention(m, "user_id", "ts", period = "month")
      .select("offset", "n_active").as[(Long, Long)].collect().toMap
    assert(mo == Map(0L -> 1L, 1L -> 1L), mo.toString)
    intercept[IllegalArgumentException] {
      Funnel.retention(ev, "user_id", "ts", period = "hour")
    }
  }

  test("retention quarter/year rungs: quarter-start cohorts, " +
      "boundary-counting offsets via exact month arithmetic") {
    import graft.operators.Funnel
    val ev = Seq(
      (1L, ts("2024-02-10 10:00:00")), // cohort 2024-Q1
      (1L, ts("2024-11-05 10:00:00")), // Q4 → quarter offset 3
      (2L, ts("2024-05-01 00:00:00")), // cohort 2024-Q2 (boundary day)
      (2L, ts("2025-04-02 00:00:00")), // 2025-Q2 → quarter offset 4
      (3L, ts("2026-12-31 23:59:59"))  // cohort 2026-Q4, never returns
    ).toDF("user_id", "ts")
    val q = Funnel.retention(ev, "user_id", "ts", period = "quarter")
      .select("cohort", "offset", "n_active")
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(q == Map(("2024-01-01", 0L) -> 1L, ("2024-01-01", 3L) -> 1L,
      ("2024-04-01", 0L) -> 1L, ("2024-04-01", 4L) -> 1L,
      ("2026-10-01", 0L) -> 1L), q.toString)
    val y = Funnel.retention(ev, "user_id", "ts", period = "year")
      .select("cohort", "offset", "n_active")
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(y == Map(("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2026-01-01", 0L) -> 1L), y.toString)
  }

  test("retention steady state: activityFrame + extendActivity + " +
      "retentionFromActivity ≡ full-history recompute, batch order free") {
    import graft.operators.Funnel
    val all = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-15 10:00:00")), (2L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-16 10:00:00")), (3L, ts("2024-01-10 10:00:00")),
      (3L, ts("2024-01-10 11:00:00"))
    ).toDF("user_id", "ts")
    val full = Funnel.retention(all, "user_id", "ts", period = "week")
    // split does NOT respect time order — the activity frame needs no
    // append contract (min-cohort over a distinct union is order-free);
    // round-trip the persisted frame through parquet like a real run
    val oldB = all.filter($"user_id" =!= 2L)
    val newB = all.filter($"user_id" === 2L)
    val dir = java.nio.file.Files.createTempDirectory("graft-act")
      .toString + "/activity"
    Funnel.activityFrame(oldB, "user_id", "ts", "week").write.parquet(dir)
    val inc = Funnel.retentionFromActivity(
      Funnel.extendActivity(spark.read.parquet(dir), newB,
        "user_id", "ts", "week"), "week")
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental retention diverged from full recompute")
  }

  test("funnel quarter/year calendar anchors: a quarter boundary cuts " +
      "what a 90-day window allows; year mode spans it") {
    import graft.operators.Funnel
    val ev = Seq(
      // u1: B two hours after A but PAST the quarter boundary
      // (Q1→Q2 2024) — quarter mode cuts, year mode converts
      (1L, "A", ts("2024-03-31 23:00:00")),
      (1L, "B", ts("2024-04-01 01:00:00")),
      // u2: same shape across the YEAR boundary — both modes cut
      (2L, "A", ts("2024-12-31 23:00:00")),
      (2L, "B", ts("2025-01-01 01:00:00")),
      // u3: converts inside one quarter
      (3L, "A", ts("2024-05-01 10:00:00")),
      (3L, "B", ts("2024-06-20 10:00:00"))
    ).toDF("user_id", "etype", "ts")
    def steps(p: String): Map[Long, Long] =
      Funnel.funnel(ev, "user_id", "etype", "ts", steps = Seq("A", "B"),
          withinPeriod = Some(p))
        .select("user", "steps_completed").as[(Long, Long)].collect().toMap
    assert(steps("quarter") == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    assert(steps("year") == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("funnel steady state: state + batch chase ≡ the full-history " +
      "funnel across a two-batch chain; violations raise") {
    import graft.operators.Funnel
    val K = Seq("A", "B", "C")
    val w = Some(86400000000L) // 24 h entry-anchored
    val all = Seq(
      // u1 enters in b1, advances TWO stages inside b2
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-02 06:00:00")),
      (1L, "C", ts("2024-01-02 07:00:00")),
      // u2 fully converts pre-split — pure passthrough
      (2L, "A", ts("2024-01-01 01:00:00")),
      (2L, "B", ts("2024-01-01 02:00:00")),
      (2L, "C", ts("2024-01-01 03:00:00")),
      // u3 has only a C pre-split (stage-0 state row), enters and
      // advances post-split
      (3L, "C", ts("2024-01-01 07:00:00")),
      (3L, "A", ts("2024-01-02 07:00:00")),
      (3L, "B", ts("2024-01-02 08:00:00")),
      // u4 enters pre-split; post-split B lands OUTSIDE the 24 h
      // window — stuck at stage 1
      (4L, "A", ts("2024-01-01 04:00:00")),
      (4L, "B", ts("2024-01-02 23:00:00")),
      // u5 appears only post-split; simultaneous B excluded
      // (strictly-after), later B converts
      (5L, "A", ts("2024-01-02 09:00:00")),
      (5L, "B", ts("2024-01-02 09:00:00")),
      (5L, "B", ts("2024-01-02 10:00:00")),
      // u6: B before A INSIDE b2 — within-batch order freedom
      (6L, "B", ts("2024-01-02 02:00:00")),
      (6L, "A", ts("2024-01-02 03:00:00")),
      // u7: third batch only — enters after two increments
      (7L, "A", ts("2024-01-03 05:00:00")),
      (7L, "B", ts("2024-01-03 06:00:00"))
    ).toDF("user_id", "etype", "ts")
    val b1 = all.filter($"ts" < lit(ts("2024-01-02 00:00:00")))
    val b2 = all.filter($"ts" >= lit(ts("2024-01-02 00:00:00")) &&
      $"ts" < lit(ts("2024-01-03 00:00:00")))
    val b3 = all.filter($"ts" >= lit(ts("2024-01-03 00:00:00")))
    // bootstrap → increment → increment, state parquet round-tripped
    val dir = java.nio.file.Files.createTempDirectory("graft-fun").toString
    Funnel.funnelState(b1, "user_id", "etype", "ts", K, withinUs = w)
      .write.parquet(s"$dir/s1")
    Funnel.funnelIncremental(spark.read.parquet(s"$dir/s1"), b2,
        "user_id", "etype", "ts", K, withinUs = w)
      .write.parquet(s"$dir/s2")
    val st3 = Funnel.funnelIncremental(spark.read.parquet(s"$dir/s2"), b3,
      "user_id", "etype", "ts", K, withinUs = w)
    // the chained state IS the full-history state, watermark included
    val rebuilt = Funnel.funnelState(all, "user_id", "etype", "ts", K,
      withinUs = w)
    assert(st3.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(st3).isEmpty,
      s"state diverged: ${st3.collect().toSeq} vs ${rebuilt.collect().toSeq}")
    // and the served output IS the full-history funnel
    val out = Funnel.funnelFromState(st3)
      .select("user", "steps_completed").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 1L, 5L -> 2L,
      6L -> 1L, 7L -> 2L), out.toString)
    val direct = Funnel.funnel(all, "user_id", "etype", "ts", K,
      withinUs = w)
    assert(Funnel.funnelFromState(st3).exceptAll(direct).isEmpty &&
      direct.exceptAll(Funnel.funnelFromState(st3)).isEmpty,
      "served output diverged from the one-shot funnel")
    // u3's stage-0 state row exists (funnel-relevant activity, no entry)
    val j0 = spark.read.parquet(s"$dir/s1")
      .filter($"user" === 3L)
      .select("steps_completed", "ts_first").as[(Long, Option[Timestamp])]
      .collect()
    assert(j0.toSeq == Seq((0L, None)), j0.toSeq.toString)
    // append contract violated (batch event BEFORE the carried
    // watermark): raises loudly instead of silently re-staging
    val stale = Seq((2L, "B", ts("2024-01-01 02:30:00")))
      .toDF("user_id", "etype", "ts")
    val err = intercept[Exception] {
      Funnel.funnelIncremental(spark.read.parquet(s"$dir/s2"), stale,
        "user_id", "etype", "ts", K, withinUs = w).collect()
    }
    assert(err.getMessage != null &&
      err.getMessage.contains("append-only contract"),
      s"wrong error: ${err.getMessage}")
    // non-step-typed events are invisible to the funnel — and to the
    // watermark (no spurious raise)
    val noise = Seq((2L, "Z", ts("2024-01-01 00:30:00")))
      .toDF("user_id", "etype", "ts")
    val same = Funnel.funnelIncremental(spark.read.parquet(s"$dir/s2"),
      noise, "user_id", "etype", "ts", K, withinUs = w)
    val prev = spark.read.parquet(s"$dir/s2")
    assert(same.exceptAll(prev).isEmpty && prev.exceptAll(same).isEmpty,
      "noise batch changed the state")
    // calendar anchor variant: u2 enters Sun 23:00, batch B lands
    // Mon 01:00 — week mode cuts it incrementally exactly as one-shot
    val ch = Seq((8L, "A", ts("2024-01-07 23:00:00")))
      .toDF("user_id", "etype", "ts")
    val cb = Seq((8L, "B", ts("2024-01-08 01:00:00")))
      .toDF("user_id", "etype", "ts")
    val cst = Funnel.funnelIncremental(
      Funnel.funnelState(ch, "user_id", "etype", "ts", Seq("A", "B"),
        withinPeriod = Some("week")),
      cb, "user_id", "etype", "ts", Seq("A", "B"),
      withinPeriod = Some("week"))
    val cOut = Funnel.funnelFromState(cst)
      .select("user", "steps_completed").as[(Long, Long)].collect().toMap
    assert(cOut == Map(8L -> 1L), cOut.toString)
  }

  test("conversionSummary: exact suffix-sum counts, ratios divided last, " +
      "empty tail stages kept; conversions deltas are write-once") {
    import graft.operators.Funnel
    val K = Seq("A", "B", "C")
    val all = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 11:00:00")),
      (2L, "A", ts("2024-01-01 10:00:00")),
      (2L, "B", ts("2024-01-02 01:00:00")),
      (3L, "A", ts("2024-01-02 02:00:00")),
      (4L, "A", ts("2024-01-01 01:00:00")),
      (4L, "B", ts("2024-01-01 02:00:00")),
      (4L, "C", ts("2024-01-02 03:00:00"))
    ).toDF("user_id", "etype", "ts")
    // no window: 4 enter, 3 reach B, 1 reaches C
    val sum = Funnel.conversionSummary(
        Funnel.funnel(all, "user_id", "etype", "ts", K), nSteps = 3)
      .orderBy("step")
      .select("step", "users", "conv_from_entry", "conv_from_prev")
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    assert(sum == Seq(
      (1L, 4L, 1.0, None),
      (2L, 3L, 0.75, Some(0.75)),
      (3L, 1L, 0.25, Some(1.0 / 3.0))), sum.toString)
    // a TALLER funnel summarized at a lower height clamps converted
    // users into the top row instead of dropping them from every count
    val clamped = Funnel.conversionSummary(
        Funnel.funnel(all, "user_id", "etype", "ts", K), nSteps = 2)
      .orderBy("step").select("step", "users")
      .as[(Long, Long)].collect().toSeq
    assert(clamped == Seq((1L, 4L), (2L, 3L)), clamped.toString)
    // a funnel nobody finishes keeps its zero tail (0/positive = 0.0)
    val short = Funnel.conversionSummary(
        Funnel.funnel(all.filter($"etype" =!= "C"), "user_id", "etype",
          "ts", K), nSteps = 3)
      .orderBy("step").select("step", "users", "conv_from_entry")
      .as[(Long, Long, Double)].collect().toSeq
    assert(short == Seq((1L, 4L, 1.0), (2L, 3L, 0.75), (3L, 0L, 0.0)),
      short.toString)
    // write-once conversion deltas across an incremental chain: u4
    // converts in batch 2, ONLY there; the bootstrap delta is empty
    val cut1 = lit(ts("2024-01-02 00:00:00"))
    val cut2 = lit(ts("2024-01-02 02:30:00"))
    val st0 = Funnel.funnelState(all.filter($"ts" < cut1),
      "user_id", "etype", "ts", K)
    val st1 = Funnel.funnelIncremental(st0,
      all.filter($"ts" >= cut1 && $"ts" < cut2),
      "user_id", "etype", "ts", K)
    val st2 = Funnel.funnelIncremental(st1, all.filter($"ts" >= cut2),
      "user_id", "etype", "ts", K)
    assert(Funnel.conversions(st0.limit(0), st0, 3).count() == 0)
    assert(Funnel.conversions(st0, st1, 3).count() == 0)
    val d2 = Funnel.conversions(st1, st2, 3)
      .select("user").as[Long].collect().toSeq
    assert(d2 == Seq(4L), d2.toString)
  }

  test("growthAccounting: new/retained/resurrected/churned decomposition " +
      "with forward-attributed clipped churn; actives invariant holds") {
    import graft.operators.Funnel
    val ev = Seq(
      // u1: W1, W2, gap, W4 — new, retained, churned into W3, resurrected
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-22 10:00:00")),
      // u2: W1 only — new, churned into W2
      (2L, ts("2024-01-01 11:00:00")),
      // u3: W3, W4 — new, retained; final-week churn NOT knowable (clip)
      (3L, ts("2024-01-15 09:00:00")), (3L, ts("2024-01-16 09:00:00")),
      (3L, ts("2024-01-22 09:00:00"))
    ).toDF("user_id", "ts")
    val act = Funnel.activityFrame(ev, "user_id", "ts", "week")
    val got = Funnel.growthAccounting(act, "week")
      .orderBy("p")
      .select(col("p").cast("string"), col("new_users"), col("retained"),
        col("resurrected"), col("churned"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 0L, 0L, 0L),
      ("2024-01-08", 0L, 1L, 0L, 1L),
      ("2024-01-15", 1L, 0L, 0L, 1L),
      ("2024-01-22", 0L, 1L, 1L, 0L)), got.toString)
    // the decomposition identity: new + retained + resurrected = actives
    val actives = act.groupBy("p").count()
      .select(col("p").cast("string"), col("count"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (p, nw, re, rs, _) =>
      assert(nw + re + rs == actives(p), s"invariant broken at $p") }
  }

  test("stickiness: integer ingredients with the ratio divided last; " +
      "durationQuantiles counts single-event sessions as 0") {
    import graft.operators.{Funnel, Sessionize}
    // week of 2024-01-01: u1 active Mon+Tue, u2 active Mon → 3 daily
    // actives over 2 observed days, 2 weekly actives → 3/(2·2) = 0.75
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-02 10:00:00"), 2L),
      (2L, ts("2024-01-01 11:00:00"), 3L)
    ).toDF("user_id", "ts", "event_id")
    val st = Funnel.stickiness(
        Funnel.activityFrame(ev, "user_id", "ts", "day"), "week")
      .select(col("pp").cast("string"), col("sum_daily_actives"),
        col("n_days"), col("actives"), col("stickiness"))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(st == Seq(("2024-01-01", 3L, 2L, 2L, 0.75)), st.toString)
    intercept[IllegalArgumentException] {
      Funnel.stickiness(Funnel.activityFrame(ev, "user_id", "ts", "day"),
        "day")
    }
    // durations: u1 has a 600 s session and a lone event (0 s); u2 a
    // lone event (0 s) → values {0, 0, 600}
    val sev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),
      (1L, ts("2024-01-01 12:00:00"), 3L),
      (2L, ts("2024-01-01 11:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val q = Sessionize.durationQuantiles(sev, "user_id", "ts",
        gapSeconds = 1800, tieBreak = Seq("event_id"))
      .as[(String, Long)].collect().toMap
    assert(q == Map("p10" -> 0L, "p25" -> 0L, "p50" -> 0L,
      "p75" -> 600L, "p90" -> 600L), q.toString)
  }

  test("conversionLatency: exact order-statistic percentiles over " +
      "full conversions only") {
    import graft.operators.Funnel
    // latencies 60 s, 120 s, 600 s for the three converted users; the
    // stage-1 straggler must not enter the distribution
    val all = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 10:01:00")),
      (2L, "A", ts("2024-01-01 10:00:00")),
      (2L, "B", ts("2024-01-01 10:02:00")),
      (3L, "A", ts("2024-01-01 10:00:00")),
      (3L, "B", ts("2024-01-01 10:10:00")),
      (4L, "A", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "etype", "ts")
    val q = Funnel.conversionLatency(
        Funnel.funnel(all, "user_id", "etype", "ts", Seq("A", "B")),
        nSteps = 2)
      .as[(String, Long)].collect().toMap
    // ceil-rank discipline on n=3: p10/p25 → 1st value, p50 → 2nd,
    // p75/p90 → 3rd — every value an ACTUAL latency
    assert(q == Map("p10" -> 60L, "p25" -> 60L, "p50" -> 120L,
      "p75" -> 600L, "p90" -> 600L), q.toString)
  }

  test("sessionize steady state: carried open-session state tags a new " +
      "batch exactly as the full recompute; violations raise") {
    import graft.operators.Sessionize
    val hist = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "u1 s1"),
      (1L, 11L, ts("2024-01-01 10:10:00"), "u1 s1"),
      (1L, 12L, ts("2024-01-01 12:00:00"), "u1 s2"),
      (2L, 20L, ts("2024-01-01 09:00:00"), "u2 s1")
    ).toDF("user_id", "event_id", "ts", "note")
    val batch = Seq(
      // u1: 10 min after the last history event — CONTINUES session 2
      (1L, 13L, ts("2024-01-01 12:10:00"), "u1 s2 cont"),
      // then a >30 min gap inside the batch — opens session 3
      (1L, 14L, ts("2024-01-01 13:00:00"), "u1 s3"),
      // u2: 5 h gap from history — opens session 2
      (2L, 21L, ts("2024-01-01 14:00:00"), "u2 s2"),
      // u3: unseen key — starts at session 1
      (3L, 30L, ts("2024-01-01 10:00:00"), "u3 s1")
    ).toDF("user_id", "event_id", "ts", "note")
    val full = Sessionize.withSessionIds(hist.unionByName(batch),
        "user_id", "ts", gapSeconds = 1800, tieBreak = Seq("event_id"))
      .filter($"event_id".isin(13L, 14L, 21L, 30L))
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    // parquet round-trip the state like a real steady-state run
    val dir = java.nio.file.Files.createTempDirectory("graft-sess")
      .toString + "/state"
    Sessionize.sessionState(hist, "user_id", "ts", 1800,
      tieBreak = Seq("event_id")).write.parquet(dir)
    val state = spark.read.parquet(dir)
    val inc = Sessionize.withSessionIdsIncremental(state, batch,
        "user_id", "ts", gapSeconds = 1800, tieBreak = Seq("event_id"))
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(inc == full, s"incremental $inc vs full $full")
    assert(inc == Map(13L -> 2L, 14L -> 3L, 21L -> 2L, 30L -> 1L), inc.toString)
    // folding the batch back: extendSessionState ≡ sessionState(union)
    val extended = Sessionize.extendSessionState(state, batch,
      "user_id", "ts", 1800, tieBreak = Seq("event_id"))
    val rebuilt = Sessionize.sessionState(hist.unionByName(batch),
      "user_id", "ts", 1800, tieBreak = Seq("event_id"))
    assert(extended.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(extended).isEmpty, "state fold diverged")
    // append contract violated (batch event BEFORE the carried state's
    // last event): raises loudly instead of mis-tagging
    val stale = Seq((1L, 99L, ts("2024-01-01 09:00:00"), "late"))
      .toDF("user_id", "event_id", "ts", "note")
    val err = intercept[Exception] {
      Sessionize.withSessionIdsIncremental(state, stale,
        "user_id", "ts", 1800, tieBreak = Seq("event_id")).collect()
    }
    assert(err.getMessage != null &&
      err.getMessage.contains("append-only contract"),
      s"wrong error: ${err.getMessage}")
  }

  test("hot-key guard: a key past maxEventsPerKey raises naming key and " +
      "count, bounded keys pass unchanged, guard rides the key window") {
    import graft.operators.Sessionize
    // one celebrity key (20 events) next to a normal one (3)
    val hot = (0 until 20).map(i =>
      (7L, 100L + i, ts(f"2024-01-01 10:${i}%02d:00"))) ++
      (0 until 3).map(i => (8L, 200L + i, ts(f"2024-01-01 10:${i}%02d:00")))
    val ev = hot.toDF("user_id", "event_id", "ts")
    val err = intercept[Exception] {
      Sessionize.withSessionIds(ev, "user_id", "ts", 1800,
        tieBreak = Seq("event_id"), maxEventsPerKey = 10L).collect()
    }
    assert(err.getMessage != null &&
      err.getMessage.contains("hot-key ceiling") &&
      err.getMessage.contains("key 7 carries 20 events"),
      s"wrong error: ${err.getMessage}")
    // under the ceiling: identical output to the unguarded op (the
    // guard is a pass-through filter, never a row-dropper)
    val unguarded = Sessionize.withSessionIds(ev, "user_id", "ts", 1800,
      tieBreak = Seq("event_id"))
    val guarded = Sessionize.withSessionIds(ev, "user_id", "ts", 1800,
      tieBreak = Seq("event_id"), maxEventsPerKey = 100L)
    assert(guarded.exceptAll(unguarded).isEmpty &&
      unguarded.exceptAll(guarded).isEmpty)
    // the incremental form guards THE BATCH slice (per-batch ceiling)
    val state = Sessionize.sessionState(ev.filter($"event_id" < 110),
      "user_id", "ts", 1800, tieBreak = Seq("event_id"))
    val err2 = intercept[Exception] {
      Sessionize.withSessionIdsIncremental(state,
        ev.filter($"event_id" >= 110), "user_id", "ts", 1800,
        tieBreak = Seq("event_id"), maxEventsPerKey = 5L).collect()
    }
    assert(err2.getMessage != null &&
      err2.getMessage.contains("hot-key ceiling"), s"${err2.getMessage}")
    val incOk = Sessionize.withSessionIdsIncremental(state,
      ev.filter($"event_id" >= 110), "user_id", "ts", 1800,
      tieBreak = Seq("event_id"), maxEventsPerKey = 50L)
    val incPlain = Sessionize.withSessionIdsIncremental(state,
      ev.filter($"event_id" >= 110), "user_id", "ts", 1800,
      tieBreak = Seq("event_id"))
    assert(incOk.exceptAll(incPlain).isEmpty &&
      incPlain.exceptAll(incOk).isEmpty)
    // plan shape: the guard adds NO exchange — one shuffle on the key
    // serves both the guard count and the session window
    val plan = guarded.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"guard must ride the key exchange:\n$plan")
  }

  test("sessionsIncremental ledger: closed + finalized state equals a " +
      "full sessions() recompute across a two-batch chain, decimal " +
      "partials and null-value sessions included") {
    import graft.operators.Sessionize
    def ev(rows: (Long, Long, String, java.lang.Double)*) =
      rows.toDF("user_id", "event_id", "ts_s", "value")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    // u1: session crossing BOTH batch boundaries (the merge case);
    // u2: all-null values (total_value must stay NULL, not 0);
    // u3: history-only key with TWO sessions — the first is provably
    // closed at bootstrap and must be emitted there, the second stays
    // open in untouched state through both increments
    val hist = ev(
      (1L, 1L, "2024-01-01 10:00:00", 1.5), (1L, 2L, "2024-01-01 10:10:00", 2.5),
      (2L, 20L, "2024-01-01 09:00:00", null),
      (3L, 30L, "2024-01-01 06:00:00", 2.0), // u3 s1 — closes at boot
      (3L, 31L, "2024-01-01 08:00:00", 7.0)) // u3 s2 — open forever
    val b1 = ev(
      (1L, 3L, "2024-01-01 10:20:00", 3.0), // continues u1 s1
      (1L, 4L, "2024-01-01 12:00:00", 10.0), // opens u1 s2 → closes s1
      (2L, 21L, "2024-01-01 09:10:00", null)) // continues u2 s1, still null
    val b2 = ev(
      (1L, 5L, "2024-01-01 12:10:00", 0.5), // continues u1 s2
      (2L, 22L, "2024-01-01 15:00:00", 4.0), // opens u2 s2 → closes s1
      (4L, 40L, "2024-01-01 11:00:00", 9.0)) // brand-new key
    val full = Sessionize.sessions(
      hist.unionByName(b1).unionByName(b2),
      "user_id", "ts", gapSeconds = 1800, "value",
      tieBreak = Seq("event_id"))
    // boot → increment → increment, state parquet round-tripped
    val dir = java.nio.file.Files.createTempDirectory("graft-sled").toString
    val boot = Sessionize.sessionsBootstrap(hist, "user_id", "ts", 1800,
      "value", tieBreak = Seq("event_id"))
    boot.state.write.parquet(s"$dir/s0")
    val led1 = Sessionize.sessionsIncremental(
      spark.read.parquet(s"$dir/s0"), b1, "user_id", "ts", 1800, "value",
      tieBreak = Seq("event_id"))
    led1.state.write.parquet(s"$dir/s1")
    val led2 = Sessionize.sessionsIncremental(
      spark.read.parquet(s"$dir/s1"), b2, "user_id", "ts", 1800, "value",
      tieBreak = Seq("event_id"))
    // the boot-closed emit: u3's first session, exactly once
    val bc = boot.closed.select("user_id", "session_id")
      .as[(Long, Long)].collect().toSet
    assert(bc == Set((3L, 1L)), bc.toString)
    val replayed = boot.closed.unionByName(led1.closed)
      .unionByName(led2.closed).unionByName(
        Sessionize.finalizeSessionState(led2.state, "user_id"))
    assert(replayed.exceptAll(full).isEmpty && full.exceptAll(replayed).isEmpty,
      s"ledger diverged:\nfull=${full.collect().toSeq}\n" +
        s"replayed=${replayed.collect().toSeq}")
    // a session is only emitted once it is provably over: u1 s1 closes
    // in batch 1; u2 s1 not until batch 2; u3 never closes (finalize only)
    val c1 = led1.closed.select("user_id", "session_id")
      .as[(Long, Long)].collect().toSet
    assert(c1 == Set((1L, 1L)), c1.toString)
    val c2 = led2.closed.select("user_id", "session_id")
      .as[(Long, Long)].collect().toSet
    assert(c2 == Set((2L, 1L)), c2.toString)
    // the closed u2 s1 rollup kept NULL total_value through the merge
    val u2v = led2.closed.filter($"user_id" === 2L)
      .select("total_value").collect().head
    assert(u2v.isNullAt(0), s"all-null session got a value: $u2v")
  }
}
