package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipelines.Make

/** Scenario suite for the reconcile state machine — the behavioral spec of
  * the reference's `make` (tests/test_make.py: add missing metadata, delete
  * metadata whose blob vanished, flag checksum mismatches, heal). */
class MakeSpec extends SparkSpec {
  import spark.implicits._

  private def ts0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def frame(rows: Seq[(String, String)]) =
    rows.map { case (k, h) => (k, h, 1L, "text/plain", ts0, ts0) }
      .toDF("key", "content_hash", "size", "mimetype", "created_at", "updated_at")

  test("reconcile dispatches add / delete / verify / integrity_error") {
    val source = frame(Seq("a" -> "h1", "b" -> "h2", "c" -> "BAD"))
    val meta = frame(Seq("b" -> "h2", "c" -> "h3", "d" -> "h4"))
    val rec = Make.reconcile(source, meta)
    val byAction = rec.select("key", "action").as[(String, String)]
      .collect().toMap
    assert(byAction == Map(
      "a" -> Make.ActionAdd, // source without metadata → register
      "b" -> Make.ActionVerify, // both sides, hashes agree
      "c" -> Make.ActionIntegrityError, // hash mismatch
      "d" -> Make.ActionDelete)) // metadata without blob → delete
  }

  test("healed output re-adds, heals and drops (test_make.py semantics)") {
    val source = frame(Seq("a" -> "h1", "b" -> "h2", "c" -> "FIXED"))
    val meta = frame(Seq("b" -> "h2", "c" -> "h3", "d" -> "h4"))
    val healed = Make.healed(Make.reconcile(source, meta))
    val m = healed.select("key", "content_hash").as[(String, String)]
      .collect().toMap
    assert(m == Map("a" -> "h1", "b" -> "h2", "c" -> "FIXED"))
  }

  test("status counts are deterministic aggregates") {
    val source = frame(Seq("a" -> "h1", "b" -> "h2"))
    val meta = frame(Seq("b" -> "h2", "z" -> "h9"))
    val st = Make.status(Make.reconcile(source, meta))
      .as[(String, Long)].collect().toMap
    assert(st == Map("added" -> 1L, "verify" -> 1L, "deleted" -> 1L))
  }

  test("make is idempotent: re-reconciling the healed table is all-verify") {
    val source = frame(Seq("a" -> "h1", "c" -> "FIXED"))
    val meta = frame(Seq("c" -> "h3", "d" -> "h4"))
    val healed = Make.healed(Make.reconcile(source, meta))
    val again = Make.status(Make.reconcile(healed, healed))
      .as[(String, Long)].collect().toMap
    assert(again == Map("verify" -> 2L))
  }
}
