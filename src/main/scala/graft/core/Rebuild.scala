package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The documents rebuild kernel — the reference's single most load-bearing
  * relational pipeline (ftm_datalake/archive/documents.py:82-117):
  *
  *   current ∪ added  →  anti-join deletions  →  keep-latest-per-key  →
  *   sort by key  →  snapshot (+ diff vs previous, see [[Diff]]).
  *
  * Operators covered: U1 (union), J1 (anti-join), A6/W1 (window dedup,
  * last-writer-wins by updated_at), O1 (deterministic global order).
  *
  * Scale notes (100 TB): union is metadata-only; the anti-join and the
  * window dedup both shuffle on `key` — Catalyst plans them into the SAME
  * hash-partitioning exchange when keys align, so the pipeline is a single
  * shuffle of the documents table. `key` is high-cardinality and uniform
  * (file paths), so no skew handling is needed; AQE coalesces the tail.
  */
object Rebuild {

  /** Last-writer-wins dedup: keep one row per `keyCol`, preferring the
    * greatest `versionCol`; ties broken by `tieBreak` columns descending so
    * the result is total-ordered and deterministic (the reference relies on
    * pandas' stable sort + keep="last"; we pin an explicit total order).
    */
  def keepLatest(df: DataFrame, keyCols: Seq[String], versionCol: String,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (versionCol +: tieBreak).map(c => col(c).desc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full rebuild: `(current ∪ added) ⟕̸ deleted`, dedup keep-latest per key,
    * ordered by key. All inputs must share the documents schema; `deleted`
    * needs only a `key` column.
    */
  def rebuild(current: DataFrame, added: DataFrame, deleted: DataFrame): DataFrame = {
    val unioned = current.unionByName(added)
    val kept = unioned.join(deleted.select("key"), Seq("key"), "left_anti")
    keepLatest(kept, Seq("key"), "updated_at", tieBreak = Seq("content_hash"))
      .orderBy("key")
  }
}

/** Snapshot diff — relational re-expression of the reference's unified-diff
  * versioning (ftm_datalake/archive/documents.py:96-117, consumed at
  * 165-185 and sync/aleph.py:82-93).
  *
  * The reference diffs sorted CSV *lines* (difflib, n=0 context) and later
  * string-parses `+`/`-` prefixes back out. We keep the semantics relational:
  * added = new ∖ old, deleted = old ∖ new on full rows (U2), and only
  * serialize to `+`/`-` text at the RFC-format boundary. Key extraction is a
  * `select("key")`, not prefix parsing.
  */
object Diff {

  /** Rows present in `next` but not `prev` (op `+`) and vice versa (op `-`),
    * with exceptAll's multiset semantics: a row appearing n× in `next`
    * and p× in `prev` emits (n−p)⁺ `+` rows and (p−n)⁺ `-` rows
    * (null-safe equality, like EXCEPT ALL).
    *
    * Computed as ONE pass: tag each side ±1, union, group by the full
    * row, emit the signed multiplicity difference via array_repeat +
    * explode. The naive `next.exceptAll(prev) ∪ prev.exceptAll(next)`
    * executes BOTH input subplans twice (each exceptAll re-runs both
    * sides — runtime-plan-verified, no exchange reuse) — for diffing two
    * rebuilt snapshots that means running every upstream window/exchange
    * twice. This shape scans each side once and carries one exchange.
    *
    * Boundary: the per-group repeat count materializes as an array, so
    * a single IDENTICAL full row whose multiplicity differs by millions
    * would buffer that many elements — irrelevant for snapshots, whose
    * rows carry a unique `key` (multiplicity ≈ 1); and the int cast is
    * overflow-checked under ANSI mode (Spark 4 default), never
    * wrapping. Schemas must agree — a silent column drop would diff
    * blind on the dropped column. */
  def snapshotDiff(prev: DataFrame, next: DataFrame): DataFrame = {
    require(prev.columns.toSet == next.columns.toSet,
      s"snapshot schemas differ: prev ${prev.columns.toSeq} vs next ${next.columns.toSeq}")
    val reserved = Seq("__d", "__n", "__p", "diff_op")
    require(!next.columns.exists(reserved.contains),
      s"snapshot columns collide with diff internals: " +
        next.columns.filter(reserved.contains).mkString(", "))
    val cols = next.columns.toSeq
    val tagged = next.select(cols.map(col): _*).withColumn("__d", lit(1L))
      .unionByName(prev.select(cols.map(col): _*).withColumn("__d", lit(-1L)))
    tagged.groupBy(cols.map(col): _*)
      .agg(sum(when(col("__d") > 0, 1L).otherwise(0L)).as("__n"),
        sum(when(col("__d") < 0, 1L).otherwise(0L)).as("__p"))
      .withColumn("diff_op", explode(concat(
        array_repeat(lit("+"), greatest(col("__n") - col("__p"), lit(0L)).cast("int")),
        array_repeat(lit("-"), greatest(col("__p") - col("__n"), lit(0L)).cast("int")))))
      .drop("__n", "__p")
  }

  /** Keys added in `next` (consumers: aleph sync change feed, I3). */
  def addedKeys(prev: DataFrame, next: DataFrame): DataFrame =
    snapshotDiff(prev, next).filter(col("diff_op") === "+").select("key").distinct()

  def deletedKeys(prev: DataFrame, next: DataFrame): DataFrame =
    snapshotDiff(prev, next).filter(col("diff_op") === "-").select("key").distinct()

  /** Replay a diff onto a base snapshot: base − deletions + additions.
    * Invariant (property-tested): `applyDiff(prev, snapshotDiff(prev, next))
    * ≡ next` — the change-feed consumer's contract (I3). */
  def applyDiff(base: DataFrame, diff: DataFrame): DataFrame = {
    val adds = diff.filter(col("diff_op") === "+").drop("diff_op")
    val dels = diff.filter(col("diff_op") === "-").drop("diff_op")
    base.exceptAll(dels).unionByName(adds)
  }

  /** RFC-interop serializer: one unified-diff-style text line per row
    * (`+key,hash,...` / `-key,hash,...`), ordered deterministically.
    * This is a format boundary, not a data-plane operator.
    */
  def toDiffLines(diff: DataFrame): DataFrame = {
    val dataCols = diff.columns.filterNot(_ == "diff_op").map(col)
    diff.select(concat(col("diff_op"), concat_ws(",", dataCols: _*)).as("line"))
      .orderBy("line")
  }
}
