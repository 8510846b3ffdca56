package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.{Diff, Rebuild}

class RebuildSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val current = Seq(
    ("a.txt", "h1", 10L, ts("2024-01-01 00:00:00")),
    ("b.txt", "h2", 20L, ts("2024-01-01 00:00:00")),
    ("c.txt", "h3", 30L, ts("2024-01-01 00:00:00"))
  ).toDF("key", "content_hash", "size", "updated_at")

  test("keepLatest is last-writer-wins by updated_at") {
    // semantics of documents.py:91-93 (sort + drop_duplicates keep=last)
    val updates = Seq(
      ("a.txt", "h1b", 11L, ts("2024-02-01 00:00:00")),
      ("a.txt", "h1c", 12L, ts("2024-03-01 00:00:00"))
    ).toDF("key", "content_hash", "size", "updated_at")
    val out = Rebuild.keepLatest(current.unionByName(updates),
      Seq("key"), "updated_at")
    assert(out.count() == 3)
    val a = out.filter($"key" === "a.txt").select("content_hash").as[String].head()
    assert(a == "h1c")
  }

  test("keepLatest breaks updated_at ties deterministically") {
    val tied = Seq(
      ("k", "hA", 1L, ts("2024-01-01 00:00:00")),
      ("k", "hB", 2L, ts("2024-01-01 00:00:00"))
    ).toDF("key", "content_hash", "size", "updated_at")
    val picks = (1 to 3).map { _ =>
      Rebuild.keepLatest(tied.repartition(7), Seq("key"), "updated_at",
        tieBreak = Seq("content_hash"))
        .select("content_hash").as[String].head()
    }
    assert(picks.distinct.size == 1 && picks.head == "hB")
  }

  test("rebuild = union + anti-join deletions + dedup + sort") {
    val added = Seq(("d.txt", "h4", 40L, ts("2024-02-01 00:00:00")))
      .toDF("key", "content_hash", "size", "updated_at")
    val deleted = Seq(Tuple1("b.txt")).toDF("key")
    val out = Rebuild.rebuild(current, added, deleted)
    assert(out.select("key").as[String].collect().toSeq
      == Seq("a.txt", "c.txt", "d.txt"))
  }

  test("snapshotDiff + replay round-trips (diff consistency invariant)") {
    val next = Seq(
      ("a.txt", "h1", 10L, ts("2024-01-01 00:00:00")), // unchanged
      ("b.txt", "h2x", 21L, ts("2024-02-01 00:00:00")), // changed
      ("d.txt", "h4", 40L, ts("2024-02-01 00:00:00")) // added; c deleted
    ).toDF("key", "content_hash", "size", "updated_at")
    val diff = Diff.snapshotDiff(current, next)
    assert(Diff.addedKeys(current, next).as[String].collect().toSet
      == Set("b.txt", "d.txt"))
    assert(Diff.deletedKeys(current, next).as[String].collect().toSet
      == Set("b.txt", "c.txt"))
    // replay contract: applyDiff(old, diff(old, new)) == new
    val replayed = Diff.applyDiff(current, diff)
    assert(replayed.exceptAll(next).isEmpty && next.exceptAll(replayed).isEmpty)
  }

  test("diff line serialization is +/- prefixed and ordered") {
    val next = current.filter($"key" =!= "b.txt")
    val lines = Diff.toDiffLines(Diff.snapshotDiff(current, next))
      .as[String].collect()
    assert(lines.length == 1 && lines(0).startsWith("-b.txt,h2,20"))
  }

  test("property: diff/replay round-trips on random snapshot pairs") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      def snap() = List.fill(1 + rnd.nextInt(50))(
        (s"k${rnd.nextInt(20)}", rnd.nextInt(3).toLong)).distinct
        .toDF("key", "v")
      val a = snap(); val b = snap()
      val replayed = Diff.applyDiff(a, Diff.snapshotDiff(a, b))
      assert(replayed.exceptAll(b).isEmpty && b.exceptAll(replayed).isEmpty)
    }
  }

  test("property: keepLatest is idempotent and keeps one row per key") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val rows = List.fill(1 + rnd.nextInt(200))(
        (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
      val df = rows.toDF("key", "updated_at")
      val once = Rebuild.keepLatest(df, Seq("key"), "updated_at")
      val twice = Rebuild.keepLatest(once, Seq("key"), "updated_at")
      val keys = once.select("key").as[String].collect()
      assert(keys.distinct.length == keys.length)
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    }
  }
}
