package graft

import org.apache.spark.sql.functions._
import graft.core.{Lakehouse, Layout}
import graft.llm.{FeedConsumer, Retrieval, Similarity}

/** Checkpointed feed consumption for the serving indexes: exactly-once
  * window application, no-op replays, loud out-of-order and
  * cross-epoch windows, and the closed-generation default. */
class FeedConsumerSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docBatch(lo: Int, hi: Int) =
    (lo until hi).map(i =>
      (i.toLong, s"alpha tok$i beta tok${i % 7} gamma")).toDF("doc_id", "text")

  private def vecBatch(lo: Int, hi: Int) =
    (lo until hi).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        math.sin(i * 0.37 + d).toFloat))
    }.toDF("vec_id", "embedding")
      // parquet reads arrays back with nullable elements; match it so
      // later in-memory batches don't read as a retype drift
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))

  test("tracked BM25: multi-window consumption equals a from-scratch " +
      "index; replays no-op; out-of-order windows raise") {
    val base = tmp("feedc-bm25")
    val src = s"$base/docs"
    val ix = s"$base/index"
    Layout.appendGeneration(spark, src, docBatch(0, 60), Seq("doc_id"),
      bits = 6, partitions = 2, gen = 0L)
    FeedConsumer.initTrackedBm25Index(spark, ix,
      Retrieval.bm25Index(Lakehouse.scanAsOf(spark, src, 0L)), src,
      asOfGen = 0L)
    Layout.appendGeneration(spark, src, docBatch(60, 90), Seq("doc_id"),
      bits = 6, partitions = 1, gen = 1L)
    val (_, off1) = FeedConsumer.applyFeedToBm25IndexTracked(spark, ix,
      src, toGen = 1L)
    assert(off1.version == 2L && off1.gen == 1L)
    // a delete stamping gen 2 (current) rides the next window
    Layout.appendGeneration(spark, src, docBatch(90, 100), Seq("doc_id"),
      bits = 6, partitions = 1, gen = 2L)
    Lakehouse.deleteMatching(spark, src,
      Seq(3L, 61L, 95L).toDF("doc_id"), "doc_id")
    val (idx2, off2) = FeedConsumer.applyFeedToBm25IndexTracked(spark,
      ix, src, toGen = 2L)
    assert(off2.version == 3L && off2.gen == 2L)
    // REPLAY: explicitly re-requesting the consumed window is a no-op
    // (the raw apply would double-subtract) — same version, same state
    val (_, offR) = FeedConsumer.applyFeedToBm25IndexTracked(spark, ix,
      src, toGen = 2L)
    assert(offR == off2, s"replay must no-op: $offR vs $off2")
    // OUT OF ORDER: a window ending before the watermark raises
    val oo = intercept[IllegalArgumentException] {
      FeedConsumer.applyFeedToBm25IndexTracked(spark, ix, src, toGen = 1L)
    }
    assert(oo.getMessage.contains("OUT OF ORDER"))
    // the maintained index serves exactly like a from-scratch one
    val q = Seq((1L, "alpha tok61"), (2L, "tok3 gamma"))
      .toDF("query_id", "query_text")
    val want = Retrieval.bm25TopKAgainst(
        Retrieval.bm25Index(Lakehouse.scan(spark, src)), q, k = 5)
      .collect().map(_.toSeq).toSet
    val got = Retrieval.bm25TopKAgainst(idx2, q, k = 5)
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // and the on-disk root reloads to the same offset and serves alike
    val (reloaded, offL) = FeedConsumer.loadTrackedBm25Index(spark, ix)
    assert(offL == off2)
    assert(Retrieval.bm25TopKAgainst(reloaded, q, k = 5)
      .collect().map(_.toSeq).toSet == want)
  }

  test("tracked BM25: the DEFAULT window stops at the newest CLOSED " +
      "generation — the open gen (which late tombstones still stamp) " +
      "is never consumed implicitly") {
    val base = tmp("feedc-open")
    val src = s"$base/docs"
    val ix = s"$base/index"
    Layout.appendGeneration(spark, src, docBatch(0, 40), Seq("doc_id"),
      bits = 6, partitions = 1, gen = 0L)
    FeedConsumer.initTrackedBm25Index(spark, ix,
      Retrieval.bm25Index(Lakehouse.scanAsOf(spark, src, 0L)), src,
      asOfGen = 0L)
    Layout.appendGeneration(spark, src, docBatch(40, 60), Seq("doc_id"),
      bits = 6, partitions = 1, gen = 1L)
    // default: gen 1 is OPEN (currentGen) → nothing closed beyond the
    // watermark → no-op. A delete stamped into gen 1 after an eager
    // consumption would have been lost forever; the default refuses.
    val (_, offA) = FeedConsumer.applyFeedToBm25IndexTracked(spark, ix, src)
    assert(offA.gen == 0L && offA.version == 1L,
      s"open generation must not be consumed by default: $offA")
    Lakehouse.deleteMatching(spark, src, Seq(45L).toDF("doc_id"),
      "doc_id") // stamps gen 1 — still visible to the (0,1] pull
    Layout.appendGeneration(spark, src, docBatch(60, 70), Seq("doc_id"),
      bits = 6, partitions = 1, gen = 2L)
    // now gen 1 is closed: the default consumes exactly (0,1]
    val (idx, offB) = FeedConsumer.applyFeedToBm25IndexTracked(spark,
      ix, src)
    assert(offB.gen == 1L && offB.version == 2L)
    val q = Seq((1L, "tok45 alpha")).toDF("query_id", "query_text")
    val want = Retrieval.bm25TopKAgainst(
        Retrieval.bm25Index(Lakehouse.scanAsOf(spark, src, 1L)), q, k = 5)
      .collect().map(_.toSeq).toSet
    assert(Retrieval.bm25TopKAgainst(idx, q, k = 5)
      .collect().map(_.toSeq).toSet == want)
  }

  test("tracked BM25: a source compact (epoch bump) since the " +
      "watermark raises through the feed's own epoch guard — " +
      "cross-epoch windows are unanswerable, rebuild the index") {
    val base = tmp("feedc-epoch")
    val src = s"$base/docs"
    val ix = s"$base/index"
    Layout.appendGeneration(spark, src, docBatch(0, 40), Seq("doc_id"),
      bits = 6, partitions = 1, gen = 0L)
    FeedConsumer.initTrackedBm25Index(spark, ix,
      Retrieval.bm25Index(Lakehouse.scanAsOf(spark, src, 0L)), src,
      asOfGen = 0L)
    Layout.appendGeneration(spark, src, docBatch(40, 50), Seq("doc_id"),
      bits = 6, partitions = 1, gen = 1L)
    Lakehouse.compact(spark, src, Seq("doc_id"), bits = 6, partitions = 1)
    val e = intercept[Exception] {
      FeedConsumer.applyFeedToBm25IndexTracked(spark, ix, src, toGen = 1L)
    }
    assert(e.getMessage != null && e.getMessage.contains("epoch"),
      s"expected the epoch guard, got: ${e.getMessage}")
  }

  test("tracked VectorIndex: multi-window consumption equals the " +
      "one-shot apply; replays no-op; a crash before the marker " +
      "re-applies cleanly (the marker is the only commit point)") {
    val base = tmp("feedc-vec")
    val src = s"$base/emb"
    val ix = s"$base/index"
    Layout.appendGeneration(spark, src, vecBatch(0, 80), Seq("vec_id"),
      bits = 6, partitions = 2, gen = 0L)
    val idx0 = Similarity.buildVectorIndex(
      Lakehouse.scanAsOf(spark, src, 0L), nlist = 4, m = 2,
      trainOn = vecBatch(0, 80))
    FeedConsumer.initTrackedVectorIndex(spark, ix, idx0, src,
      asOfGen = 0L)
    Layout.appendGeneration(spark, src, vecBatch(80, 100), Seq("vec_id"),
      bits = 6, partitions = 1, gen = 1L)
    Lakehouse.deleteMatching(spark, src, Seq(5L, 85L).toDF("vec_id"),
      "vec_id") // stamps gen 1
    val (idx1, off1) = FeedConsumer.applyFeedToVectorIndexTracked(spark,
      ix, src, toGen = 1L)
    assert(off1.version == 2L && off1.gen == 1L)
    val (_, offR) = FeedConsumer.applyFeedToVectorIndexTracked(spark,
      ix, src, toGen = 1L)
    assert(offR == off1, "replay must no-op")
    // served rows: deleted ids gone, appended ids present
    val ids = idx1.vectors.select("corpus_id").as[Long].collect().toSet
    assert(!ids.contains(5L) && !ids.contains(85L) && ids.contains(99L))
    // one-shot equivalence: same geometry, same live rows
    val oneShot = Similarity.applyFeedToVectorIndex(
      Similarity.loadVectorIndex(spark, s"$ix/v1"),
      Lakehouse.changesBetween(spark, src, 0L, 1L))
    assert(oneShot.vectors.select("corpus_id").as[Long].collect().toSet
      == ids)
    // CRASH WINDOW: a half-built next state without its marker is an
    // orphan the retry overwrites — simulate by planting a stale v3
    // dir, then consuming a real window into v3
    val f = new java.io.File(s"$ix/v3/vectors"); f.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$ix/v3/vectors/junk.txt"), "crash")
    Layout.appendGeneration(spark, src, vecBatch(100, 110),
      Seq("vec_id"), bits = 6, partitions = 1, gen = 2L)
    val (idx2, off2) = FeedConsumer.applyFeedToVectorIndexTracked(spark,
      ix, src, toGen = 2L)
    assert(off2.version == 3L && off2.gen == 2L)
    assert(idx2.vectors.select("corpus_id").as[Long].collect().toSet
      .contains(105L))
    // pruning: states more than one version behind are gone, the
    // previous one survives for in-flight serves
    val dirs = new java.io.File(ix).listFiles().map(_.getName).toSet
    assert(!dirs.contains("v1") && dirs.contains("v2") &&
      dirs.contains("v3"), dirs.mkString(","))
  }
}
