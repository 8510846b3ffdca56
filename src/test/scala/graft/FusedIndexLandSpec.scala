package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.{Retrieval, Similarity}

/** The r18 minimal-pass index landing paths are FRAME-IDENTICAL to the
  * unfused pairs they replace: build+land ≡ compact(bm25Index),
  * fused feed-apply ≡ compact(applyFeed), geometry-copying vector save ≡
  * the full save. The fusions exist to stop re-evaluating tokenize/encode
  * lineage once per frame write (three independent write actions share no
  * exchanges); these specs pin that the OUTPUT state is the same, so every
  * serving/oracle property of the unfused paths carries over verbatim. */
class FusedIndexLandSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docBatch(lo: Int, hi: Int) =
    (lo until hi).map(i =>
      (i.toLong, if (i % 11 == 0) "" // empty docs count in n, not toklen
       else s"alpha tok$i beta tok${i % 7} gamma")).toDF("doc_id", "text")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertSameIndex(a: Retrieval.Bm25Index,
                              b: Retrieval.Bm25Index): Unit = {
    assert(sortedRows(a.postings) == sortedRows(b.postings))
    assert(sortedRows(a.docFreq) == sortedRows(b.docFreq))
    assert(sortedRows(a.stats) == sortedRows(b.stats))
  }

  test("buildCompactedBm25Index lands the identical three frames as " +
      "compactBm25Index(bm25Index(docs))") {
    val docs = docBatch(0, 50)
    val fused = Retrieval.buildCompactedBm25Index(docs, tmp("fused-build"))
    val unfused = Retrieval.compactBm25Index(
      Retrieval.bm25Index(docs), tmp("unfused-build"))
    assertSameIndex(fused, unfused)
  }

  test("applyFeedToBm25IndexCompacted lands the identical state as " +
      "compactBm25Index(applyFeedToBm25Index) — deletes, inserts, " +
      "updates, empty docs") {
    val base = Retrieval.compactBm25Index(
      Retrieval.bm25Index(docBatch(0, 40)), tmp("fused-base"))
    // update = delete(old)+insert(new); plus pure deletes, pure inserts,
    // and an empty-text insert (n moves, toklen/postings don't)
    val feed = docBatch(10, 20).withColumn("__op", lit("delete"))
      .unionByName(docBatch(15, 18)
        .withColumn("text", concat(col("text"), lit(" fresh")))
        .withColumn("__op", lit("insert")))
      .unionByName(Seq((100L, ""), (101L, "zeta eta"))
        .toDF("doc_id", "text").withColumn("__op", lit("insert")))
      .select("__op", "doc_id", "text")
    val fused = Retrieval.applyFeedToBm25IndexCompacted(base, feed,
      tmp("fused-apply"))
    val unfused = Retrieval.compactBm25Index(
      Retrieval.applyFeedToBm25Index(base, feed), tmp("unfused-apply"))
    assertSameIndex(fused, unfused)
    // and the serve agrees, end to end
    val qs = Seq((1L, "alpha tok15"), (2L, "zeta")).toDF(
      "query_id", "query_text")
    assert(sortedRows(Retrieval.bm25TopKAgainst(fused, qs, k = 5)) ==
      sortedRows(Retrieval.bm25TopKAgainst(unfused, qs, k = 5)))
  }

  test("applyFeedToBm25IndexCompacted raises on an analyzer " +
      "fingerprint mismatch, like the unfused apply") {
    val base = Retrieval.compactBm25Index(
      Retrieval.bm25Index(docBatch(0, 10)), tmp("fused-fpbase"))
    val doctored = Retrieval.Bm25Index(base.postings, base.docFreq,
      base.stats.withColumn("analyzer_fp", lit(12345L)))
    val feed = docBatch(0, 2).withColumn("__op", lit("delete"))
      .select("__op", "doc_id", "text")
    val e = intercept[Exception] {
      Retrieval.applyFeedToBm25IndexCompacted(doctored, feed,
        tmp("fused-fp")).stats.collect()
    }
    assert(e.getMessage.contains("analyzer fingerprint mismatch") ||
      Option(e.getCause).exists(
        _.getMessage.contains("analyzer fingerprint mismatch")))
  }

  test("saveVectorIndexFrom lands the identical three frames as " +
      "saveVectorIndex in the feed-apply lifecycle shape") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.37 + d)))
    }.toDF("vec_id", "embedding")
    val v1 = tmp("fused-vec-v1")
    val idx1 = Similarity.saveVectorIndex(
      Similarity.buildVectorIndex(vecs.filter(col("vec_id") < 40),
        trainOn = vecs.filter(col("vec_id") < 30)), v1)
    val feed = vecs.filter(col("vec_id") >= 40)
      .withColumn("__op", lit("insert"))
      .unionByName(vecs.filter(col("vec_id") < 5)
        .withColumn("__op", lit("delete")))
    val next = Similarity.applyFeedToVectorIndex(idx1, feed)
    val a = Similarity.saveVectorIndexFrom(next, v1, tmp("fused-vec-from"))
    val b = Similarity.saveVectorIndex(next, tmp("fused-vec-full"))
    assert(sortedRows(a.centroids) == sortedRows(b.centroids))
    assert(sortedRows(a.codebooks) == sortedRows(b.codebooks))
    assert(sortedRows(a.vectors) == sortedRows(b.vectors))
  }
}
