package graft

import org.apache.spark.sql.functions._

import graft.llm.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs3 = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry date"),
    (3L, "apple date")
  ).toDF("doc_id", "text")

  test("bm25TopK matches a plain-Scala BM25 reference on a hand-sized corpus") {
    val q = Seq((10L, "apple cherry")).toDF("query_id", "query_text")
    val got = Retrieval.bm25TopK(docs3, q, k = 3)
      .orderBy("rank").as[(Long, Long, Int, Double)].collect()

    // independent reference: classic Lucene-variant BM25 over the same
    // tokenization, k1 = 1.2, b = 0.75
    val corpus = Map(
      1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "cherry", "cherry", "date"),
      3L -> Seq("apple", "date"))
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    def dfOf(t: String) = corpus.values.count(_.contains(t)).toDouble
    def score(d: Long, terms: Set[String]): Double = {
      val toks = corpus(d)
      val dl = toks.size.toDouble
      terms.toSeq.sorted.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val idf = math.log((n - dfOf(t) + 0.5) / (dfOf(t) + 0.5) + 1.0)
          // grouped exactly as the engine: idf * (num / den)
          idf * ((tf * (1.2 + 1.0)) /
            (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
        }
      }.sum
    }
    val want = corpus.keys.toSeq
      .map(d => (d, score(d, Set("apple", "cherry"))))
      .filter(_._2 > 0)
      .sortBy { case (d, s) => (-s, d) }
      .zipWithIndex
      .map { case ((d, s), i) =>
        (10L, d, i + 1, BigDecimal(s).setScale(10,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
    assert(got.toSeq == want,
      s"got ${got.toSeq.mkString(",")} want ${want.mkString(",")}")
    // doc 1 carries both terms with tf(apple)=2 → must rank first
    assert(got.head._2 == 1L)
  }

  test("bm25TopK is a postings join: docs without query terms never appear") {
    val q = Seq((10L, "banana")).toDF("query_id", "query_text")
    val got = Retrieval.bm25TopK(docs3, q, k = 10)
    // doc 3 has no 'banana' → absent even with k > corpus size
    assert(got.filter(col("doc_id") === 3L).isEmpty)
    assert(got.count() == 2)
  }

  test("bm25TopK: queries with no indexed terms yield no rows; empty docs shape avgdl") {
    val docs = docs3.union(Seq((4L, "")).toDF("doc_id", "text"))
    val q = Seq((10L, "zzz qqq"), (11L, "date")).toDF("query_id", "query_text")
    val got = Retrieval.bm25TopK(docs, q, k = 5)
    assert(got.filter(col("query_id") === 10L).isEmpty)
    // N = 4 (empty doc counts), avgdl = 10/4: check one score end-to-end
    val s = got.filter(col("query_id") === 11L && col("doc_id") === 3L)
      .select("score").as[Double].head()
    val idf = math.log((4.0 - 2 + 0.5) / (2 + 0.5) + 1.0)
    val expect = idf * ((1.0 * (1.2 + 1.0)) /
      (1.0 + 1.2 * (1.0 - 0.75 + 0.75 * 2.0 / (10.0 / 4.0))))
    assert(s == BigDecimal(expect).setScale(10,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("maxDfRatio prunes stop terms before the postings expansion") {
    // 'apple' df=2/3 > 0.5 → pruned; only 'cherry' (df=2/3... also pruned)
    // use 'banana' df=2/3 and 'date' df=2/3: with ratio 0.7 all survive,
    // with ratio 0.5 every query term is gone
    val q = Seq((10L, "apple cherry")).toDF("query_id", "query_text")
    val pruned = Retrieval.bm25TopK(docs3, q, k = 3, maxDfRatio = 0.5)
    assert(pruned.isEmpty)
    val kept = Retrieval.bm25TopK(docs3, q, k = 3, maxDfRatio = 0.7)
    assert(kept.count() > 0)
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs3, q, k = 3, maxDfRatio = 0.0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs3, q, k = 0)
    }
  }

  test("bm25TopK is invariant under repartitioning") {
    val q = Seq((10L, "apple cherry"), (11L, "date banana"))
      .toDF("query_id", "query_text")
    val a = Retrieval.bm25TopK(docs3, q, k = 3)
    val b = Retrieval.bm25TopK(docs3.repartition(7), q.repartition(3), k = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
