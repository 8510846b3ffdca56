package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sf0, "embeddings").cache()

  test("cosine on hand-constructed vectors") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 1), k = 3)
      .orderBy("rank").select("corpus_id").as[Long].collect()
    // nearest to (1,0): (2,0) sim 1.0, then (1,1) sim .707, then (0,1) sim 0
    assert(top.sameElements(Array(4L, 3L, 2L)))
  }

  test("brute-force top-k returns k rows per query with ranks 1..k") {
    val out = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), k = 5)
    assert(out.count() == 15)
    assert(out.groupBy("query_id").agg(max("rank")).as[(Long, Int)]
      .collect().forall(_._2 == 5))
    assert(out.filter($"sim" > 1.000001 || $"sim" < -1.000001).isEmpty)
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 8)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    // random embeddings are a worst case for IVF; nprobe=8/16 should still
    // recover half the true neighbors
    assert(recall >= 0.4, s"recall $recall")
  }

  test("hyperplane LSH buckets group cosine-similar vectors") {
    val df = Seq(
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.fill(8)(0.99f)), // same direction as 1
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val cands = Similarity.lshBucketCandidates(df, nPlanes = 8)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
  }
}
