package graft

import org.apache.spark.sql.functions._

import graft.llm.Classify

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (0L, "spark shuffle exchange partition shuffle"),
    (0L, "catalyst plan exchange codegen"),
    (0L, "partition pruning scan parquet"),
    (1L, "recipe butter flour sugar butter"),
    (1L, "oven bake flour sugar"),
    (1L, "sugar icing cake oven"))

  /** Plain-Scala multinomial NB in the same micro-log units — the
    * independent reference for the relational formulation. */
  private def refClassify(doc: String): (Long, Long) = {
    def toks(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val byLabel = train.groupBy(_._1)
    val vocab = train.flatMap(t => toks(t._2)).distinct.size
    def q(x: Double) = math.round(math.log(x) * 10000)
    val scores = byLabel.toSeq.map { case (label, docs) =>
      val cnts = docs.flatMap(d => toks(d._2)).groupBy(identity)
        .map { case (k, v) => k -> v.size }
      val tot = cnts.values.sum
      val prior = q(docs.size.toDouble / train.size)
      val oov = -q((tot + vocab).toDouble)
      val score = prior + toks(doc).map { t =>
        oov + cnts.get(t).map(c => q((c + 1).toDouble)).getOrElse(0L)
      }.sum
      (label, score)
    }
    scores.maxBy { case (l, s) => (s, -l) }
  }

  private lazy val model =
    Classify.nbTrain(train.toDF("label", "text"), "label", "text")

  test("nbClassify agrees with a plain-Scala NB on seen and unseen tokens") {
    val docs = Seq(
      (10L, "shuffle exchange plan"),          // clearly class 0
      (11L, "butter sugar oven cake"),         // clearly class 1
      (12L, "quantum zebra xylophone"),        // all-OOV: priors + floor
      (13L, ""),                               // empty: priors only
      (14L, "shuffle butter"))                 // mixed
    val got = Classify.nbClassify(docs.toDF("id", "text"), "id", "text", model)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refClassify(text), s"doc $id '$text'")
    }
    assert(got(10L)._1 == 0L && got(11L)._1 == 1L)
  }

  test("exact ties break to the smallest label") {
    // identical training text for both labels → identical weights,
    // identical priors → every score ties exactly (integer units)
    val sym = Seq((3L, "alpha beta"), (7L, "alpha beta"))
    val m = Classify.nbTrain(sym.toDF("label", "text"), "label", "text")
    val out = Classify.nbClassify(
        Seq((1L, "alpha"), (2L, "gamma")).toDF("id", "text"), "id", "text", m)
      .as[(Long, Long, Long)].collect().map { case (id, l, _) => id -> l }.toMap
    assert(out == Map(1L -> 3L, 2L -> 3L))
  }

  test("scores are partitioning-invariant (integer micro-log units)") {
    val docs = Tables.load(spark, sf0, "documents")
    val emb = Tables.load(spark, sf0, "embeddings")
      .select(col("vec_id"), col("label"))
    val labeled = docs.join(emb, col("doc_id") === col("vec_id"))
    val m = Classify.nbTrain(labeled, "label", "text")
    val once = Classify.nbClassify(docs, "doc_id", "text", m)
      .as[(Long, Long, Long)].collect().toSet
    val m7 = Classify.nbTrain(labeled.repartition(7), "label", "text")
    val again = Classify.nbClassify(docs.repartition(13), "doc_id", "text", m7)
      .as[(Long, Long, Long)].collect().toSet
    assert(once == again)
    assert(once.size == docs.count())
  }
}
