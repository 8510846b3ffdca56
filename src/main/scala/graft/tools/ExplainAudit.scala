package graft.tools
import graft._
object ExplainAudit extends App {
  val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.01"
  val targets = args.headOption.map(_.split(",").toSeq)
    .getOrElse(Seq("q5_region_revenue", "q3_shipping_priority", "j5_point_lookup",
      "p1_project_keys", "a6_keep_latest", "dedup_jaccard_pairs", "ann_cosine_topk"))
  targets.foreach { n =>
    println(s"=== $n ===")
    SparkEntry.queries(n)(spark, dir).explain("formatted")
  }
  spark.stop()
}
