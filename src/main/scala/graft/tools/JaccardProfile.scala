package graft.tools
import graft._
import graft.llm.Dedup
import org.apache.spark.sql.functions._
object JaccardProfile extends App {
  val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  time("0 docs count")(docs.count())
  val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    .withColumn("sh_size", size(col("sh")).cast("long"))
  time("1 shingles only")(sh.select(sum(col("sh_size"))).collect())
  val inv = sh.select(col("id"), col("sh_size"), explode(col("sh")).as("s"))
    .select(col("id"), col("sh_size"), xxhash64(col("s")).as("shingle"))
  time("2 inv explode+hash")(inv.count())
  val buckets = inv.groupBy("shingle").agg(collect_list(struct(col("id"), col("sh_size"))).as("docs"))
  time("3 buckets groupBy")(buckets.count())
  val pairs = buckets.filter(size(col("docs")) > 1)
    .select(explode(graft.expressions.GraftExpressions.pairCombinations(col("docs"))).as("p"))
    .select(col("p.i"), col("p.j"), col("p.si"), col("p.sj"))
  time("4 pairs explode")(pairs.count())
  val full = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
  time("5 full query")(full.count())
  time("6 full again")(full.count())
  spark.stop()
}
