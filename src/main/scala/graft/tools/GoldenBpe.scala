package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the reviewed golden parquet for the BPE trainer
  * (`golden/bpe_merges.parquet`): the FULL converged merge sequence of
  * [[graft.llm.Bpe.train]] over the sf0.01 `documents` table — (rank,
  * left, right), one row per merge, pinning the greedy order and every
  * tie-break at corpus scale. Run + review + copy per golden/README.md
  * (review = replay against an independently-written BPE
  * implementation over the same DuckDB-extracted word frequencies) —
  * the golden file is a pinned artifact, not a build output.
  *
  * Usage: `sbt "runMain graft.tools.GoldenBpe /tmp/golden_bpe"`
  */
object GoldenBpe {

  val SfDir = "/root/testdata/sf0.01"
  val NumMerges = 2000 // beyond convergence for the sf0.01 vocabulary

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/golden_bpe")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, SfDir, "documents")
    val model = graft.llm.Bpe.train(docs, "text", NumMerges)
    graft.llm.Bpe.modelToDF(spark, model)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    println(s"GOLDEN-BPE merges=${model.size} -> $outDir")
    spark.stop()
  }
}
