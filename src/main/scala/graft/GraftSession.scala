package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the settings every graft job needs.
  *
  * Local mode runs with `spark.sql.shuffle.partitions` matched to the core
  * count instead of the 200 default; AQE stays on so the same plans re-split
  * and coalesce correctly on a real cluster at 100 TB.
  */
object GraftSession {
  def builder(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // runtime skew-join splitting: invisible at test SF, load-bearing at
      // 100 TB when a hot join key (popular content_hash, shared shingle)
      // would otherwise pin one reducer
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = builder().getOrCreate()
}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  import org.apache.spark.sql.functions._

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; read it as a long and convert ns → µs with integer division
    * (ns epoch values exceed 2^53, so a double-valued `/` would corrupt
    * them — `div` stays integral). The generator emits µs-precision values,
    * so the truncation is lossless and matches DuckDB's reading exactly.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
