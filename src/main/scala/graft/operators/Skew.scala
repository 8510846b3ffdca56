package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB path.
  *
  * AQE's skew-join handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool for pathological hot keys in shuffle joins AQE can't split (e.g.
  * aggregation-feeding joins). Both sides stay declarative DataFrames.
  */
object Skew {

  /** Salted equi-join: the skewed `fact` side gets a deterministic salt in
    * [0, salts), the `dim` side is replicated across every salt value, and
    * the join runs on (key, salt) — splitting each hot key into `salts`
    * shuffle partitions. Result equals `fact.join(dim, key)` exactly.
    *
    * The salt derives from `spark_partition_id` + a per-key row hash, so it
    * is uniform without an RNG (deterministic re-execution under task
    * retry, which `rand()` would break).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltCol = pmod(
      xxhash64(col(key), spark_partition_id(), monotonically_increasing_id()),
      lit(salts.toLong)).cast("int")
    val saltedFact = fact.withColumn("__salt", saltCol)
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-N heavy-hitter keys of a column with their frequencies — the
    * diagnostic used to decide whether salting is worth it. */
  def heavyHitters(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topN)
}
