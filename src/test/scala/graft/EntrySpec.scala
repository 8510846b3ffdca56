package graft

/** Smoke: every declared query runs at sf0.001 and the flagship returns
  * rows. The full value-level oracle comparison runs via Verify + DuckDB
  * (tools/check_oracle.py / the driver's t2 gate). */
class EntrySpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (hash-family ops use golden-pair parquets)") {
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).isEmpty)
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf0)
      assert(df.columns.nonEmpty)
      df.count() // executes the plan
    }
  }
}
