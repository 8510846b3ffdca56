package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.DocumentsStore
import graft.operators.Skew

/** Scale-path mechanics: salted joins, bucketed co-located joins, typed
  * Dataset views — the 100 TB layout, proven at test scale via plan shape
  * (no-exchange joins) and result equality. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join (inner)") {
    val fact = Tables.load(spark, sf0, "lineitem")
      .select($"l_orderkey".as("k"), $"l_quantity")
    val dim = Tables.load(spark, sf0, "orders")
      .select($"o_orderkey".as("k"), $"o_orderstatus")
    val plain = fact.join(dim, Seq("k"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("heavyHitters surfaces the hottest keys with counts") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("key")
    val hh = Skew.heavyHitters(df, "key", 2).as[(String, Long)].collect()
    assert(hh.toSeq == Seq(("a", 3L), ("b", 2L)))
  }

  test("bucketed documents tables join with no exchange (co-located layout)") {
    val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = (1 to 500).map(i =>
      (s"k$i", s"h$i", i.toLong, "text/plain", ts0, ts0))
      .toDF("key", "content_hash", "size", "mimetype", "created_at", "updated_at")
    Seq("docs_a", "docs_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.isDirectory) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    DocumentsStore.writeBucketed(docs, "docs_a", buckets = 8)
    DocumentsStore.writeBucketed(docs.withColumn("size", $"size" * 2), "docs_b",
      buckets = 8)
    // force the shuffle-join path (at test scale AQE would broadcast and
    // bypass bucketing; at 100 TB neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.table("docs_a")
      val b = spark.table("docs_b").select($"key", $"size".as("size_b"))
      val joined = a.join(b, Seq("key"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() == 500)
      // the rebuild-kernel anti-join is likewise exchange-free on this layout
      val anti = a.join(b.select("key"), Seq("key"), "left_anti")
      assert(!anti.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(anti.isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("e2e make over a bucketed lake: documents side of reconcile has no exchange") {
    // Build the same source tree into a plain and a bucketed dataset, then
    // compare the reconcile (full-outer) plans: the bucketed documents side
    // must read pre-partitioned (no Exchange above its scan), so the whole
    // join carries exactly one Exchange (the incoming source side) vs two
    // on the plain layout.
    val src = java.nio.file.Files.createTempDirectory("bucketed-src")
    (1 to 50).foreach { i =>
      val p = src.resolve(s"dir${i % 5}/f$i.txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, s"content $i".getBytes)
    }
    val lake = java.nio.file.Files.createTempDirectory("bucketed-lake").toString
    val arch = new GraftArchive(spark, lake)
    val plainDs = arch.dataset("plain_ds")
    val bucketedDs = arch.dataset("bucketed_ds", bucketedLayout = true)
    plainDs.crawl(src.toString)
    bucketedDs.crawl(src.toString)
    assert(bucketedDs.documents.count() == 50)
    assert(spark.catalog.tableExists(bucketedDs.bucketedTableName))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val source = graft.pipelines.Crawl.hashAndDescribe(spark, src.toString,
        graft.pipelines.Crawl.listKeys(spark, src.toString))
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
      val plainRec = graft.pipelines.Make.reconcile(source, plainDs.documents)
      val bucketedRec = graft.pipelines.Make.reconcile(source, bucketedDs.documents)
      assert(exchanges(bucketedRec) == exchanges(plainRec) - 1,
        s"bucketed=${exchanges(bucketedRec)} plain=${exchanges(plainRec)}")
      // identical reconcile results across layouts
      val st = graft.pipelines.Make.status(bucketedRec)
        .as[(String, Long)].collect().toMap
      assert(st == Map("verify" -> 50L))
      // second publish keeps the bucketed layout (make → publish → re-read)
      bucketedDs.make(src.toString)
      assert(bucketedDs.documents.count() == 50)
      assert(graft.pipelines.Make.status(
        graft.pipelines.Make.reconcile(source, bucketedDs.documents))
        .as[(String, Long)].collect().toMap == Map("verify" -> 50L))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("typed Dataset[DocumentRow] view round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-typed").toString
    val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = Seq(("a", "h1", 1L, "text/plain", ts0, ts0))
      .toDF("key", "content_hash", "size", "mimetype", "created_at", "updated_at")
    docs.write.parquet(s"$dir/documents.parquet")
    val typed = DocumentsStore.readTyped(spark, s"$dir/documents.parquet")
    val row = typed.collect()(0)
    assert(row.key == "a" && row.size == 1L && row.mimetype == "text/plain")
  }
}
