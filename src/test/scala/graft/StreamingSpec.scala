package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Stage one slice as a single mtime-ordered arrival file — the
    * SparkEntry.sliceStream recipe (file-source dispatch order =
    * arrival index). */
  private def appendArrival(dir: java.io.File,
                            df: org.apache.spark.sql.DataFrame,
                            i: Int): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-arr-slice")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    val dst = new java.io.File(dir, f"arrival-$i%03d.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    require(dst.setLastModified(1700000000000L + i * 60000L),
      s"cannot order $dst by mtime")
  }

  /** Write every slice into a fresh arrival directory and return it. */
  private def arrivalDir(
      slices: Seq[org.apache.spark.sql.DataFrame]): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-arrivals")
    slices.zipWithIndex.foreach { case (df, i) =>
      appendArrival(dir.toFile, df, i) }
    dir.toFile
  }

  /** One-file-per-micro-batch stream over an arrival directory. */
  private def arrivalStream(dir: java.io.File,
                            schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)

  test("incremental streaming crawl: drop-dir files publish exactly once") {
    val drop = java.nio.file.Files.createTempDirectory("graft-drop")
    def put(rel: String, content: String): Unit = {
      val p = drop.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    }
    put("a/one.txt", "hello world")
    put("two.txt", "second")
    val lake = java.nio.file.Files.createTempDirectory("graft-stream-lake").toString
    val ds = new GraftDataset(spark, lake, "stream_ds")

    val q1 = graft.streaming.Streaming.incrementalCrawl(ds, drop.toString)
    q1.awaitTermination()
    val round1 = ds.documents.select("key", "content_hash")
      .as[(String, String)].collect().toMap
    assert(round1.keySet == Set("a/one.txt", "two.txt"))
    assert(round1("a/one.txt") == "2aae6c35c94fcfb415dbe95f408b9ce91ee846ed")
    // blob landed content-addressed
    assert(ds.openBlob("a/one.txt").map(new String(_, "UTF-8")).contains("hello world"))

    // a second AvailableNow run with a new file processes ONLY the delta
    // (stream checkpoint = the exactly-once ledger)
    put("three.txt", "third")
    val q2 = graft.streaming.Streaming.incrementalCrawl(ds, drop.toString)
    q2.awaitTermination()
    assert(ds.documents.count() == 3)
    assert(ds.versions.size == 2) // one publish per non-empty batch run
    val diffLines = ds.versionDiff(ds.versions.last)
    assert(diffLines.count(_.startsWith("+")) == 1) // only three.txt added
  }

  test("streaming dedup emits each content hash exactly once across runs") {
    val drop = java.nio.file.Files.createTempDirectory("graft-dedup-drop")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-dedup-ck").toString
    def put(name: String, content: String): Unit =
      java.nio.file.Files.write(drop.resolve(name), content.getBytes("UTF-8"))
    val outDir = java.nio.file.Files.createTempDirectory("graft-dedup-out").toString
    def run(): Set[(String, String)] = {
      val stream = spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .load(drop.toString)
        .select(regexp_replace(col("path"), "^.*/", "").as("name"),
          sha1(col("content")).as("content_hash"))
      val q = Streaming.dedupStream(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(outDir).select("name", "content_hash")
        .as[(String, String)].collect().toSet
    }
    put("a.txt", "same bytes")
    put("b.txt", "same bytes") // intra-batch duplicate
    put("c.txt", "unique")
    val round1 = run()
    assert(round1.map(_._2).size == 2, s"round1=$round1") // one per hash
    assert(round1.map(_._1).subsetOf(Set("a.txt", "b.txt", "c.txt")))

    // new files: one duplicates round 1's content — the state store
    // remembers it across the restart; only the genuinely new one passes
    put("d.txt", "same bytes")
    put("e.txt", "brand new")
    val round2 = run()
    assert((round2 -- round1).map(_._1) == Set("e.txt"),
      s"delta=${round2 -- round1}")
  }

  test("streaming decontamination drops benchmark-overlapping docs, stateless") {
    val leak = (1 to 13).map(i => s"w$i").mkString(" ")
    val bench = Seq(s"benchmark stem $leak choices").toDF("text")
    val drop = java.nio.file.Files.createTempDirectory("graft-dc-drop")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-dc-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-dc-out").toString
    def put(name: String, content: String): Unit =
      java.nio.file.Files.write(drop.resolve(name), content.getBytes("UTF-8"))
    put("clean.txt", "a perfectly clean training document with original words")
    put("dirty.txt", s"scraped page containing $leak verbatim")
    put("near.txt", (1 to 12).map(i => s"w$i").mkString(" ")) // 12 < n: keep
    val stream = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(drop.toString)
      .select(regexp_replace(col("path"), "^.*/", "").as("name"),
        col("content").cast("string").as("text"))
    val q = Streaming.decontaminateStream(stream, bench, "text", n = 13)
      .writeStream.format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(outDir).select("name").as[String].collect().toSet
    assert(out == Set("clean.txt", "near.txt"), s"got $out")
    // parity with the batch operator on the same data
    val docs = Seq(
      (1L, "a perfectly clean training document with original words"),
      (2L, s"scraped page containing $leak verbatim"),
      (3L, (1 to 12).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val batchKept = graft.llm.Dedup.decontaminate(
        docs, Seq((9L, s"benchmark stem $leak choices")).toDF("doc_id", "text"),
        "doc_id", "text", n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept == Set(1L, 3L)) // same verdicts as the stream path
  }

  test("stripBoilerplateStream rewrites arriving docs with the reference corpus's spans") {
    val footer = "generated by acme corp all rights reserved contact legal dept"
    val reference = Seq(
      (1L, s"unique alpha words one $footer"),
      (2L, s"other beta content two $footer"),
      (3L, s"third gamma text three $footer")).toDF("doc_id", "text")
    val drop = java.nio.file.Files.createTempDirectory("graft-sb-drop")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-sb-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-sb-out").toString
    def put(name: String, content: String): Unit =
      java.nio.file.Files.write(drop.resolve(name), content.getBytes("UTF-8"))
    put("hit.txt", s"fresh arriving page $footer and more prose")
    put("clean.txt", "an arriving page with entirely original content")
    val stream = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(drop.toString)
      .select(regexp_replace(col("path"), "^.*/", "").as("name"),
        col("content").cast("string").as("text"))
    val q = Streaming.stripBoilerplateStream(stream, reference,
        "doc_id", "text", w = 10, minDocs = 3)
      .select("name", "clean_text")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(outDir)
      .as[(String, String)].collect().toMap
    assert(out("hit.txt") == "fresh arriving page and more prose")
    assert(out("clean.txt") == "an arriving page with entirely original content")
    // parity with the batch operator given the same reference spans:
    // the batch op flags within ITS input, so run it over reference ∪
    // the arrivals and compare the arrivals' rewrites
    val arrivals = Seq(
      (10L, s"fresh arriving page $footer and more prose"),
      (11L, "an arriving page with entirely original content"))
      .toDF("doc_id", "text")
    val batch = graft.llm.Dedup.stripBoilerplate(
        reference.unionByName(arrivals), "doc_id", "text",
        w = 10, minDocs = 3)
      .filter(col("doc_id") >= 10L)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(batch(10L) == out("hit.txt") && batch(11L) == out("clean.txt"))
  }

  test("substringDupStream scores arrivals against the reference, batch-parity") {
    val shared = (0 until 100).map(_ % 7).mkString
    val reference = Seq((100L, shared + "x" * 50)).toDF("doc_id", "text")
    val drop = java.nio.file.Files.createTempDirectory("graft-ss-drop")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ss-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-ss-out").toString
    def put(name: String, content: String): Unit =
      java.nio.file.Files.write(drop.resolve(name), content.getBytes("UTF-8"))
    put("hit.txt", shared + "a" * 100)     // 3 of 7 windows in the corpus
    put("clean.txt", "c" * 200)            // 0 of 7
    put("short.txt", "tiny")               // windowless: kept, NULL stats
    val stream = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(drop.toString)
      .select(regexp_replace(col("path"), "^.*/", "").as("name"),
        col("content").cast("string").as("text"))
    val q = Streaming.substringDupStream(stream, reference,
        "doc_id", "text", w = 50, stride = 25)
      .select("name", "n_windows", "n_dup_windows", "dup_frac")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("hit.txt", "clean.txt", "short.txt"))
    assert(out("hit.txt").getLong(1) == 7L &&
      out("hit.txt").getLong(2) == 3L &&
      out("hit.txt").getDouble(3) == 0.428571)
    assert(out("clean.txt").getLong(1) == 7L &&
      out("clean.txt").getLong(2) == 0L)
    assert(out("short.txt").isNullAt(1) && out("short.txt").isNullAt(3))
    // batch parity on the windowed rows: same reference, same arrivals
    val arrivals = Seq((10L, shared + "a" * 100), (11L, "c" * 200),
      (12L, "tiny")).toDF("doc_id", "text")
    val batch = graft.llm.Dedup.substringDupStatsAgainst(
        arrivals, reference, "doc_id", "text", w = 50, stride = 25)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(batch.keySet == Set(10L, 11L))  // batch drops windowless rows
    assert(batch(10L) == ((out("hit.txt").getLong(1),
      out("hit.txt").getLong(2), out("hit.txt").getDouble(3))))
    assert(batch(11L) == ((out("clean.txt").getLong(1),
      out("clean.txt").getLong(2), out("clean.txt").getDouble(3))))
  }

  test("temperatureMixStream applies reference-derived rates, batch-parity") {
    // reference: 'big' 64 docs vs 'small' 4 → rate(big) = sqrt(4/64) = 1/4
    val reference = ((0 until 64).map(i => (i.toLong, s"ref doc $i", "big")) ++
      (64 until 68).map(i => (i.toLong, s"ref doc $i", "small")))
      .toDF("doc_id", "text", "source")
    val drop = java.nio.file.Files.createTempDirectory("graft-tm-drop")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-tm-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-tm-out").toString
    (0 until 40).foreach { i =>
      java.nio.file.Files.write(drop.resolve(f"big-$i%02d.txt"),
        s"arriving big doc $i".getBytes("UTF-8"))
    }
    java.nio.file.Files.write(drop.resolve("small-0.txt"),
      "arriving small doc".getBytes("UTF-8"))
    java.nio.file.Files.write(drop.resolve("novel-0.txt"),
      "arriving novel-stratum doc".getBytes("UTF-8"))
    val stream = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(drop.toString)
      .select(regexp_replace(col("path"), "^.*/", "").as("name"),
        col("content").cast("string").as("text"))
      .withColumn("source",
        regexp_replace(regexp_replace(col("name"), "-.*$", ""), "\\d+", ""))
    val q = Streaming.temperatureMixStream(stream, reference, "source", "text")
      .select("name", "source")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val kept = spark.read.parquet(outDir).collect()
      .map(r => r.getString(0)).toSet
    // small survives whole; novel stratum (absent from reference) dropped;
    // big flattens to ~1/4
    assert(kept.contains("small-0.txt"))
    assert(!kept.contains("novel-0.txt"))
    val bigKept = kept.count(_.startsWith("big-"))
    assert(bigKept > 2 && bigKept < 20, s"big kept $bigKept of 40")
    // parity: the batch operator with the same reference keeps exactly
    // the same rows
    val arrivals = ((0 until 40).map(i =>
        (f"big-$i%02d", s"arriving big doc $i", "big")) ++
      Seq(("small-0", "arriving small doc", "small"),
        ("novel-0", "arriving novel-stratum doc", "novel")))
      .toDF("name", "text", "source")
    val batchKept = graft.llm.Corpus.temperatureMixWithReference(
        arrivals, reference, "source", "text")
      .select("text").as[String].collect().toSet
    val streamTexts = spark.read.parquet(outDir).count()
    assert(batchKept.size == streamTexts.toInt)
  }

  test("readEvents starts on an EMPTY directory and reads later arrivals") {
    // create-stream-before-producer: schema inference has no files yet,
    // so readEvents must fall back to the pinned current-generation
    // schema instead of failing, then pick up arrivals under it
    val drop = java.nio.file.Files.createTempDirectory("graft-ev-drop")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ev-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-ev-out").toString
    val stream = Streaming.readEvents(spark, drop.toString) // empty NOW
    // producer writes afterwards, in the same µs-NTZ encoding
    Seq((1L, "2024-05-01 10:00:00", 7L, "click", 1.5, "{}"),
      (2L, "2024-05-01 11:30:00", 8L, "view", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("append").parquet(drop.toString)
    val q = stream.select("event_id", "ts", "event_type")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 2)
    // ts normalized to session-zone TIMESTAMP, instants preserved
    assert(out.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(out.filter(col("event_id") === 1L)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .as[String].head() == "2024-05-01 10:00:00")
  }

  test("readEvents empty-dir fallback: wrong-generation arrivals fail with a diagnosis, not nulls") {
    val drop = java.nio.file.Files.createTempDirectory("graft-evmm-drop")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-evmm-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-evmm-out").toString
    val stream = Streaming.readEvents(spark, drop.toString) // empty → pinned
    assert(Streaming.eventsEncodingMismatch(spark, drop.toString).isEmpty)
    // the producer turns out to be the OLDER int64 generation (plain
    // long ts — what the ns encoding surfaces as under nanosAsLong)
    Seq((1L, 1714557600000000000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(drop.toString)
    val q = stream.select("event_id", "ts")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // the scan must FAIL (no silent wrong-schema read) …
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage != null)
    // … and the library diagnoses the cause explicitly
    val diag = Streaming.eventsEncodingMismatch(spark, drop.toString)
    assert(diag.isDefined && diag.get.contains("generation mismatch"),
      s"diag=$diag")
    assert(diag.get.contains("Recreate the stream"))
  }

  test("substringDupStream refuses an oversized reference window set, loudly") {
    val reference = Seq((1L, ('a' to 'z').mkString * 10)).toDF("doc_id", "text")
    val stream = spark.readStream.format("rate").load()
      .withColumn("text", lit("x")).withColumn("doc_id", col("value"))
    val e = intercept[IllegalArgumentException] {
      Streaming.substringDupStream(stream, reference, "doc_id", "text",
        w = 10, stride = 1, maxWindowHashes = 5)
    }
    assert(e.getMessage.contains("substringDupStatsAgainst"))
  }

  test("gopher and c4 gates apply to streams unchanged (stateless projections)") {
    // the quality gates are pure column work — no state, no watermark —
    // so the BATCH operators apply to a stream verbatim; this pins that
    // contract (and that nothing in them smuggles in a batch-only op)
    val good = ((1 to 60).map(i => s"word$i") ++
      Seq("the", "of", "and", "that", "have", "with")).mkString(" ")
    val drop = java.nio.file.Files.createTempDirectory("graft-gate-drop")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-gate-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-gate-out").toString
    java.nio.file.Files.write(drop.resolve("pass.txt"),
      (good + " one full closing sentence with six words.").getBytes("UTF-8"))
    java.nio.file.Files.write(drop.resolve("fail.txt"),
      "too short to pass anything".getBytes("UTF-8"))
    val stream = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(drop.toString)
      .select(regexp_replace(col("path"), "^.*/", "").as("name"),
        col("content").cast("string").as("text"))
    val gated = graft.llm.TextAnalysis.gopherGate(stream, "text")
    val q = graft.llm.TextAnalysis.c4Clean(gated, "text")
      .select("name", "keep", "clean_text")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(outDir)
      .as[(String, Boolean, String)].collect()
    // the gopher gate dropped fail.txt inside the stream; c4's columns
    // computed for the survivor (its single line ends '.', 60+ words)
    assert(out.map(_._1).toSeq == Seq("pass.txt"))
    assert(out.head._3.endsWith("six words."))
  }

  test("simhashDedupStream drops arrivals near-duplicating the reference, stateless") {
    val base = (1 to 120).map(i => s"tok$i").mkString(" ")
    val reference = Seq(
      (1L, base),
      (2L, (1 to 120).map(i => s"ref$i").mkString(" "))).toDF("doc_id", "text")
    val drop = java.nio.file.Files.createTempDirectory("graft-sh-drop")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-sh-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-sh-out").toString
    // near-dup of reference doc 1 (one token changed out of 120) and a
    // fully novel arrival
    val nearDup = base.replace("tok60", "changed")
    java.nio.file.Files.write(drop.resolve("dup.txt"), nearDup.getBytes("UTF-8"))
    java.nio.file.Files.write(drop.resolve("novel.txt"),
      (1 to 120).map(i => s"new$i").mkString(" ").getBytes("UTF-8"))
    val stream = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(drop.toString)
      .select(regexp_replace(col("path"), "^.*/", "").as("name"),
        col("content").cast("string").as("text"))
    val q = Streaming.simhashDedupStream(stream, reference,
        "doc_id", "text")
      .select("name")
      .writeStream.format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val kept = spark.read.parquet(outDir).as[String].collect().toSet
    assert(kept == Set("novel.txt"), s"kept $kept")
    // verdict parity with the batch against-operator on the same inputs
    val arrivals = Seq((10L, nearDup),
      (11L, (1 to 120).map(i => s"new$i").mkString(" "))).toDF("doc_id", "text")
    val batchDropped = graft.llm.Dedup.simhashNearPairsAgainst(
        graft.llm.Dedup.simhashSignatures(arrivals, "doc_id", "text"),
        graft.llm.Dedup.simhashSignatures(reference, "doc_id", "text"))
      .select("i").distinct().as[Long].collect().toSet
    assert(batchDropped == Set(10L)) // same verdicts: 10 dropped, 11 kept
  }

  test("semanticDedupStream drops arrivals duplicating the reference corpus, stateless") {
    // reference: 3 semantic groups of 3 members (the SimilaritySpec
    // geometry — ids 0..2 seed one cluster per group)
    val reference = (0 until 9).map { i =>
      val g = i % 3
      val v = Array.fill(8)(0.0f)
      v(g) = 1.0f
      v(3 + i % 5) = v(3 + i % 5) + 0.01f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    // arrivals: one near-duplicate of group 1, one novel direction
    val dupV = { val v = Array.fill(8)(0.0f); v(1) = 1.0f; v(7) = 0.02f; v }
    val novelV = { val v = Array.fill(8)(0.0f); v(6) = 1.0f; v }
    val drop = java.nio.file.Files.createTempDirectory("sem-drop")
    Seq((100L, dupV), (101L, novelV)).toDF("vec_id", "embedding")
      .write.parquet(s"$drop/batch0")
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .parquet(s"$drop/*")
    val outDir = java.nio.file.Files.createTempDirectory("sem-out").toString
    val ck = java.nio.file.Files.createTempDirectory("sem-ck").toString
    val q = Streaming.semanticDedupStream(stream, reference,
        nClusters = 3, threshold = 0.9, trainIters = 0)
      .select("vec_id")
      .writeStream.format("parquet").outputMode("append")
      .option("path", outDir).option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val kept = spark.read.parquet(outDir).as[Long].collect().toSet
    assert(kept == Set(101L), s"got $kept") // dup dropped, novel kept
    // batch parity: the same arrivals against the same reference via
    // the batch cluster assignment + member join
    val cents = graft.llm.Similarity.centroids(reference, 3)
    val arrivals = Seq((100L, dupV), (101L, novelV))
      .toDF("vec_id", "embedding")
    val batchKept = graft.llm.Similarity.ivfAssign(arrivals, cents)
      .join(graft.llm.Similarity.ivfAssign(reference, cents)
        .select(col("centroid_id"), col("cv").as("ref_v")),
        Seq("centroid_id"), "left_outer")
      .withColumn("sim", graft.llm.Similarity.cosine(col("cv"), col("ref_v")))
      .groupBy("corpus_id")
      .agg(max(when(col("sim") >= 0.9, 1).otherwise(0)).as("dup"))
      .filter(col("dup") === 0).select("corpus_id").as[Long].collect().toSet
    assert(batchKept == kept)
  }

  test("encodeVectorsStream: stream encode is bit-identical to the " +
      "batch extendVectorIndex over the same arrivals") {
    val emb = Tables.load(spark, sf0, "embeddings")
    val idx = graft.llm.Similarity.buildVectorIndex(
      emb.filter(col("vec_id") < 100))
    val batchSlice = emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
    val drop = java.nio.file.Files.createTempDirectory("vidx-drop")
    batchSlice.write.parquet(s"$drop/batch0")
    val stream = spark.readStream.schema(batchSlice.schema)
      .parquet(s"$drop/*")
    val outDir = java.nio.file.Files.createTempDirectory("vidx-out").toString
    val ck = java.nio.file.Files.createTempDirectory("vidx-ck").toString
    val q = Streaming.encodeVectorsStream(stream, idx)
      .writeStream.format("parquet").outputMode("append")
      .option("path", outDir).option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
    assert(streamed.count() === 100)
    // batch twin: the same arrivals through extendVectorIndex with the
    // same geometry (the stream must use the IDENTICAL baked kernels)
    val batchEnc = graft.llm.Similarity.extendVectorIndex(
      graft.llm.Similarity.VectorIndex(idx.centroids, idx.codebooks,
        idx.vectors.limit(0)), batchSlice).vectors
    assert(streamed.exceptAll(batchEnc).isEmpty &&
      batchEnc.exceptAll(streamed).isEmpty,
      "stream encode diverged from the batch extend")
  }

  test("decontaminateStream keeps null-text rows (batch-parity)") {
    val leak = (1 to 13).map(i => s"n$i").mkString(" ")
    val bench = Seq(s"head $leak tail").toDF("text")
    val docs = Seq((1L, Some("totally clean words")),
      (2L, Some(s"bad $leak doc")), (3L, None))
      .toDF("doc_id", "text")
    // the filter is a pure column predicate - same semantics on batch
    val kept = Streaming.decontaminateStream(docs, bench, "text", n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // null text kept, like batch decontaminate
    val batch = graft.llm.Dedup.decontaminate(docs, bench
        .withColumn("doc_id", lit(9L)), "doc_id", "text", n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(batch == kept)
  }

  test("decontaminateStream refuses an oversized benchmark window set, loudly") {
    // a "benchmark" with many distinct 13-gram windows vs a tiny cap:
    // the guard must throw with batch-path guidance, not bake the set
    val big = (0 until 6).map(i =>
      Tuple1((0 until 30).map(j => s"b${i}_$j").mkString(" "))).toDF("text")
    val docs = Seq((1L, "some arriving text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Streaming.decontaminateStream(docs, big, "text", n = 13,
        maxWindowHashes = 5L)
    }
    assert(e.getMessage.contains("Dedup.decontaminate"),
      s"overflow message must point at the batch path, got: ${e.getMessage}")
    // in-bounds behavior unchanged (default cap): same verdicts as before
    val leak = (1 to 13).map(i => s"v$i").mkString(" ")
    val bench = Seq(s"head $leak tail").toDF("text")
    val mixed = Seq((1L, "clean words"), (2L, s"bad $leak doc"))
      .toDF("doc_id", "text")
    val kept = Streaming.decontaminateStream(mixed, bench, "text", n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("enrichAsOf: stream-static as-of enrichment equals the batch asofJoin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-asof").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$dir/events"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events/part-0.parquet"))
    val static = Tables.load(spark, sf0, "events")
      .filter(col("event_type") === "click")
    val stream = Streaming.enrichAsOf(
      Streaming.readEvents(spark, s"$dir/events")
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts"),
      static, Seq("user_id"), "ts", "ts",
      Map("event_id" -> "click_id", "value" -> "click_value"))
    val got = Streaming.runAvailableNow(stream, "st_asof", s"$dir/ckpt",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val want = graft.operators.TemporalJoins.asofJoin(
      Tables.load(spark, sf0, "events")
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts"),
      static, Seq("user_id"), "ts", "ts",
      Map("event_id" -> "click_id", "value" -> "click_value"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming hourly window equals the batch plan (availableNow)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-st").toString
    // the file stream source needs a directory; stage the single-file table
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$dir/events"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events/part-0.parquet"))
    val stream = Streaming.hourlyCounts(
      Streaming.readEvents(spark, s"$dir/events"))
    val got = Streaming.runAvailableNow(stream, "st_test", s"$dir/ckpt")
      .select("window_start", "event_type", "n", "total_value")
    val want = SparkEntry.queries("st_hourly_window")(spark, sf0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming MG sketch (complete mode) equals the batch sketch") {
    // the bounded TypedImperativeAggregate runs as a streaming
    // aggregation: sketch state lives in the state store and the
    // complete-mode output over the drained backlog must equal the
    // one-shot batch sketch bit-for-bit
    val dir = java.nio.file.Files.createTempDirectory("graft-sk").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$dir/docs"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/docs/part-0.parquet"))
    val schema = Tables.load(spark, sf0, "documents").schema
    val stream = graft.llm.Corpus.heavyHittersSketch(
      spark.readStream.schema(schema).parquet(s"$dir/docs"),
      "text", capacity = 512)
    val got = Streaming.runAvailableNow(stream, "sk_stream_test",
      s"$dir/ckpt")
    val want = graft.llm.Corpus.heavyHittersSketch(
      Tables.load(spark, sf0, "documents"), "text", capacity = 512)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming HLL distinct sketch (complete mode) matches the batch estimates") {
    // the native hll_sketch_agg runs as a streaming aggregation; the
    // drained per-slice ESTIMATES (not the binaries — HLL serialization
    // is insertion-order-sensitive, cardinality is the contract) must
    // equal the batch build's
    import org.apache.spark.sql.functions.{col, hll_sketch_estimate}
    val dir = java.nio.file.Files.createTempDirectory("graft-hll").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$dir/docs"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/docs/part-0.parquet"))
    val schema = Tables.load(spark, sf0, "documents").schema
    def estimates(df: org.apache.spark.sql.DataFrame) =
      df.select(col("slice"),
        hll_sketch_estimate(col("sketch")).as("d"), col("n_tokens"))
    val stream = graft.llm.Corpus.distinctSketch(
      spark.readStream.schema(schema).parquet(s"$dir/docs"),
      "text", col("doc_id") % 3)
    val got = estimates(Streaming.runAvailableNow(stream,
      "hll_stream_test", s"$dir/ckpt"))
    val want = estimates(graft.llm.Corpus.distinctSketch(
      Tables.load(spark, sf0, "documents"), "text", col("doc_id") % 3))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming Bloom membership sketch (complete mode) equals the batch build") {
    // bit-setting is insertion-order-independent, so the streamed
    // per-slice filters AND their relational union must equal the batch
    // build bit-for-bit
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$dir/docs"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/docs/part-0.parquet"))
    val schema = Tables.load(spark, sf0, "documents").schema
    val stream = graft.llm.Dedup.membershipSketch(
      spark.readStream.schema(schema).parquet(s"$dir/docs"),
      "text", col("doc_id") % 3, expectedKeysPerSlice = 10000L)
    val got = Streaming.runAvailableNow(stream, "bloom_stream_test",
      s"$dir/ckpt")
    val want = graft.llm.Dedup.membershipSketch(
      Tables.load(spark, sf0, "documents"), "text", col("doc_id") % 3,
      expectedKeysPerSlice = 10000L)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val gotMerged = graft.llm.Dedup.mergeMembershipSketches(got).head()
    val wantMerged = graft.llm.Dedup.mergeMembershipSketches(want).head()
    assert(java.util.Arrays.equals(gotMerged.getAs[Array[Byte]]("sketch"),
      wantMerged.getAs[Array[Byte]]("sketch")))
  }

  test("streaming KLL quantile sketch (complete mode) matches the batch quantiles") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-kll").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$dir/docs"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0/documents.parquet"),
      java.nio.file.Paths.get(s"$dir/docs/part-0.parquet"))
    val schema = Tables.load(spark, sf0, "documents").schema
    val stream = graft.llm.Corpus.quantileSketch(
      spark.readStream.schema(schema).parquet(s"$dir/docs"),
      "n_chars", col("doc_id") % 3, k = 1024)
    val drained = Streaming.runAvailableNow(stream,
      "kll_stream_test", s"$dir/ckpt")
    val got = graft.llm.Corpus.mergeQuantileSketches(drained, k = 1024)
    val want = graft.llm.Corpus.mergeQuantileSketches(
      graft.llm.Corpus.quantileSketch(
        Tables.load(spark, sf0, "documents"), "n_chars",
        col("doc_id") % 3, k = 1024), k = 1024)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("session_window agrees with the batch sessionization kernel") {
    val ev = Tables.load(spark, sf0, "events")
    // batch session_window (same logical op the streaming variant runs)
    val viaWindow = Streaming.sessionCounts(ev)
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val viaKernel = graft.operators.Sessionize
      .sessions(ev, "user_id", "ts", gapSeconds = 1800, "value",
        tieBreak = Seq("event_id"))
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(viaWindow == viaKernel)
  }

  test("session_window STREAMED in append mode emits exactly the " +
      "watermark-closed sessions, engine state-store merged") {
    def tstamp(s: String) = java.sql.Timestamp.valueOf(s)
    val slices = Seq(
      // sessions A (u1 ×2) and C (u2) open in slice 0
      Seq((1L, tstamp("2024-01-01 10:00:00"), 1.0, 1L),
        (1L, tstamp("2024-01-01 10:10:00"), 2.0, 2L),
        (2L, tstamp("2024-01-01 10:05:00"), 3.0, 3L)),
      // u1's session B — and a watermark push to 12:00 that closes A+C
      Seq((1L, tstamp("2024-01-01 13:00:00"), 4.0, 4L)),
      // u3's clock-pushing arrival: watermark 17:00 closes B; u3's own
      // session stays open (end+gap 18:30 > watermark)
      Seq((3L, tstamp("2024-01-01 18:00:00"), 5.0, 5L)))
      .map(_.toDF("user_id", "ts", "value", "event_id"))
    val src = arrivalDir(slices)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sw-ck").toString
    val emitted = Streaming.runAvailableNow(
      Streaming.sessionCounts(
        arrivalStream(src, slices.head.schema),
        gap = "30 minutes", watermark = "1 hour"),
      "sw_append_test", ckpt,
      outputMode = org.apache.spark.sql.streaming.OutputMode.Append())
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet
    // A (u1 ×2, 3.0) and C (u2 ×1, 3.0) close under the 12:00 watermark;
    // B (u1 ×1, 4.0) under 17:00; u3's open session is NOT emitted
    assert(emitted == Set((1L, 2L, 3.0), (2L, 1L, 3.0), (1L, 1L, 4.0)),
      emitted.toString)
  }

  test("stateful per-user totals match a batch aggregate") {
    val ev = Tables.load(spark, sf0, "events")
    val out = Streaming.statefulUserTotals(ev)
      .select("user_id", "events").as[(Long, Long)].collect().toMap
    val want = ev.groupBy("user_id").agg(count(lit(1)))
      .as[(Long, Long)].collect().toMap
    assert(out == want)
  }

  test("ledger-based incremental processing skips completed work (I1/I4)") {
    import graft.pipelines.Ledger
    val dir = java.nio.file.Files.createTempDirectory("graft-ledger").toString
    val path = s"$dir/ledger.parquet"
    val candidates = Seq("k1", "k2", "k3").toDF("key")
    // first run: everything pending; complete k1, k2
    val p1 = Ledger.pending(candidates, Ledger.read(spark, path), "ds", "crawl")
    assert(p1.count() == 3)
    Ledger.append(Seq("k1", "k2").toDF("key"), path, "ds", "crawl")
    // second run: only k3 pending
    val p2 = Ledger.pending(candidates, Ledger.read(spark, path), "ds", "crawl")
    assert(p2.select("key").as[String].collect().toSeq == Seq("k3"))
    // CACHE=0 mode: ledger ignored on read
    val p3 = Ledger.pending(candidates, Ledger.read(spark, path), "ds", "crawl",
      respectCache = false)
    assert(p3.count() == 3)
    // a different action's ledger does not mask this action
    val p4 = Ledger.pending(candidates, Ledger.read(spark, path), "ds", "make")
    assert(p4.count() == 3)
  }

  test("foldLedgerStream: the streamed funnel ledger equals the one-shot " +
      "state; versions are batch-id-keyed; order violations raise") {
    import graft.operators.Funnel
    def tstamp(s: String) = java.sql.Timestamp.valueOf(s)
    val K = Seq("A", "B")
    val all = Seq(
      (1L, "A", tstamp("2024-01-01 10:00:00")), // enters in slice 0
      (1L, "B", tstamp("2024-01-02 06:00:00")), // converts in slice 1
      (2L, "A", tstamp("2024-01-03 01:00:00")), // enters in slice 2
      (3L, "B", tstamp("2024-01-01 05:00:00"))  // stage-0 row from slice 0
    ).toDF("user_id", "etype", "ts")
    val slices = Seq(
      all.filter($"ts" < lit(tstamp("2024-01-02 00:00:00"))),
      all.filter($"ts" >= lit(tstamp("2024-01-02 00:00:00")) &&
        $"ts" < lit(tstamp("2024-01-03 00:00:00"))),
      all.filter($"ts" >= lit(tstamp("2024-01-03 00:00:00"))))
    val src = arrivalDir(slices)
    val stream = arrivalStream(src, all.schema)
    val work = java.nio.file.Files.createTempDirectory("graft-fls").toString
    // bootstrap from EMPTY state (day-0): slice the schema off a
    // zero-row funnelState
    val state0 = Funnel.funnelState(all.limit(0), "user_id", "etype",
      "ts", K)
    val led = Streaming.foldLedgerStream(stream, state0, work,
      (st, b) => Streaming.StreamLedger(None,
        Funnel.funnelIncremental(st, b, "user_id", "etype", "ts", K)))
    assert(led.emitted.isEmpty)
    // streamed fold ≡ one-shot state over everything
    val want = Funnel.funnelState(all, "user_id", "etype", "ts", K)
    assert(led.state.exceptAll(want).isEmpty &&
      want.exceptAll(led.state).isEmpty,
      s"streamed ledger diverged: ${led.state.collect().toSeq}")
    // versions are keyed by the micro-batch id that WROTE them
    // (idempotent replays), and RETENTION prunes below {i−1, i, i+1}:
    // after batches 0..2 the surviving versions are 1..3 — the
    // bootstrap is dead weight once batch 1 commits
    val versions = new java.io.File(s"$work/state").listFiles()
      .filter(_.isDirectory).map(_.getName.toInt).sorted.toSeq
    assert(versions == Seq(1, 2, 3), versions.toString)
    // a NEW out-of-order arrival (older than u1's watermark) raises
    // through the stream instead of mis-staging
    val stale = Seq((1L, "B", tstamp("2024-01-01 11:00:00")))
      .toDF("user_id", "etype", "ts")
    appendArrival(src, stale, 900)
    val err = intercept[Exception] {
      Streaming.foldLedgerStream(
        arrivalStream(src, all.schema), led.state, s"$work-2",
        (st, b) => Streaming.StreamLedger(None,
          Funnel.funnelIncremental(st, b, "user_id", "etype", "ts", K)))
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.reverse
        .flatMap(c => Option(c.getMessage)) :+ "").mkString(" | ")
    assert(rootMsg(err).contains("append-only contract"), rootMsg(err))
  }

  test("foldLedgerStream replays are idempotent: re-running a batch id " +
      "rewrites byte-identical outputs and the serve is unchanged") {
    import graft.operators.Sessionize
    def tstamp(s: String) = java.sql.Timestamp.valueOf(s)
    val all = Seq(
      (1L, tstamp("2024-01-01 10:00:00"), 1.0, 1L),
      (1L, tstamp("2024-01-02 09:00:00"), 2.0, 2L),
      (2L, tstamp("2024-01-02 10:00:00"), 3.0, 3L),
      (1L, tstamp("2024-01-03 08:00:00"), 4.0, 4L))
      .toDF("user_id", "ts", "value", "event_id")
    val cut = lit(tstamp("2024-01-03 00:00:00"))
    val slices = Seq(all.filter($"ts" < cut), all.filter($"ts" >= cut))
    val src = arrivalDir(slices)
    val boot = Sessionize.sessionsBootstrap(all.limit(0), "user_id", "ts",
      gapSeconds = 1800, "value", tieBreak = Seq("event_id"))
    def step(st: org.apache.spark.sql.DataFrame,
             b: org.apache.spark.sql.DataFrame) = {
      val l = Sessionize.sessionsIncremental(st, b, "user_id", "ts",
        gapSeconds = 1800, "value", tieBreak = Seq("event_id"))
      Streaming.StreamLedger(Some(l.closed), l.state)
    }
    val work = java.nio.file.Files.createTempDirectory("graft-rep").toString
    val led = Streaming.foldLedgerStream(
      arrivalStream(src, all.schema), boot.state, work, step)
    def snap(dir: String) = spark.read.parquet(dir).collect()
      .map(_.toString).sorted.toSeq
    val state1 = snap(s"$work/state/1")
    val em0 = snap(s"$work/emitted/0")
    val serveBefore = boot.closed.unionByName(led.emitted.get)
      .unionByName(Sessionize.finalizeSessionState(led.state, "user_id"))
      .collect().map(_.toString).sorted.toSeq
    // REPLAY batch 0 by hand — exactly what a crashed-and-recovered
    // foreachBatch does: same input version, overwrite its own outputs
    val replay = step(spark.read.parquet(s"$work/state/0"),
      spark.read.parquet(s"$src/arrival-000.parquet"))
    replay.emitted.get.write.mode("overwrite").parquet(s"$work/emitted/0")
    replay.state.write.mode("overwrite").parquet(s"$work/state/1")
    assert(snap(s"$work/state/1") == state1, "replayed state/1 diverged")
    assert(snap(s"$work/emitted/0") == em0, "replayed emitted/0 diverged")
    val serveAfter = boot.closed
      .unionByName(spark.read.parquet(s"$work/emitted/0")
        .unionByName(spark.read.parquet(s"$work/emitted/1")))
      .unionByName(Sessionize.finalizeSessionState(
        spark.read.parquet(s"$work/state/2"), "user_id"))
      .collect().map(_.toString).sorted.toSeq
    assert(serveAfter == serveBefore, "serve changed after replay")
    // RESUME against the same workDir with no new arrivals: the
    // checkpoint replays nothing, the bootstrap write is skipped, and
    // the returned ledger is recovered from DISK — full emitted
    // history and the FOLDED state, never the day-0 bootstrap
    val resumed = Streaming.foldLedgerStream(
      arrivalStream(src, all.schema), boot.state, work, step)
    assert(resumed.state.collect().map(_.toString).sorted.toSeq ==
      snap(s"$work/state/2"), "resume did not return the folded state")
    assert(resumed.emitted.isDefined &&
      resumed.emitted.get.collect().map(_.toString).sorted.toSeq ==
        (snap(s"$work/emitted/0") ++ snap(s"$work/emitted/1")).sorted,
      "resume did not recover the full emitted history")
  }

  test("foldLedgerStream retention + compactLedger: old state versions " +
      "prune in-stream, post-drain compaction coalesces the emitted " +
      "feed, and a resume after both serves the full history") {
    import graft.operators.Sessionize
    def tstamp(s: String) = java.sql.Timestamp.valueOf(s)
    // 5 one-event days for one user, >30 min apart → every batch closes
    // the previous session (a nonempty emitted dir per batch)
    def day(d: Int) = Seq((1L, tstamp(f"2024-01-0${d}%d 10:00:00"),
      d.toDouble, d.toLong)).toDF("user_id", "ts", "value", "event_id")
    val first4 = (1 to 4).map(day)
    val all5 = (1 to 5).map(day).reduce(_ unionByName _)
    val src = arrivalDir(first4)
    val boot = Sessionize.sessionsBootstrap(all5.limit(0), "user_id",
      "ts", gapSeconds = 1800, "value", tieBreak = Seq("event_id"))
    def step(st: org.apache.spark.sql.DataFrame,
             b: org.apache.spark.sql.DataFrame) = {
      val l = Sessionize.sessionsIncremental(st, b, "user_id", "ts",
        gapSeconds = 1800, "value", tieBreak = Seq("event_id"))
      Streaming.StreamLedger(Some(l.closed), l.state)
    }
    val work = java.nio.file.Files.createTempDirectory("graft-prune")
      .toString
    Streaming.foldLedgerStream(arrivalStream(src, day(1).schema),
      boot.state, work, step)
    def versions(sub: String) = new java.io.File(s"$work/$sub")
      .listFiles().filter(_.isDirectory).map(_.getName.toLong).sorted.toSeq
    // 4 batches (ids 0–3): retention keeps {id−1, id, id+1} = {2, 3, 4}
    assert(versions("state") == Seq(2L, 3L, 4L),
      s"stale state versions survived: ${versions("state")}")
    assert(versions("emitted") == Seq(0L, 1L, 2L, 3L),
      s"emitted dirs before compaction: ${versions("emitted")}")
    // post-drain compaction: one emitted dir, one state version, and
    // the feed's ROWS are untouched
    val feedBefore = spark.read.parquet(s"$work/emitted/0",
        s"$work/emitted/1", s"$work/emitted/2", s"$work/emitted/3")
      .collect().map(_.toString).sorted.toSeq
    Streaming.compactLedger(spark, work)
    assert(versions("state") == Seq(4L), versions("state").toString)
    assert(versions("emitted") == Seq(0L), versions("emitted").toString)
    assert(spark.read.parquet(s"$work/emitted/0").collect()
      .map(_.toString).sorted.toSeq == feedBefore,
      "compaction changed the emitted rows")
    // resume with day 5: the new batch id continues above the old ones,
    // lands beside the compacted feed, and the served union still
    // equals the full-history recompute
    appendArrival(new java.io.File(src.toString), day(5), 4)
    val led = Streaming.foldLedgerStream(arrivalStream(src, day(1).schema),
      boot.state, work, step)
    val served = boot.closed.unionByName(led.emitted.get)
      .unionByName(Sessionize.finalizeSessionState(led.state, "user_id"))
    val full = Sessionize.sessions(all5, "user_id", "ts",
      gapSeconds = 1800, "value", tieBreak = Seq("event_id"))
    assert(served.exceptAll(full).isEmpty && full.exceptAll(served).isEmpty,
      "post-compaction resume diverged from the full recompute")
  }

  test("foldLedgerStream: the streamed session-rollup ledger emits " +
      "closed sessions append-only and equals the full recompute") {
    import graft.operators.Sessionize
    def tstamp(s: String) = java.sql.Timestamp.valueOf(s)
    val all = Seq(
      // u1: session 1 (2 events) closed by session 2 arriving in slice 1
      (1L, tstamp("2024-01-01 10:00:00"), 1.0, 1L),
      (1L, tstamp("2024-01-01 10:10:00"), 2.0, 2L),
      (1L, tstamp("2024-01-02 09:00:00"), 4.0, 3L),
      // u2: one long session spanning the slice boundary (merged partial)
      (2L, tstamp("2024-01-01 23:50:00"), 1.5, 4L),
      (2L, tstamp("2024-01-02 00:10:00"), 2.5, 5L),
      // u3: appears only in slice 2
      (3L, tstamp("2024-01-03 08:00:00"), 7.0, 6L)
    ).toDF("user_id", "ts", "value", "event_id")
    val cut1 = lit(tstamp("2024-01-02 00:00:00"))
    val cut2 = lit(tstamp("2024-01-03 00:00:00"))
    val slices = Seq(all.filter($"ts" < cut1),
      all.filter($"ts" >= cut1 && $"ts" < cut2),
      all.filter($"ts" >= cut2))
    val src = arrivalDir(slices)
    val boot = Sessionize.sessionsBootstrap(all.limit(0), "user_id", "ts",
      gapSeconds = 1800, "value", tieBreak = Seq("event_id"))
    val work = java.nio.file.Files.createTempDirectory("graft-sls").toString
    val led = Streaming.foldLedgerStream(
      arrivalStream(src, all.schema), boot.state, work,
      (st, b) => {
        val l = Sessionize.sessionsIncremental(st, b, "user_id", "ts",
          gapSeconds = 1800, "value", tieBreak = Seq("event_id"))
        Streaming.StreamLedger(Some(l.closed), l.state)
      })
    val got = boot.closed
      .unionByName(led.emitted.get)
      .unionByName(Sessionize.finalizeSessionState(led.state, "user_id"))
    val want = Sessionize.sessions(all, "user_id", "ts",
      gapSeconds = 1800, "value", tieBreak = Seq("event_id"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"streamed rollup diverged:\n got ${got.collect().toSeq}\n" +
        s"want ${want.collect().toSeq}")
    // u1's first session closed DURING the stream (emitted), u2's
    // boundary-spanning session merged across slices and still open at
    // finalize together with u3's
    assert(led.emitted.get.filter($"user_id" === 1L).count() == 1)
    assert(led.emitted.get.filter($"user_id" === 2L).count() == 0)
  }
}
