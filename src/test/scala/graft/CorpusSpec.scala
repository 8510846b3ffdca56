package graft

import org.apache.spark.sql.functions._

import graft.llm.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("splitThresholds: cumulative 8-hex cut points, sum-to-1 enforced") {
    val t = Corpus.splitThresholds(
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    assert(t.map(_._1) == Seq("train", "val", "test"))
    assert(t(0)._2 == "e6666666" && t(1)._2 == "f3333332")
    assert(t(2)._2 == "ffffffff")
    assert(t.forall(_._2.matches("[0-9a-f]{8}")))
    intercept[IllegalArgumentException] {
      Corpus.splitThresholds(Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("splitAssign: exhaustive, deterministic, fraction-accurate") {
    val df = spark.range(0, 10000).toDF("id")
    val split = Corpus.splitAssign(col("id"),
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val counts = df.select(split.as("s")).groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000L)
    // md5 is uniform: 9000/500/500 expected, allow ±5 sigma-ish slack
    assert(math.abs(counts("train") - 9000L) < 150,
      s"train=${counts("train")}")
    assert(math.abs(counts("val") - 500L) < 110 &&
      math.abs(counts("test") - 500L) < 110)
    // same key → same split regardless of partitioning
    val again = df.repartition(13).select(col("id"), split.as("s"))
    val first = df.select(col("id"), split.as("s"))
    assert(first.except(again).count() == 0 && again.except(first).count() == 0)
  }

  test("packSequences: contiguous per-shard layout, window math exact") {
    val docs = spark.range(0, 200)
      .select(col("id").as("doc_id"), (col("id") % 7 * 50).as("n_chars"))
    val packed = Corpus.packSequences(docs, "doc_id", "n_chars", budget = 256L)
    val rows = packed.collect()
    assert(rows.length == 200)
    // per shard: sorted by start, documents tile the concatenation exactly
    val byShard = rows.groupBy(_.getAs[String]("shard"))
    assert(byShard.keys.forall(_.matches("[0-9a-f]")))
    val lens = docs.as[(Long, Long)].collect().toMap
    for ((_, rs) <- byShard) {
      val sorted = rs.sortBy(_.getAs[Long]("start"))
      sorted.foldLeft(0L) { (expected, r) =>
        assert(r.getAs[Long]("start") == expected)
        expected + lens(r.getAs[Long]("id"))
      }
    }
    // offset/seq arithmetic
    for (r <- rows) {
      val start = r.getAs[Long]("start")
      val len = lens(r.getAs[Long]("id"))
      assert(r.getAs[Long]("offset") == start % 256)
      assert(r.getAs[Long]("seq_first") == start / 256)
      val expLast = if (len == 0) start / 256 else (start + len - 1) / 256
      assert(r.getAs[Long]("seq_last") == expLast)
      assert(r.getAs[Long]("seq_last") >= r.getAs[Long]("seq_first"))
    }
    // long docs span windows; zero-length docs occupy none
    assert(rows.exists(r =>
      r.getAs[Long]("seq_last") > r.getAs[Long]("seq_first")))
    assert(rows.filter(r => lens(r.getAs[Long]("id")) == 0L)
      .forall(r => r.getAs[Long]("seq_last") == r.getAs[Long]("seq_first")))
  }

  test("packSequences: deterministic under repartitioning") {
    val docs = spark.range(0, 500)
      .select(col("id").as("doc_id"), (col("id") % 11 * 30 + 5).as("n_chars"))
    val a = Corpus.packSequences(docs, "doc_id", "n_chars", 512L)
    val b = Corpus.packSequences(docs.repartition(17), "doc_id", "n_chars", 512L)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("vocabulary: frequency order with token tie-break, normalized") {
    val df = Seq("The cat sat", "a CAT! sat.", "dog").toDF("text")
    val v = Corpus.vocabulary(df, "text", topN = 3)
      .as[(String, Long)].collect().toSeq
    // cat=2 sat=2, then 1-freq tokens alphabetical: a, dog, the
    assert(v == Seq(("cat", 2L), ("sat", 2L), ("a", 1L)))
    val all = Corpus.vocabulary(df, "text", topN = 100)
      .as[(String, Long)].collect().toSeq
    assert(all == Seq(("cat", 2L), ("sat", 2L), ("a", 1L),
      ("dog", 1L), ("the", 1L)))
  }

  test("vocabulary: blank and empty docs contribute nothing") {
    val df = Seq("", "   ", "!!!", "x").toDF("text")
    val v = Corpus.vocabulary(df, "text", 10).as[(String, Long)].collect()
    assert(v.toSeq == Seq(("x", 1L)))
  }

  test("vocabGrowthCurve: cumulative docs/tokens/types at id " +
      "checkpoints; boundary inclusive; null ids excluded; loud order") {
    import graft.llm.Corpus
    val docs = Seq(
      (Some(1L), "alpha beta"),        // 2 tokens, 2 new types
      (Some(5L), "alpha gamma gamma"), // 3 tokens, 1 new type
      (Some(10L), "delta"),            // at the checkpoint boundary
      (Some(20L), "beta epsilon"),     // past checkpoint 10
      (None, "zeta zeta")              // null id: excluded entirely
    ).toDF("doc_id", "text")
    val out = Corpus.vocabGrowthCurve(docs, "doc_id", "text",
        checkpoints = Seq(5L, 10L, 100L))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // (checkpoint, n_docs, n_tokens, vocab)
    assert(out(0) == ((5L, 2L, 5L, 3L)), out(0).toString)
    assert(out(1) == ((10L, 3L, 6L, 4L)), out(1).toString) // boundary in
    assert(out(2) == ((100L, 4L, 8L, 5L)), out(2).toString) // zeta absent
    // monotone by construction
    assert(out.map(_._4).sameElements(out.map(_._4).sorted))
    intercept[IllegalArgumentException] {
      Corpus.vocabGrowthCurve(docs, "doc_id", "text", Seq(10L, 5L))
    }
    intercept[IllegalArgumentException] {
      Corpus.vocabGrowthCurve(docs, "doc_id", "text", Seq.empty)
    }
    // ids PAST the last checkpoint contribute nothing anywhere — the
    // curve describes exactly the checkpointed prefix (append-only
    // contract: later arrivals never change recorded points)
    val clipped = Corpus.vocabGrowthCurve(docs, "doc_id", "text",
        checkpoints = Seq(5L, 10L))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(clipped(0) == ((5L, 2L, 5L, 3L)) &&
      clipped(1) == ((10L, 3L, 6L, 4L)), clipped.mkString(","))
  }

  test("vocabCoverage: cumulative mass at each budget, ties by token order") {
    // freqs: a=3, b=2, c=1 (total 6); tie-free cuts
    val df = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Corpus.vocabCoverage(df, "text", ks = Seq(1, 2, 5))
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, 3L, 6L, 0.5),
      (2, 5L, 6L, 0.833333),
      (5, 6L, 6L, 1.0)))
    // tie at the cut: a=2, b=2 → k=1 takes 'a' (freq desc, token asc)
    val tie = Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val t1 = Corpus.vocabCoverage(tie, "text", ks = Seq(1))
      .as[(Int, Long, Long, Double)].head()
    assert(t1 == ((1, 2L, 4L, 0.5)))
    // empty corpus: budgets still reported, coverage 0
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val e = Corpus.vocabCoverage(empty, "text", ks = Seq(3))
      .as[(Int, Long, Long, Double)].head()
    assert(e == ((3, 0L, 0L, 0.0)))
    // loud contract failures
    intercept[IllegalArgumentException] {
      Corpus.vocabCoverage(df, "text", ks = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Corpus.vocabCoverage(df, "text", ks = Seq(10), maxK = 5)
    }
  }

  test("distinctSketch/merge: cross-slice dedup, slicing-invariant, exact in set mode") {
    // token 'a' lives in BOTH slices: per-slice distincts are 2 and 2,
    // but the merged count must dedup across sketches → 3
    val df = Seq((0L, "a b a"), (1L, "a c")).toDF("doc_id", "text")
    val sk = Corpus.distinctSketch(df, "text", col("doc_id") % 2)
    val per = sk.select(col("slice"),
        hll_sketch_estimate(col("sketch")).as("d"), col("n_tokens"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(per.toSeq == Seq((0L, 2L, 3L), (1L, 2L, 2L)))
    val merged = Corpus.mergeDistinctSketches(sk)
      .as[(Long, Long)].head()
    assert(merged == ((3L, 5L)))
    // slicing-invariance: a different slice key yields the same total
    val other = Corpus.mergeDistinctSketches(
      Corpus.distinctSketch(df, "text", col("doc_id") % 5))
      .as[(Long, Long)].head()
    assert(other == merged)
    // set-mode exactness at four-digit cardinality (far below the
    // lgK-14 promotion point): 1200 unique tokens count exactly
    val wide = spark.range(0, 1200)
      .select(col("id").as("doc_id"), concat(lit("tok"), col("id")).as("text"))
    val wideCount = Corpus.mergeDistinctSketches(
      Corpus.distinctSketch(wide, "text", col("doc_id") % 4))
      .as[(Long, Long)].head()
    assert(wideCount == ((1200L, 1200L)))
    intercept[IllegalArgumentException] {
      Corpus.distinctSketch(df, "text", col("doc_id"), lgK = 3)
    }
  }

  test("quantileSketch/merge: exact in-regime, slicing-invariant, sane beyond") {
    // 1..10 over two slices: INCLUSIVE quantiles are hand-checkable
    val df = spark.range(1, 11)
      .select(col("id").as("doc_id"), col("id").cast("double").as("len"))
    val sk = Corpus.quantileSketch(df, "len", col("doc_id") % 2)
    assert(sk.count() == 2)
    val got = Corpus.mergeQuantileSketches(sk,
      qs = Seq(0.25, 0.5, 0.9, 1.0))
      .as[(Double, Double, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0.25, 3.0, 10L), (0.5, 5.0, 10L), (0.9, 9.0, 10L), (1.0, 10.0, 10L)))
    // a different slicing merges to the same quantiles
    val other = Corpus.mergeQuantileSketches(
      Corpus.quantileSketch(df, "len", col("doc_id") % 5),
      qs = Seq(0.25, 0.5, 0.9, 1.0))
      .as[(Double, Double, Long)].collect().sortBy(_._1)
    assert(other.toSeq == got.toSeq)
    // exact regime at four-digit n (n ≤ k → no compaction): the median
    // of 1..1000 is exactly 500
    val wide = spark.range(1, 1001)
      .select(col("id").as("doc_id"), col("id").cast("double").as("len"))
    val med = Corpus.mergeQuantileSketches(
      Corpus.quantileSketch(wide, "len", col("doc_id") % 7, k = 1024),
      qs = Seq(0.5), k = 1024).as[(Double, Double, Long)].head()
    assert(med == ((0.5, 500.0, 1000L)))
    // approximation regime (n ≫ k): rank error bounded (~1.65/√k)
    val big = spark.range(1, 50001)
      .select(col("id").as("doc_id"), col("id").cast("double").as("len"))
    val approx = Corpus.mergeQuantileSketches(
      Corpus.quantileSketch(big, "len", col("doc_id") % 4, k = 128),
      qs = Seq(0.5), k = 128).as[(Double, Double, Long)].head()
    assert(math.abs(approx._2 / 50000.0 - 0.5) < 0.2,
      s"approx median ${approx._2} too far from 25000")
    // an all-empty merge has no quantiles
    val empty = df.filter(col("len").isNull)
    assert(Corpus.mergeQuantileSketches(
      Corpus.quantileSketch(empty, "len", col("doc_id") % 2)).isEmpty)
    intercept[IllegalArgumentException] {
      Corpus.mergeQuantileSketches(sk, qs = Seq(1.5))
    }
  }

  test("replicateByWeight: expected multiplicity per stratum, deterministic") {
    val df = spark.range(0, 4000)
      .select(col("id").as("doc_id"),
        concat(lit("s"), (col("id") % 3).cast("string")).as("source"),
        concat(lit("text-"), col("id").cast("string")).as("text"))
    val out = graft.llm.Corpus.replicateByWeight(df, col("source"),
      col("text"), Map("s0" -> 2.5, "s1" -> 0.25), defaultWeight = 1.0)
    val counts = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // ~1334 docs per stratum; expected 2.5x, 0.25x, 1.0x
    assert(math.abs(counts("s0") - 2.5 * 1334) < 180, s"s0=${counts("s0")}")
    assert(math.abs(counts("s1") - 0.25 * 1333) < 120, s"s1=${counts("s1")}")
    assert(counts("s2") == 1333)
    // copy index disambiguates replicas: (doc_id, copy) unique
    assert(out.select("doc_id", "copy").distinct().count() == out.count())
    // integer weight -> exactly floor(w) copies for every row
    val whole = graft.llm.Corpus.replicateByWeight(df, col("source"),
      col("text"), Map("s0" -> 3.0), defaultWeight = 0.0)
    assert(whole.count() == 3 * 1334)
    assert(whole.select("source").distinct().as[String].collect().toSeq
      == Seq("s0"))
    // deterministic under repartitioning
    val again = graft.llm.Corpus.replicateByWeight(df.repartition(11),
      col("source"), col("text"), Map("s0" -> 2.5, "s1" -> 0.25), 1.0)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("lengthQuantiles: percentile_disc semantics, integer thresholds") {
    // 10 rows of lengths 1..10: p50 -> 5th value = 5, p90 -> 9, p25 -> ceil(2.5)=3
    val df = spark.range(1, 11).select(col("id").as("len"))
    val q = graft.llm.Corpus.lengthQuantiles(df, "len")
      .as[(String, Long)].collect().toMap
    assert(q == Map("p10" -> 1L, "p25" -> 3L, "p50" -> 5L,
      "p75" -> 8L, "p90" -> 9L))
    // duplicated values: quantile picks the smallest value reaching the rank
    val dup = Seq(1L, 1L, 1L, 9L).toDF("len")
    val q2 = graft.llm.Corpus.lengthQuantiles(dup, "len",
      Seq(("p50", 1, 2), ("p75", 3, 4), ("p100", 1, 1)))
      .as[(String, Long)].collect().toMap
    assert(q2 == Map("p50" -> 1L, "p75" -> 1L, "p100" -> 9L))
  }

  test("lengthQuantiles ignores NULL lengths (percentile_disc semantics)") {
    val df = (Seq.fill(40)(None: Option[Long]) ++
      (1L to 60L).map(Some(_))).toDF("len")
    val q = graft.llm.Corpus.lengthQuantiles(df, "len",
      Seq(("p50", 1, 2), ("p100", 1, 1)))
      .as[(String, Long)].collect().toMap
    // ranks over the 60 non-null rows only: p50 -> 30, p100 -> 60
    assert(q == Map("p50" -> 30L, "p100" -> 60L))
  }

  test("buildTrainingSet accepts idCol named \"id\"") {
    val docs = (0 until 20).map(i =>
      (i.toLong, (0 until 15).map(j => s"w${i}v$j").mkString(" "), "web"))
      .toDF("id", "text", "source")
    val bench = Seq("nothing shared here").toDF("text")
    val (packed, stats) = graft.llm.Corpus.buildTrainingSet(
      docs, bench, "id", "text", "source", budget = 64L)
    assert(stats("clean") == 20 && packed.count() == 20)
    assert(packed.columns.contains("id"))
  }

  test("buildTrainingSet gopher flag gates documents through the MassiveText rules") {
    // doc 1 clears every §A1.1 rule (68 distinct words incl. required
    // stop words, sane lengths, no symbols/bullets); doc 2 fails the
    // 50-word floor. Both clear the default score/repetition gates, so
    // the delta is attributable to the gopher gate alone.
    val good = ((1 to 60).map(i => s"word$i") ++
      Seq("the", "of", "and", "that", "have", "with", "be", "to"))
      .mkString(" ")
    val docs = Seq((1L, good, "web"),
      (2L, "way too short for the gopher floor", "web"))
      .toDF("doc_id", "text", "source")
    val bench = Seq("nothing shared here").toDF("text")
    val (offP, offS) = Corpus.buildTrainingSet(
      docs, bench, "doc_id", "text", "source", budget = 512L)
    val (onP, onS) = Corpus.buildTrainingSet(
      docs, bench, "doc_id", "text", "source", budget = 512L,
      gopher = true)
    assert(offS("clean") == 2 && offP.count() == 2)
    assert(onS("clean") == 1 && onP.count() == 1)
    assert(onP.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("lengthHistogram: binary-digit buckets, zero maps to bucket 1") {
    val df = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("len")
    val h = Corpus.lengthHistogram(df, "len")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(h == Seq((1, 2L, 0L, 1L), (2, 2L, 2L, 3L), (3, 2L, 4L, 7L),
      (4, 1L, 8L, 8L), (10, 1L, 1023L, 1023L), (11, 1L, 1024L, 1024L)))
  }

  test("buildTrainingSet: stages compose, layout deterministic") {
    def words(seed: Int, n: Int): String =
      (0 until n).map(i => s"tok${(seed * 31 + i * 7) % 97}x$i").mkString(" ")
    val leak = (1 to 13).map(i => s"leak$i").mkString(" ")
    val docs = (
      (0 until 40).map(i => (i.toLong, words(i, 20), "web")) ++
      Seq((100L, words(3, 20), "books"),        // exact dup of doc 3's text
          (101L, s"intro $leak outro", "web"))  // contaminated
    ).toDF("doc_id", "text", "source")
    val bench = Seq(s"benchmark $leak tail").toDF("text")
    val (packed, stats) = graft.llm.Corpus.buildTrainingSet(
      docs, bench, "doc_id", "text", "source",
      weights = Map("books" -> 3.0), budget = 64L)
    assert(stats("input") == 42 && stats("gated") == 42)
    // dedup removes one of {3, 100}; decontamination removes 101
    assert(stats("deduped") == 41 && stats("clean") == 40)
    // books stratum (if doc 100 survived dedup) triples; web stays 1x
    val perCopy = packed.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perCopy.values.forall(c => c == 1 || c == 3))
    assert(stats("mixed") == perCopy.values.sum)
    // every row placed: split label + window span present and coherent
    val rows = packed.collect()
    assert(rows.forall(_.getAs[String]("split") != null))
    assert(rows.forall(r =>
      r.getAs[Long]("seq_last") >= r.getAs[Long]("seq_first")))
    // bit-identical layout under repartitioning
    val (again, _) = graft.llm.Corpus.buildTrainingSet(
      docs.repartition(7), bench, "doc_id", "text", "source",
      weights = Map("books" -> 3.0), budget = 64L)
    assert(packed.except(again).count() == 0 &&
      again.except(packed).count() == 0)
  }

  test("writeTrainingShards: one sorted file per (split, shard)") {
    val docs = (0 until 60).map(i =>
      (i.toLong, (0 until 15).map(j => s"w${i}t$j").mkString(" "), "web"))
      .toDF("doc_id", "text", "source")
    val bench = Seq("unrelated benchmark words only").toDF("text")
    val (packed, _) = graft.llm.Corpus.buildTrainingSet(
      docs, bench, "doc_id", "text", "source", budget = 64L)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    graft.llm.Corpus.writeTrainingShards(packed, dir)
    // every (split, shard) directory holds exactly one data file
    val root = new java.io.File(dir)
    val shardDirs = root.listFiles().filter(_.isDirectory).flatMap(
      _.listFiles().filter(_.isDirectory))
    assert(shardDirs.nonEmpty)
    assert(shardDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    // read-back: all rows survive; each file is (seq_first, start)-sorted
    val back = spark.read.parquet(dir)
    assert(back.count() == packed.count())
    for (d <- shardDirs) {
      val rows = spark.read.parquet(d.getAbsolutePath)
        .select("seq_first", "start").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)),
        s"unsorted shard ${d.getAbsolutePath}")
    }
    // JSON-lines mode: same one-file-per-shard contract, line order
    // preserved on disk (loaders stream the file as-is)
    val jdir = java.nio.file.Files.createTempDirectory("graft-shards-json")
      .toString
    graft.llm.Corpus.writeTrainingShards(packed, jdir, format = "json")
    val jshardDirs = new java.io.File(jdir).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles().filter(_.isDirectory))
    assert(jshardDirs.nonEmpty)
    assert(jshardDirs.forall(
      _.listFiles().count(_.getName.endsWith(".json")) == 1))
    assert(spark.read.json(jdir).count() == packed.count())
    for (d <- jshardDirs) {
      val f = d.listFiles().filter(_.getName.endsWith(".json")).head
      val keys = scala.io.Source.fromFile(f).getLines().map { line =>
        def field(name: String): Long =
          ("\"" + name + "\":(\\d+)").r.findFirstMatchIn(line).get
            .group(1).toLong
        (field("seq_first"), field("start"))
      }.toArray
      assert(keys.sameElements(keys.sortBy(identity)),
        s"unsorted JSON shard ${f.getAbsolutePath}")
    }
    intercept[IllegalArgumentException] {
      graft.llm.Corpus.writeTrainingShards(packed, jdir, format = "csv")
    }
  }

  test("selectToTokenBudget: greedy fill equals the global running-sum semantics") {
    // scores force the order (3,2,2,2,1); ties inside score 2 break by id
    val df = Seq(
      (10L, 3.0, 100L), // cum 100
      (21L, 2.0, 200L), // cum 300
      (22L, 2.0, 200L), // cum 500
      (23L, 2.0, 200L), // cum 700 > 600 → out
      (30L, 1.0, 50L)   // lower score, budget already crossed → out
    ).toDF("doc_id", "score", "toks")
    val out = Corpus.selectToTokenBudget(df, "doc_id", "score", "toks", 600L)
      .orderBy("cum_tokens")
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 3.0, 100L, 100L), (21L, 2.0, 200L, 300L),
      (22L, 2.0, 200L, 500L)))
    // exact-fit boundary is included; zero budget selects nothing
    val exact = Corpus.selectToTokenBudget(df, "doc_id", "score", "toks", 700L)
    assert(exact.count() == 4L)
    assert(Corpus.selectToTokenBudget(df, "doc_id", "score", "toks", 0L).count() == 0L)
    // null score / null tokens cannot rank
    val withNulls = Seq((1L, Some(5.0), Some(10L)), (2L, None, Some(10L)),
      (3L, Some(4.0), None)).toDF("doc_id", "score", "toks")
    assert(Corpus.selectToTokenBudget(withNulls, "doc_id", "score", "toks", 100L)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // partitioning invariance: same selection at any parallelism
    val repart = Corpus.selectToTokenBudget(df.repartition(7), "doc_id",
      "score", "toks", 600L)
    assert(repart.orderBy("cum_tokens").as[(Long, Double, Long, Long)]
      .collect().toSeq == out)
  }

  test("selectToTokenBudget keeps zero-token heads of a group landing exactly on budget") {
    // group score=2 starts at __before == budget (300): the oracle's
    // running sum keeps its zero-token head docs (cum == budget)
    val df = Seq(
      (1L, 3.0, 300L), // cum 300 == budget
      (2L, 2.0, 0L),   // cum 300 == budget -> kept
      (3L, 2.0, 50L)   // cum 350 -> out
    ).toDF("doc_id", "score", "toks")
    val out = Corpus.selectToTokenBudget(df, "doc_id", "score", "toks", 300L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(out == Seq(1L, 2L))
  }

  test("distinct-domain windows fail loudly past maxDomain") {
    // 5 distinct lengths over a bound of 3: the bounded-domain premise is
    // enforced on the window's own exchange, not just warned about
    val lens = spark.range(1, 6).select(col("id").as("len"))
    val e = intercept[Exception] {
      graft.llm.Corpus.lengthQuantiles(lens, "len", maxDomain = 3L).count()
    }
    assert(chain(e).exists(t => Option(t.getMessage)
      .exists(_.contains("domain overflow"))), s"got: ${e.getMessage}")
    val scored = Seq((1L, 1.0, 10L), (2L, 2.0, 10L), (3L, 3.0, 10L),
      (4L, 4.0, 10L)).toDF("doc_id", "score", "toks")
    val e2 = intercept[Exception] {
      Corpus.selectToTokenBudget(scored, "doc_id", "score", "toks", 100L,
        maxDomain = 2L).count()
    }
    assert(chain(e2).exists(t => Option(t.getMessage)
      .exists(_.contains("domain overflow"))), s"got: ${e2.getMessage}")
    // under the bound, results are untouched
    assert(Corpus.selectToTokenBudget(scored, "doc_id", "score", "toks", 100L,
      maxDomain = 10L).count() > 0)
  }

  private def chain(e: Throwable): List[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toList

  test("importanceWeights: integer sign-of-ratio leans match hand computation") {
    // target is pure "ml ml data"; raw docs differ in how target-like
    // their tokens are
    val raw = Seq(
      (1L, "ml data ml"),      // tokens lean target
      (2L, "tax law tax law"), // tokens absent from target → raw-leaning
      (3L, "ml tax")           // split
    ).toDF("doc_id", "text")
    val target = Seq((9L, "ml ml data")).toDF("doc_id", "text")
    val out = Corpus.importanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // n_raw = 9, n_tgt = 3; lean(t) = sign((tf_t+1)*10 - (rf+1)*4)
    // ml: tf_t=2, rf=3 → 30 > 16 → +1 ; data: tf_t=1, rf=2 → 20 > 12 → +1
    // tax: tf_t=0, rf=3 → 10 < 16 → −1 ; law: tf_t=0, rf=2 → 10 < 12 → −1
    assert(out(1L) == ((3L, 3L, 0L, 3L)))   // ml ml data: all target-leaning
    assert(out(2L) == ((4L, 0L, 4L, -4L)))  // tax law ×2: all raw-leaning
    assert(out(3L) == ((2L, 1L, 1L, 0L)))   // ml + tax: net zero
    // ranking by score orders docs by domain match, the DSIR read
    val ranked = out.toSeq.sortBy(-_._2._4).map(_._1)
    assert(ranked == Seq(1L, 3L, 2L))
    // empty target: totals coalesce to 0 (uniform-smoothing degenerate),
    // no nulls anywhere
    val empty = Corpus.importanceWeights(raw,
      target.filter(col("doc_id") < 0L), "doc_id", "text")
    assert(empty.count() == 3L)
    assert(empty.filter(col("score").isNull).count() == 0L)
  }

  test("graft-wds source round-trips writeWebDatasetShards samples exactly") {
    val docs = (0 until 40).map(i =>
      (i.toLong, s"caption for sample $i".getBytes("UTF-8"),
        Array.tabulate(16)(b => (i * 31 + b).toByte)))
      .toDF("doc_id", "caption", "image")
    val dir = java.nio.file.Files.createTempDirectory("wds-rt").toString
    Corpus.writeWebDatasetShards(docs, dir, "doc_id",
      Seq("image" -> "png", "caption" -> "txt"), nShards = 4)
    val back = spark.read.format("graft-wds").load(dir)
      .select(col("key"), col("entries"))
      .as[(String, Map[String, Array[Byte]])].collect()
    assert(back.length == 40)
    // one row per sample, both extensions grouped, payloads bit-exact
    val byKey = back.map { case (k, m) => k.toLong -> m }.toMap
    (0 until 40).foreach { i =>
      val m = byKey(i.toLong)
      assert(m.keySet == Set("png", "txt"), s"sample $i exts ${m.keySet}")
      assert(new String(m("txt"), "UTF-8") == s"caption for sample $i")
      assert(java.util.Arrays.equals(m("png"),
        Array.tabulate(16)(b => (i * 31 + b).toByte)))
    }
    // parallelism contract: one partition per shard tar
    val parts = spark.read.format("graft-wds").load(dir)
      .rdd.getNumPartitions
    val nTars = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".tar"))
    assert(parts == nTars && nTars >= 1)
    // a single tar file path (not just a directory) loads too
    val one = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    assert(spark.read.format("graft-wds").load(one.toString).count() > 0)
    // a mismatched user schema is rejected, not silently replaced
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-wds")
        .schema("key STRING, wrong INT").load(dir)
    }
    assert(e.getMessage.contains("does not match the source schema"))
  }

  test("writeWebDatasetShards: reproducible tars, complete samples, Extract re-ingest") {
    val docs = (0 until 40).map(i =>
      (i.toLong, s"caption for sample $i".getBytes("UTF-8"),
        Array.tabulate(16)(b => (i * 31 + b).toByte)))
      .toDF("doc_id", "caption", "image")
    val dir1 = java.nio.file.Files.createTempDirectory("wds1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("wds2").toString
    Corpus.writeWebDatasetShards(docs, dir1, "doc_id",
      Seq("image" -> "png", "caption" -> "txt"), nShards = 4)
    Corpus.writeWebDatasetShards(docs.repartition(7), dir2, "doc_id",
      Seq("image" -> "png", "caption" -> "txt"), nShards = 4)
    val tars1 = new java.io.File(dir1).listFiles().filter(
      _.getName.endsWith(".tar")).sortBy(_.getName)
    assert(tars1.nonEmpty && tars1.length <= 4)
    // commit protocol: no tmp leftovers, job-level success marker
    assert(!tars1.exists(_.getName.startsWith("_tmp-")))
    assert(new java.io.File(dir1, "_SUCCESS").exists())
    // bit-reproducible across input partitionings
    for (t <- tars1) {
      val twin = java.nio.file.Paths.get(dir2, t.getName)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(t.toPath),
        java.nio.file.Files.readAllBytes(twin)), s"${t.getName} differs")
    }
    // every sample's two entries present, adjacent, keys sorted per shard
    val entries = tars1.flatMap { t =>
      val in = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
        new java.io.FileInputStream(t))
      val names = Iterator.continually(in.getNextEntry)
        .takeWhile(_ != null).map { e =>
          val bytes = in.readAllBytes()
          (e.getName, bytes)
        }.toList
      in.close()
      // keys are the STRING sort order (the cast key column)
      val keys = names.map(_._1.split("\\.").head)
      assert(keys == keys.sorted, s"unsorted shard ${t.getName}")
      names
    }
    assert(entries.length == 80)
    val byName = entries.toMap
    assert(new String(byName("7.txt"), "UTF-8") == "caption for sample 7")
    assert(byName("7.png").sameElements(Array.tabulate(16)(b => (7 * 31 + b).toByte)))
    // the shards re-ingest through the existing archive extractor
    import spark.implicits._
    val tarDf = tars1.map(t => (t.getName,
      java.nio.file.Files.readAllBytes(t.toPath))).toSeq.toDF("key", "content")
    val members = graft.pipelines.Extract.extractArchives(tarDf)
    assert(members.count() == 80)
    // re-running into the same dir with FEWER samples truncates stale tars
    Corpus.writeWebDatasetShards(docs.filter($"doc_id" === 0L), dir1,
      "doc_id", Seq("caption" -> "txt"), nShards = 4)
    val after = new java.io.File(dir1).listFiles()
      .filter(_.getName.endsWith(".tar"))
    assert(after.length == 1, s"stale shards survived: ${after.toSeq}")
    // dotted keys would silently merge WebDataset samples → loud error
    val dotted = Seq(("img.001", "x".getBytes("UTF-8")))
      .toDF("doc_id", "caption")
    intercept[Exception] {
      Corpus.writeWebDatasetShards(dotted,
        java.nio.file.Files.createTempDirectory("wds3").toString,
        "doc_id", Seq("caption" -> "txt"), nShards = 2)
    }
  }

  test("weightedSample: E-S reference parity, weight bias, loud w<=0, deterministic") {
    // plain-Scala reference of the same priority formula (platformLn's
    // eval IS Math.log in both engine paths)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def pri(id: Long, w: Double): BigDecimal = {
      val h = java.lang.Long.parseLong(md5hex(s"wsamp:$id").take(13), 16)
      BigDecimal(math.log((h + 1.0) / 4503599627370497.0) / w)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }
    // 50 heavy (w=100) + 150 light (w=1) docs; k=40
    val rows = (0L until 200L).map(i =>
      (i, if (i < 50) 100.0 else 1.0))
    val df = rows.toDF("doc_id", "w")
    val got = Corpus.weightedSample(df, "doc_id", $"w", k = 40)
      .select("rank", "doc_id").as[(Int, Long)].collect().toSeq
    val want = rows.map { case (i, w) => (i, pri(i, w)) }
      .sortBy { case (i, p) => (-p, i) }.take(40).map(_._1)
    assert(got.sortBy(_._1).map(_._2) == want)
    // weight bias: heavy docs are 25% of the corpus but dominate the top
    val heavy = got.count(_._2 < 50L)
    assert(heavy > 25, s"expected heavy-weight dominance, got $heavy/40")
    // deterministic under repartitioning
    val again = Corpus.weightedSample(df.repartition(7), "doc_id", $"w", 40)
      .select("rank", "doc_id").as[(Int, Long)].collect().toSet
    assert(again == got.toSet)
    // non-positive weight: loud, with guidance
    val e = intercept[Exception] {
      Corpus.weightedSample(
        Seq((1L, 0.0)).toDF("doc_id", "w"), "doc_id", $"w", 5).collect()
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).exists(t => Option(t.getMessage)
        .exists(_.contains("w > 0"))), s"got: ${e.getMessage}")
  }

  test("stratifiedSampleWeighted: window-twin parity, per-stratum ks, defaultK=0 drops") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf0, "documents")
    val ks = Map("en" -> 9, "de" -> 4)
    val out = Corpus.stratifiedSampleWeighted(docs, "lang", "doc_id",
      ks, defaultK = 2, seed = "wtest")
    val got = out.as[(String, Int, Long)].collect().toSet
    val viaWindow = docs
      .withColumn("rk", row_number().over(Window.partitionBy($"lang")
        .orderBy(md5(concat(lit("wtest:"), $"doc_id".cast("string"))),
          $"doc_id")))
      .filter($"rk" <= when($"lang" === "en", 9)
        .when($"lang" === "de", 4).otherwise(2))
      .select($"lang", $"rk", $"doc_id")
      .as[(String, Int, Long)].collect().toSet
    assert(got == viaWindow)
    val perLang = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perLang("en") == 9 && perLang("de") == 4)
    assert(perLang.filterNot(p => ks.contains(p._1)).values.forall(_ == 2))
    // defaultK = 0: strata absent from the map leave at the scan
    val dropped = Corpus.stratifiedSampleWeighted(docs, "lang", "doc_id",
      Map("en" -> 3), defaultK = 0, seed = "wtest")
    assert(dropped.select("lang").distinct().as[String].collect()
      .toSeq == Seq("en"))
    assert(dropped.count() == 3)
    // scale shape: bounded aggregate, not a window sort
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }

  test("heavyHitters: matches the exact vocabulary top-N; certifiability " +
      "violations throw; pass-2 filters candidates inside the scan") {
    val docs = Tables.load(spark, sf0, "documents")
    val viaSketch = Corpus.heavyHitters(docs, "text", topN = 10,
      capacity = 512)
    val viaExact = Corpus.vocabulary(docs, "text", topN = 10)
    assert(viaSketch.as[(String, Long)].collect().toSeq ==
      viaExact.as[(String, Long)].collect().toSeq)
    // pass 2 carries the candidate IN-set into the scan, and the plan
    // aggregates candidates only — never the full token domain
    val plan = viaSketch.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    // phrase (bigram) form: parity with the exact full-domain groupBy
    val bigSketch = Corpus.heavyHitters(docs, "text", topN = 8,
      capacity = 1024, ngram = 2).as[(String, Long)].collect().toSeq
    val bigExact = docs.select(explode(
        graft.expressions.GraftExpressions.wordNGrams(
          graft.llm.TextAnalysis.normalizeText(col("text")), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("g")).limit(8)
      .as[(String, Long)].collect().toSeq
    assert(bigSketch == bigExact)
    // an uncertifiable request (capacity too small for the corpus) must
    // raise, not silently return an approximate top-N
    val tiny = Corpus.heavyHitters(docs, "text", topN = 10, capacity = 12)
    val e = intercept[Exception] { tiny.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("raise capacity")),
      s"wrong error: ${e.getMessage}")
    // SHORT-result soundness: an eviction-shrunk sketch returning fewer
    // than topN rows must NOT be certified just because the final sketch
    // sits below capacity — the witness is the candidates' exact counts
    // summing to N. One doc, one partition → deterministic MG arrival:
    // "a a b c" at capacity 2 ends with sketch {a:1} (c's arrival
    // decrements a and evicts b), so cand_sum = freq(a) = 2 ≠ N = 4.
    val short = intercept[Exception] {
      Corpus.heavyHitters(Seq("a a b c").toDF("text"), "text",
        topN = 2, capacity = 2).collect()
    }
    assert(msgs(short).exists(m => m != null && m.contains("raise capacity")),
      s"short result not refused: ${short.getMessage}")
    // full wipe-out: 13 distinct tokens at capacity 12 — the 13th
    // arrival evicts every counter; zero candidates over a non-empty
    // corpus must refuse eagerly (an empty result has no row to carry
    // an in-plan raise_error)
    val wiped = intercept[IllegalArgumentException] {
      Corpus.heavyHitters(
        Seq((1 to 13).map("t" + _).mkString(" ")).toDF("text"), "text",
        topN = 12, capacity = 12)
    }
    assert(wiped.getMessage.contains("raise capacity"), wiped.getMessage)
    // empty corpus: typed empty frame, no raise
    val empty = Corpus.heavyHitters(docs.filter(lit(false)), "text",
      topN = 5, capacity = 16)
    assert(empty.schema.fieldNames.toSeq == Seq("token", "freq"))
    assert(empty.count() == 0)
  }

  test("heavyHittersSketch + relational merge keep the MG guarantee " +
      "across splits (incremental corpus stats)") {
    val docs = Tables.load(spark, sf0, "documents")
    val cap = 256
    val parts = (0 until 3).map(i => docs.filter($"doc_id" % 3 === i))
    val tagged = parts.zipWithIndex.map { case (p, i) =>
      Corpus.heavyHittersSketch(p, "text", capacity = cap)
        .withColumn("sketch_id", lit(i))
    }
    val merged = Corpus
      .mergeHeavyHitterSketches(tagged.reduce(_ unionByName _), cap)
      .as[(String, Long, Long)].collect()
    // exact truth over the whole corpus
    val exact = docs.select(explode(
        graft.expressions.GraftExpressions.wordNGrams(
          graft.llm.TextAnalysis.normalizeText(col("text")), 1)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val bound = n / (cap + 1)
    assert(merged.length <= cap)
    assert(merged.forall(_._3 == n), "merged n_part must be the total")
    val got = merged.map(r => r._1 -> r._2).toMap
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(got.contains(t), s"merged sketch lost heavy hitter '$t'")
    }
    got.foreach { case (t, lb) =>
      assert(lb <= exact(t), s"'$t' overcounted: $lb > ${exact(t)}")
      assert(exact(t) - lb <= bound,
        s"'$t' deficit ${exact(t) - lb} > $bound")
    }
    // single-sketch merge is the identity (no subtract when ≤ capacity)
    val one = Corpus.mergeHeavyHitterSketches(tagged.head, cap)
      .as[(String, Long, Long)].collect().toSet
    val direct = tagged.head.select($"token", $"count_lb", $"n_part")
      .as[(String, Long, Long)].collect().toSet
    assert(one == direct)
    // an EMPTY slice's sketch still carries its n_part (explode_outer
    // placeholder row) and merging it in changes nothing but the total
    val emptySketch = Corpus
      .heavyHittersSketch(docs.filter(lit(false)), "text", capacity = cap)
      .withColumn("sketch_id", lit(99))
    assert(emptySketch.count() == 1, "placeholder row expected")
    val withEmpty = Corpus.mergeHeavyHitterSketches(
        (tagged :+ emptySketch).reduce(_ unionByName _), cap)
      .as[(String, Long, Long)].collect()
    assert(withEmpty.map(r => r._1 -> r._2).toMap == got)
    assert(withEmpty.forall(_._3 == n))
  }

  test("corpusDrift: matches a plain-Scala reference on real data") {
    val docs = Tables.load(spark, sf0, "documents")
    val out = Corpus.corpusDrift(docs, "text", "lang", "en", "de",
      topN = 12).as[(String, Long, Long)].collect()
    // independent reference: collect raw docs, re-tokenize in Scala
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
        .split("\\s+").toSeq.filter(_.nonEmpty)
    val raw = docs.filter($"lang".isin("en", "de"))
      .select("lang", "text").as[(String, String)].collect()
    val fa = scala.collection.mutable.Map.empty[String, Long]
    val fb = scala.collection.mutable.Map.empty[String, Long]
    raw.foreach { case (lang, text) =>
      val m = if (lang == "en") fa else fb
      toks(text).foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
    }
    val na = fa.values.sum; val nb = fb.values.sum
    val expected = (fa.keySet ++ fb.keySet).toSeq.map { t =>
      val a = fa.getOrElse(t, 0L); val b = fb.getOrElse(t, 0L)
      (t, a, b, (BigInt(a) * nb - BigInt(b) * na).abs)
    }.sortBy { case (t, _, _, d) => (-d, t) }.take(12)
      .map { case (t, a, b, _) => (t, a, b) }
    assert(out.toSeq == expected)
  }

  test("ngramDiversity: matches a plain-Scala reference; single corpus " +
      "scan") {
    val docs = Tables.load(spark, sf0, "documents")
    val out = Corpus.ngramDiversity(docs, "text", maxN = 3)
      .as[(Int, Long, Long)].collect().toSeq
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").trim
        .split("\\s+").toSeq.filter(_.nonEmpty)
    val texts = docs.select("text").as[String].collect().toSeq
    val expected = (1 to 3).map { n =>
      val grams = texts.flatMap(t => toks(t).sliding(n).filter(_.size == n)
        .map(_.mkString(" ")))
      (n, grams.size.toLong, grams.distinct.size.toLong)
    }
    assert(out == expected)
    // one scan: all n orders explode from the same rows
    val scans = "Scan parquet".r
      .findAllIn(Corpus.ngramDiversity(docs, "text", maxN = 3)
        .queryExecution.executedPlan.toString).length
    assert(scans == 1, s"expected 1 scan, got $scans")
  }

  test("plan shapes: scan-side ops shuffle-free, packing exactly once") {
    val docs = Tables.load(spark, sf0, "documents")
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    // split label + replication are pure scan-stage column/generator ops
    assert(exchanges(docs.select(graft.llm.Corpus.splitAssign(col("doc_id"),
      Seq("train" -> 0.9, "val" -> 0.1)).as("s"))) == 0)
    assert(exchanges(graft.llm.Corpus.replicateByWeight(
      docs.select("doc_id", "source", "text"), col("source"), col("text"),
      Map("src1" -> 2.5))) == 0)
    // packing: the per-shard window is the ONLY exchange
    assert(exchanges(graft.llm.Corpus.packSequences(
      docs, "doc_id", "n_chars", 4096L)) == 1)
    // vocabulary: one partial-agg exchange; top-N is a TakeOrdered, not a sort
    val v = graft.llm.Corpus.vocabulary(docs, "text", 20)
    assert(exchanges(v) == 1)
    assert(v.queryExecution.executedPlan.toString.contains("TakeOrdered"))
  }

  test("buildTrainingSet stripSpans stage equals a manual pre-strip") {
    val footer = "generated by acme corp all rights reserved contact legal dept"
    val docs = (0 until 30).map(i =>
      (i.toLong, s"document $i body w${i}a w${i}b w${i}c $footer", "web"))
      .toDF("doc_id", "text", "source")
    val bench = Seq("unrelated benchmark words only").toDF("text")
    val (a, _) = Corpus.buildTrainingSet(docs, bench,
      "doc_id", "text", "source", budget = 64L,
      stripSpans = true, stripW = 10, stripMinDocs = 3)
    val pre = graft.llm.Dedup.stripBoilerplate(docs, "doc_id", "text",
        w = 10, minDocs = 3)
      .withColumn("text", col("clean_text")).drop("clean_text")
    val (b, _) = Corpus.buildTrainingSet(pre, bench,
      "doc_id", "text", "source", budget = 64L)
    assert(a.collect().map(_.toString).sorted
      .sameElements(b.collect().map(_.toString).sorted))
    // and the strip actually bit: the packed layout differs from the
    // unstripped run (every doc lost the footer's 10 tokens)
    val (c, _) = Corpus.buildTrainingSet(docs, bench,
      "doc_id", "text", "source", budget = 64L)
    assert(a.count() == c.count())
    assert(!a.collect().map(_.toString).sorted
      .sameElements(c.collect().map(_.toString).sorted))
  }

  test("unigramSurprisal: integer inverse-frequency scoring, hand-computed") {
    // freqs: a→2, b→2, c→1, total 5; info = total DIV freq: a,b→2, c→5
    val df = Seq((1L, "A! a b"), (2L, "b c"), (3L, "..."))
      .toDF("doc_id", "text")
    val out = Corpus.unigramSurprisal(df, "doc_id", "text")
      .select("doc_id", "n_tokens", "sum_info", "mean_info")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 6L, 2.0)))   // 2+2+2 over "a a b"
    assert(out(2L) == ((2L, 7L, 3.5)))   // 2+5 over "b c"
    // doc 3 normalizes to zero tokens → absent (carries no signal)
    assert(!out.contains(3L))
    // rare-token docs score strictly higher than common-token docs
    assert(out(2L)._3 > out(1L)._3)
  }

  test("bigramSurprisal: conditional inverse-probability scoring, hand-computed") {
    // bigrams: "a b"×2 (docs 1,2), "a c"×1 (doc 3); context "a"×3.
    // info = c(prev,·) DIV c(prev,cur): "a b" → 3 DIV 2 = 1, "a c" → 3
    val df = Seq((1L, "A! b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = Corpus.bigramSurprisal(df, "doc_id", "text")
      .select("doc_id", "n_bigrams", "sum_info", "mean_info")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((1L, 1L, 1.0)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(out(3L) == ((1L, 3L, 3.0))) // rare continuation scores higher
    // a single-token doc has no bigrams → absent, like unigram's empties
    assert(!out.contains(4L))
  }

  test("tfidfKeywords: tf·(N+1-df) integer scoring, top-k per doc") {
    // 3 docs; "common" in all (rarity 1), "rare" only in doc 1 (rarity 3)
    val df = Seq(
      (1L, "common rare rare"),
      (2L, "common common other"),
      (3L, "common")).toDF("doc_id", "text")
    val kw = Corpus.tfidfKeywords(df, "doc_id", "text", perDoc = 2)
      .as[(Long, String, Long)].collect().toSet
    // doc1: rare tf=2·(4-1)=6 > common 1·1=1
    // doc2: other 1·3=3 > common 2·1=2; doc3: common 1
    assert(kw == Set((1L, "rare", 6L), (1L, "common", 1L),
      (2L, "other", 3L), (2L, "common", 2L), (3L, "common", 1L)))
  }

  test("collocations: lift ranks the planted pair over high-frequency glue") {
    // "strong glue" always co-occurs; "sep" is corpus-wide noise whose
    // fat marginals dilute every pair it joins (the PMI point)
    val text = ("strong glue sep " * 5) +
      (0 until 5).map(i => s"sep w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = graft.llm.Corpus.collocations(df, "doc_id", "text",
      minCount = 2, k = 5).collect()
    assert(out.head.getString(1) == "strong glue",
      s"planted collocation must rank first: ${out.toSeq.mkString(", ")}")
    val top = out.head
    assert(top.getInt(0) == 1 && top.getLong(2) == 5L)
    // hand-recompute lift = round(1e6 · c_xy · N / (c_x · c_y)) over the
    // bigram-position marginals of the token stream
    val toks = text.trim.split("\\s+")
    val n = toks.length - 1
    val cx = toks.dropRight(1).count(_ == "strong")
    val cy = toks.drop(1).count(_ == "glue")
    assert(top.getLong(3) ==
      math.round(1000000.0 * 5 * n / (cx.toLong * cy)))
  }

  test("collocations: minCount prunes rare pairs before ranking") {
    val df = Seq((1L, "a b " * 3 + "x y")).toDF("doc_id", "text")
    val out = graft.llm.Corpus.collocations(df, "doc_id", "text",
      minCount = 3, k = 10).collect()
    assert(out.map(_.getString(1)).toSet.contains("a b"))
    assert(!out.map(_.getString(1)).toSet.contains("x y"))
  }

  test("temperatureMix keeps the smallest stratum whole, flattens the rest") {
    val rows = (0 until 400).map(i => (i.toLong, s"document number $i", "big")) ++
      (400 until 425).map(i => (i.toLong, s"document number $i", "small"))
    val df = rows.toDF("doc_id", "text", "source")
    val kept = graft.llm.Corpus.temperatureMix(df, "source", "text")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest stratum: rate 1.0 (only an md5 prefix of ffffffff drops)
    assert(kept("small") == 25L)
    // big stratum flattens toward sqrt(25/400) = 1/4 of 400 = ~100;
    // the hash cut is deterministic, so pin the exact observed count
    // bounds rather than the expectation: binomial(400, .25) stays
    // far from these rails
    assert(kept("big") > 60L && kept("big") < 140L, kept.toString)
    // determinism: the same cut twice
    val again = graft.llm.Corpus.temperatureMix(df, "source", "text")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("temperatureMix survives a wide stratum domain (flat map literal)") {
    // 2000 distinct strata: the former nested when/otherwise chain
    // recursed once per stratum through analyzer+codegen and blew the
    // stack long before maxStrata; the map-literal predicate is
    // O(1)-depth at any width
    val df = (0 until 4000).map(i => (i.toLong, s"text $i", s"s${i % 2000}"))
      .toDF("doc_id", "text", "source")
    val kept = graft.llm.Corpus.temperatureMix(df, "source", "text")
    // every stratum has count 2 = nMin → rate 1.0 → all kept
    assert(kept.count() == 4000L)
  }

  test("temperatureMix refuses an unbounded stratum domain, loudly") {
    val df = (0 until 50).map(i => (i.toLong, s"t$i", s"s$i"))
      .toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      graft.llm.Corpus.temperatureMix(df, "source", "text", maxStrata = 10)
    }
    assert(e.getMessage.contains("maxStrata"))
  }

  test("driftFromSketches: exact-regime parity with corpusDrift; " +
      "empty-slice placeholders keep totals; loud topN") {
    val docs = Tables.load(spark, sf0, "documents")
    val skA = Corpus.heavyHittersSketch(
      docs.filter(col("lang") === "en"), "text", capacity = 4096)
    val skB = Corpus.heavyHittersSketch(
      docs.filter(col("lang") === "de"), "text", capacity = 4096)
    val fromSketch = Corpus.driftFromSketches(skA, skB, topN = 10)
      .as[(String, Long, Long)].collect().toSeq
    val fromScan = Corpus.corpusDrift(docs, "text", "lang", "en", "de",
        topN = 10).as[(String, Long, Long)].collect().toSeq
    assert(fromSketch == fromScan,
      s"sketch drift diverged: $fromSketch vs $fromScan")
    // an all-evicted/empty slice contributes only its placeholder row:
    // every token drifts toward the non-empty side, totals intact
    val empty = Corpus.heavyHittersSketch(
      docs.filter(lit(false)), "text", capacity = 16)
    val vs = Corpus.driftFromSketches(skA, empty, topN = 5)
      .as[(String, Long, Long)].collect()
    assert(vs.length == 5 && vs.forall(_._3 == 0L), vs.toSeq.toString)
    intercept[IllegalArgumentException] {
      Corpus.driftFromSketches(skA, skB, topN = 0)
    }
  }

  test("perplexityBuckets: exhaustive, value-monotone, ties share buckets") {
    val docs = Tables.load(spark, sf0, "documents")
    val out = Corpus.perplexityBuckets(docs, "doc_id", "text", nBuckets = 3)
      .select($"doc_id", $"mean_info", $"bucket").as[(Long, Double, Long)]
      .collect()
    val scored = Corpus.unigramSurprisal(docs, "doc_id", "text").count()
    assert(out.length == scored, "every scored doc must land in a bucket")
    assert(out.forall(r => r._3 >= 0 && r._3 < 3))
    // value-threshold semantics: bucket ranges are disjoint and ordered,
    // so equal scores can never split across buckets
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    for (i <- 0 until 2 if byBucket.contains(i) && byBucket.contains(i + 1))
      assert(byBucket(i).max < byBucket(i + 1).min,
        s"bucket $i overlaps bucket ${i + 1}")
    intercept[IllegalArgumentException] {
      Corpus.perplexityBuckets(docs, "doc_id", "text", nBuckets = 1)
    }
  }

  test("perplexityBuckets: KLL-threshold mode matches exact mode in the " +
      "sketch's exact regime") {
    // 10 docs with distinct scores — n chosen so the inclusive ranks
    // avoid the i·N-divisible-by-nBuckets FP boundary (documented ulp
    // caveat of the sketch mode's double q·N)
    val docs = (1 to 10).map(i =>
        (i.toLong, (Seq.fill(11 - i)("common") ++ Seq.fill(i)(s"rare$i"))
          .mkString(" ")))
      .toDF("doc_id", "text")
    val ex = Corpus.perplexityBuckets(docs, "doc_id", "text", nBuckets = 3,
      exact = true).as[(Long, Double, Long)].collect().sortBy(_._1)
    val sk = Corpus.perplexityBuckets(docs, "doc_id", "text", nBuckets = 3,
      exact = false).as[(Long, Double, Long)].collect().sortBy(_._1)
    assert(ex.sameElements(sk),
      s"exact ${ex.toSeq} vs sketch ${sk.toSeq}")
    assert(ex.map(_._3).distinct.sorted.sameElements(Array(0L, 1L, 2L)))
  }
}
