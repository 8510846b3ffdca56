package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.load(spark, sf0, "documents").cache()

  test("exact dedup keeps the smallest id per hash and counts groups") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("shingles produce distinct word n-grams") {
    val sh = Seq("a b c d").toDF("t")
      .select(Dedup.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Dedup.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("jaccardPairs finds the planted near-duplicates and nothing else") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .cache()
    val n = pairs.count()
    // sf0.001 documents: 25-28 planted near-dup pairs (verified against an
    // exact all-pairs computation in DuckDB); the gap to the next-highest
    // Jaccard is wide, so the exact count is stable
    assert(n > 10 && n < 100, s"got $n pairs")
    assert(pairs.filter($"jaccard" < 0.5 || $"jaccard" > 1.0).isEmpty)
    // symmetric-dedup invariant: i < j always
    assert(pairs.filter($"i" >= $"j").isEmpty)
  }

  test("jaccardPairs honors an explicit observe-metric name") {
    var seen: Option[String] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (qe.observedMetrics.contains("pinned_metric"))
          seen = Some("pinned_metric")
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
        observeName = Some("pinned_metric")).count()
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(seen.contains("pinned_metric"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("minhash LSH candidates achieve high recall of exact pairs") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 64,
        bands = 16, threshold = 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} exact pairs")
  }

  test("lshCandidates enforces the compute-once boundary for direct callers") {
    // a DIRECT call on un-repartitioned signatures: the function must insert
    // the materialization boundary itself, so the signature fold appears
    // exactly once in the physical plan and the banding self-join reuses the
    // exchange rather than recomputing signatures per side. Plain (uncached)
    // scan: a .cache() would wrap the input in TableCacheQueryStage nodes,
    // which defeat AQE's exchange-stage cache (Spark-internal; production
    // dedup runs over parquet scans, the uncached shape). Reading a temp
    // COPY of the parquet keeps the CacheManager from substituting this
    // suite's cached `docs` plan into the scan.
    val tmp = java.nio.file.Files.createTempDirectory("graft-plan").toString
    val src = java.nio.file.Paths.get(sf0, "documents.parquet")
    java.nio.file.Files.copy(src,
      java.nio.file.Paths.get(tmp, "documents.parquet"))
    val plainDocs = spark.read.parquet(s"$tmp/documents.parquet")
    val direct = Dedup.lshCandidates(
      Dedup.minhashSignatures(plainDocs, "doc_id", "text"), bands = 16, rows = 4)
    direct.collect() // AQE reuses identical exchanges at runtime → final plan
    val plan = direct.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"self-join did not reuse the signature exchange:\n$plan")
    // idempotence: a caller that already repartitioned gets NO second
    // exchange stacked on top — shuffle count identical to the direct call
    val pre = Dedup.minhashSignatures(plainDocs, "doc_id", "text")
      .repartition(col("id"))
    val viaPre = Dedup.lshCandidates(pre, bands = 16, rows = 4)
    viaPre.collect()
    val prePlan = viaPre.queryExecution.executedPlan.toString
    def shuffles(p: String) = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles(plan) == shuffles(prePlan),
      s"direct=${shuffles(plan)} pre-bounded=${shuffles(prePlan)}")
  }

  test("cross-corpus exact dedup matches only new-vs-corpus, never corpus pairs") {
    val df = Seq(
      (7L, "same text"), (14L, "other text"),   // "new" batch (ids % 7 == 0)
      (1L, "same text"), (2L, "same text"), (3L, "unrelated")).toDF("doc_id", "text")
    val out = Dedup.exactAgainst(df.filter($"doc_id" % 7 === 0),
        df.filter($"doc_id" % 7 =!= 0), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    // 7 matches corpus docs {1,2} → (i=7, j=min=1, 2 matches); 14 matches none
    assert(out == Set((7L, 1L, 2L)))
  }

  test("cross-corpus jaccard equals the self-join pairs restricted to the split") {
    val newDocs = docs.filter($"doc_id" % 7 === 0)
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val cross = Dedup.jaccardPairsAgainst(newDocs, corpus, "doc_id", "text",
        n = 3, threshold = 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    // ground truth: the full self-join pair set, re-oriented to (new, corpus)
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("i", "j").as[(Long, Long)].collect()
    val expected = full.flatMap { case (a, b) =>
      Seq((a, b), (b, a))
    }.filter { case (i, j) => i % 7 == 0 && j % 7 != 0 }.toSet
    assert(cross == expected, s"cross=$cross expected=$expected")
    // orientation invariant: i always from the new batch, j from the corpus
    assert(cross.forall { case (i, j) => i % 7 == 0 && j % 7 != 0 })
  }

  test("cross-corpus minhash LSH recalls the exact cross pairs") {
    val newDocs = docs.filter($"doc_id" % 7 === 0)
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val exact = Dedup.jaccardPairsAgainst(newDocs, corpus, "doc_id", "text",
        n = 3, threshold = 0.6)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshAgainst(newDocs, corpus, "doc_id", "text",
        n = 3, k = 64, bands = 16, threshold = 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    if (exact.nonEmpty) {
      val recall = exact.count(lsh.contains).toDouble / exact.size
      assert(recall >= 0.9, s"recall $recall over ${exact.size}")
    }
    // precomputed-signature path returns the identical pair set
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text")
    val viaPre = Dedup.minhashLshAgainst(newDocs, sigs, "doc_id", "text",
        precomputedSignatures = true)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(viaPre == lsh)
  }

  test("cross-corpus embedding near-dup: exact split-equivalence, LSH subset") {
    val emb = Tables.load(spark, sf0, "embeddings")
    val newV = emb.filter($"vec_id" % 7 === 0)
    val corpus = emb.filter($"vec_id" % 7 =!= 0)
    // exact cross mode equals the full self-pairs restricted to the split
    val cross = Dedup.embeddingNearDupAgainst(newV, corpus, threshold = 0.4,
        useLsh = Some(false))
      .select("i", "j").as[(Long, Long)].collect().toSet
    val full = Dedup.embeddingNearDup(emb, threshold = 0.4)
      .select("i", "j").as[(Long, Long)].collect()
    val expected = full.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (i, j) => i % 7 == 0 && j % 7 != 0 }.toSet
    assert(cross == expected)
    // bipartite LSH verifies with the same exact cosine ⇒ subset, no false pairs
    val lsh = Dedup.embeddingNearDupAgainst(newV, corpus, threshold = 0.4,
        useLsh = Some(true), nPlanes = 6)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(cross))
  }

  test("cross-corpus embedding near-dup keeps equal-id cross pairs") {
    // newDf and corpus are independent tables: a re-ingested doc keyed by a
    // stable id is a legitimate cross pair and must not be dropped (the
    // against-family contract — exactAgainst/jaccardPairsAgainst keep them)
    val emb = Tables.load(spark, sf0, "embeddings")
    val one = emb.filter($"vec_id" === 0)
    val sameId = Dedup.embeddingNearDupAgainst(one, one, threshold = 0.99,
        useLsh = Some(false))
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(sameId == Set((0L, 0L)), s"equal-id cross pair dropped: $sameId")
  }

  test("minhash signature estimate approximates true Jaccard") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    assert(sigs.select(size($"signature")).distinct().as[Int].head() == 64)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.7)
    val est = Dedup.estimateJaccard(sigs,
      exact.select("i", "j")).as[(Long, Long, Double)].collect()
    est.foreach { case (_, _, e) => assert(e > 0.4, s"estimate $e too low") }
  }

  test("simhash: identical docs collide at hamming 0, unrelated do not") {
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val far = (1 to 100).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearPairs(
        Dedup.simhashSignatures(df, "doc_id", "text"), maxHamming = 3)
      .select("i", "j", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("simhash finds the planted near-dups in the documents table") {
    val pairs = Dedup.simhashNearPairs(
      Dedup.simhashSignatures(docs, "doc_id", "text"), maxHamming = 3)
    assert(pairs.count() > 0)
    // every simhash pair within hamming 3 should be a genuinely similar pair
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val sh = pairs.select("i", "j").as[(Long, Long)].collect().toSet
    val precision = sh.count(exact.contains).toDouble / math.max(sh.size, 1)
    assert(precision >= 0.8, s"precision $precision over ${sh.size} pairs")
  }

  test("simhashNearPairsAgainst equals the batch pairs restricted to the bipartition") {
    // the against variant must surface EXACTLY the cross-corpus subset of
    // the batch operator's pairs (same bands, same hamming bar) — as
    // unordered pairs, since the batch emits i<j while against emits
    // (new, corpus)
    val isNew = (id: Long) => id % 7 == 0
    val newSigs = Dedup.simhashSignatures(
      docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    val refSigs = Dedup.simhashSignatures(
      docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text")
    val against = Dedup.simhashNearPairsAgainst(newSigs, refSigs,
        maxHamming = 3)
      .select("i", "j", "hamming").as[(Long, Long, Int)].collect()
    // i always from the new side, j from the corpus side
    assert(against.forall { case (i, j, _) => isNew(i) && !isNew(j) })
    val batchCross = Dedup.simhashNearPairs(
        Dedup.simhashSignatures(docs, "doc_id", "text"), maxHamming = 3)
      .select("i", "j", "hamming").as[(Long, Long, Int)].collect()
      .filter { case (i, j, _) => isNew(i) != isNew(j) }
    def unordered(ps: Seq[(Long, Long, Int)]) =
      ps.map { case (i, j, h) => (math.min(i, j), math.max(i, j), h) }.toSet
    assert(unordered(against.toSeq) == unordered(batchCross.toSeq))
    assert(against.nonEmpty, "fixture lost its planted cross-corpus dups")
  }

  test("dedupCorpusAgainst drops near-dups of the corpus, keeps novel docs, both modes agree") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((1L, base),
      (2L, (1 to 60).map(i => s"ref$i").mkString(" "))).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, base.replace("tok30", "edited")),        // near-dup of corpus 1
      (11L, (1 to 60).map(i => s"new$i").mkString(" "))) // novel
      .toDF("doc_id", "text")
    val (cleanExact, statsE) = Dedup.dedupCorpusAgainst(
      fresh, corpus, "doc_id", "text", threshold = 0.5)
    assert(cleanExact.select("doc_id").as[Long].collect().toSeq == Seq(11L))
    assert(statsE == Map("total" -> 2L, "kept" -> 1L, "removed" -> 1L))
    // forcing the LSH path (corpus over the exact limit) agrees
    val (cleanLsh, statsL) = Dedup.dedupCorpusAgainst(
      fresh, corpus, "doc_id", "text", threshold = 0.5,
      exactCorpusLimit = 1L)
    assert(cleanLsh.select("doc_id").as[Long].collect().toSeq == Seq(11L))
    assert(statsL("removed") == 1L)
  }

  test("embedding near-dup: exact and LSH-prefiltered agree on high-sim pairs") {
    val emb = Tables.load(spark, sf0, "embeddings")
    val exact = Dedup.embeddingNearDup(emb, threshold = 0.4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // LSH with few planes must recover a reasonable share of true pairs
    val lsh = Dedup.embeddingNearDup(emb, threshold = 0.4, useLsh = Some(true),
        nPlanes = 6)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // same verification threshold ⇒ no false pairs
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.2, s"recall $recall over ${exact.size}")
  }

  test("embedding near-dup auto mode switches to LSH above the row cutover") {
    val emb = Tables.load(spark, sf0, "embeddings")
    val exact = Dedup.embeddingNearDup(emb, threshold = 0.4, useLsh = Some(false))
      .select("i", "j").as[(Long, Long)].collect().toSet
    // cutover of 0 forces the auto path onto LSH for this 500-row corpus
    val auto = Dedup.embeddingNearDup(emb, threshold = 0.4, autoLshMinRows = 0L)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(auto.subsetOf(exact)) // LSH pre-filter + same verify threshold
    assert(auto.nonEmpty)
  }

  test("jaccardPairs caps hot-shingle buckets (scale-safe default)") {
    // 20 identical docs share one stop-shingle; with the cap below 20 the
    // bucket is dropped and the pipeline completes with zero pairs instead
    // of materializing one 20-doc row and emitting C(20,2) pairs
    val hot = (1L to 20L).map(i => (i, "aaa bbb ccc")).toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(hot, "doc_id", "text", n = 3,
      threshold = 0.5, maxShingleFreq = Some(5))
    assert(capped.isEmpty)
    val uncapped = Dedup.jaccardPairs(hot, "doc_id", "text", n = 3,
      threshold = 0.5, maxShingleFreq = None)
    assert(uncapped.count() == 190L) // C(20,2)
    // default cap (1000) leaves small corpora untouched
    val defaulted = Dedup.jaccardPairs(hot, "doc_id", "text", n = 3,
      threshold = 0.5)
    assert(defaulted.count() == 190L)
  }

  test("exact-mode jaccardPairs fails loudly past exactBucketCeiling") {
    // every doc shares one stop shingle -> one bucket holding all 20 docs;
    // with the ceiling below the bucket size the exact path must THROW,
    // never stream C(f,2) pairs from a single task
    val footer = "alpha beta gamma"
    val hot = (0 until 20).map(i => (i.toLong, s"unique$i token$i $footer"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.jaccardPairs(hot, "doc_id", "text", n = 3, threshold = 0.9,
        maxShingleFreq = None, exactBucketCeiling = 10).count()
    }
    assert(exceptionChain(e).exists(_.getMessage != null) &&
      exceptionChain(e).exists(m => Option(m.getMessage)
        .exists(_.contains("bucket overflow"))),
      s"expected bucket-overflow guidance, got: ${e.getMessage}")
    // below the ceiling the exact path is untouched
    val ok = Dedup.jaccardPairs(hot, "doc_id", "text", n = 3, threshold = 0.01,
      maxShingleFreq = None, exactBucketCeiling = 25)
    assert(ok.count() == 190L) // C(20,2)
  }

  test("exact-mode jaccardPairsAgainst fails loudly past exactBucketCeiling") {
    val footer = "alpha beta gamma"
    val corpus = (0 until 20).map(i => (i.toLong, s"unique$i token$i $footer"))
      .toDF("doc_id", "text")
    val fresh = Seq((100L, s"new words entirely $footer")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.jaccardPairsAgainst(fresh, corpus, "doc_id", "text", n = 3,
        threshold = 0.9, maxShingleFreq = None, exactBucketCeiling = 10).count()
    }
    assert(exceptionChain(e).exists(m => Option(m.getMessage)
      .exists(_.contains("posting overflow"))),
      s"expected posting-overflow guidance, got: ${e.getMessage}")
  }

  private def exceptionChain(e: Throwable): List[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toList

  test("connectedComponents labels dup clusters with their min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("i", "j")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents closes a 50-hop chain in <= 7 iterations") {
    // a -> b -> c -> ... drifting-template chain: 50 docs, each a near-dup
    // of the next; one-hop propagation needs 49 rounds, pointer doubling
    // must close it within the 7-round budget (d' = 2d + 2 per round)
    val pairs = (0L until 49L).map(i => (i, i + 1)).toDF("i", "j")
    val comp = Dedup.connectedComponents(pairs, maxIter = 7)
      .as[(Long, Long)].collect().toMap
    assert(comp.size == 50)
    assert(comp.values.toSet == Set(0L))
  }

  test("lshTuningCurve: endpoints exact, monotone, knee near " +
      "(1/bands)^(1/rows), matches the closed form, loud contracts") {
    val c = Dedup.lshTuningCurve(spark, bands = 16, rows = 4)
      .as[(Double, Double, Double)].collect().sortBy(_._1)
    assert(c.length == 101)
    assert(c.head == ((0.0, 0.0, 0.0)) && c.last == ((1.0, 1.0, 1.0)))
    assert(c.sliding(2).forall(p => p(1)._3 >= p(0)._3), "not monotone")
    // closed form within float tolerance (the chain IS the definition;
    // pow is only the reference here)
    c.foreach { case (s, _, p) =>
      assert(math.abs(p - (1 - math.pow(1 - math.pow(s, 4), 16))) < 1e-9,
        s"curve diverges from closed form at s=$s")
    }
    // the 50% knee sits near (1/16)^(1/4) ≈ 0.5
    val knee = c.find(_._3 >= 0.5).get._1
    assert(knee >= 0.4 && knee <= 0.6, s"knee at $knee")
    intercept[IllegalArgumentException] {
      Dedup.lshTuningCurve(spark, bands = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.lshTuningCurve(spark, gridPoints = 0)
    }
  }

  test("contaminationBySource: pair attribution — doc positions count, " +
      "benchmark-internal duplication doesn't, clean docs absent") {
    val docs = Seq(
      (1L, "a b c a b c"), // the window "a b c" at TWO positions
      (2L, "x y z")        // clean
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "a b c"),           // one window
      (200L, "a b c d a b c")    // "a b c" TWICE inside one benchmark
    ).toDF("bench_id", "text")
    val out = Dedup.contaminationBySource(docs, bench, "doc_id", "text",
        "bench_id", n = 3)
      .as[(Long, Long, Long)].collect().toSet
    // doc 1 hits both benchmarks at its 2 positions; the benchmark's
    // internal duplicate collapses (distinct side) — 2, not 4
    assert(out == Set((1L, 100L, 2L), (1L, 200L, 2L)), out.toString)
  }

  test("connectedComponentsIncremental: star-compressed warm start " +
      "equals the full recompute — merges, survivors, new nodes") {
    // old corpus: two components {1,2,3} (comp 1) and {7,9} (comp 7),
    // plus {20,21} (comp 20)
    val oldPairs = Seq((1L, 2L), (2L, 3L), (7L, 9L), (20L, 21L))
      .toDF("i", "j")
    val labels0 = Dedup.connectedComponents(oldPairs)
    // new pairs: merge the two first components through new node 50,
    // add a brand-new component {100, 101}; {20,21} untouched
    val newPairs = Seq((3L, 50L), (50L, 7L), (100L, 101L)).toDF("i", "j")
    val inc = Dedup.connectedComponentsIncremental(newPairs, labels0)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents(oldPairs.unionByName(newPairs))
      .as[(Long, Long)].collect().toMap
    assert(inc == full, s"$inc vs $full")
    assert(inc(9L) == 1L && inc(50L) == 1L, s"merge missed: $inc")
    assert(inc(21L) == 20L, s"untouched component moved: $inc")
    assert(inc(101L) == 100L, s"new component mislabeled: $inc")
    // a 50-hop OLD chain arrives star-compressed: the incremental
    // closure converges in ≤ 3 rounds where the cold one needs 7
    val chain = (0L until 49L).map(i => (i, i + 1)).toDF("i", "j")
    val chainLabels = Dedup.connectedComponents(chain, maxIter = 7)
    val inc2 = Dedup.connectedComponentsIncremental(
        Seq((49L, 60L)).toDF("i", "j"), chainLabels, maxIter = 3)
      .as[(Long, Long)].collect().toMap
    assert(inc2.size == 51 && inc2.values.toSet == Set(0L), s"$inc2")
  }

  test("connectedComponents throws loudly when unconverged at maxIter") {
    val pairs = (0L until 49L).map(i => (i, i + 1)).toDF("i", "j")
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, maxIter = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("keepClusterRepresentative keeps the best-scoring member per cluster") {
    val df = Seq(
      (1L, "aa"), (2L, "aaaa"), (3L, "aaa"), // cluster {1,2,3} → 2 (longest)
      (7L, "bb"), (9L, "bb"),                // cluster {7,9} tie → 7 (min id)
      (5L, "solo")                           // singleton passes through
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("i", "j")
    val out = Dedup
      .keepClusterRepresentative(df, "doc_id", length($"text"), pairs)
      .select("doc_id", "comp", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((2L, 1L, 3L), (7L, 7L, 2L), (5L, 5L, 1L)))
  }

  test("keepClusterRepresentative ties are deterministic under repartitioning") {
    // equal scores everywhere: the smallest id must win in every layout
    val df = (0L until 40L).map(i => (i, "same length text"))
      .toDF("doc_id", "text")
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("i", "j")
    val expected = (Set((0L, 0L, 20L)) ++
      (20L until 40L).map(i => (i, i, 1L))).toSet
    val plain = Dedup
      .keepClusterRepresentative(df, "doc_id", length($"text"), pairs)
      .select("doc_id", "comp", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    val shuffled = Dedup.keepClusterRepresentative(
        df.repartition(7), "doc_id", length($"text"), pairs.repartition(3))
      .select("doc_id", "comp", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(plain == expected)
    assert(shuffled == expected)
  }

  test("keepClusterRepresentative preserves the corpus schema plus labels") {
    val df = Seq((1L, "aaaa", "k1"), (2L, "aa", "k2"), (3L, "solo", "k3"))
      .toDF("doc_id", "text", "extra")
    val pairs = Seq((1L, 2L)).toDF("i", "j")
    val out = Dedup.keepClusterRepresentative(df, "doc_id",
      length($"text"), pairs)
    assert(out.columns.toSet ==
      Set("doc_id", "text", "extra", "comp", "cluster_size"))
    val kept = out.select("doc_id", "extra").as[(Long, String)].collect().toSet
    assert(kept == Set((1L, "k1"), (3L, "k3")))
  }

  test("membership sketch union ≡ single build, bit-for-bit") {
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val merged = Dedup.mergeMembershipSketches(
        Dedup.membershipSketch(docs, "text", $"doc_id" % 2,
          expectedKeysPerSlice = 10000L))
      .head()
    val single = Dedup.membershipSketch(docs, "text", lit(0),
        expectedKeysPerSlice = 10000L)
      .head().getAs[Array[Byte]]("sketch")
    assert(java.util.Arrays.equals(
      merged.getAs[Array[Byte]]("sketch"), single))
    assert(merged.getAs[Long]("n_docs") == a.count() + b.count())
  }

  test("membership sketch has no false negatives; mismatch unions throw") {
    val sketch = Dedup.mergeMembershipSketches(
        Dedup.membershipSketch(docs, "text", $"doc_id" % 4,
          expectedKeysPerSlice = 10000L))
      .head().getAs[Array[Byte]]("sketch")
    // every corpus text must probe true — Bloom rejects are definitive
    val missed = docs.filter(!graft.expressions.GraftExpressions
      .bloomMightContain(lit(sketch), xxhash64($"text"))).count()
    assert(missed == 0L)
    // geometry mismatch: different expectedKeys → different bit count
    val other = Dedup.membershipSketch(docs, "text", lit(0),
      expectedKeysPerSlice = 500L).select("sketch", "n_docs")
    val e = intercept[Exception] {
      Dedup.mergeMembershipSketches(
        Dedup.membershipSketch(docs, "text", lit(0),
          expectedKeysPerSlice = 10000L).select("sketch", "n_docs")
        .unionByName(other)).head()
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(10).exists(m => Option(m.getMessage)
        .exists(_.contains("SAME (expectedKeys, fpp)"))),
      s"expected geometry guidance, got: ${e.getMessage}")
  }

  test("exactAgainstBloom ≡ exactAgainst; dropSketchMembers keeps no true dup") {
    val newB = docs.filter($"doc_id" % 7 === 0)
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val sketch = Dedup.mergeMembershipSketches(
        Dedup.membershipSketch(corpus, "text", pmod($"doc_id", lit(3)),
          expectedKeysPerSlice = 10000L))
      .head().getAs[Array[Byte]]("sketch")
    val plain = Dedup.exactAgainst(newB, corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val routed = Dedup
      .exactAgainstBloom(newB, corpus, "doc_id", "text", sketch)
      .as[(Long, Long, Long)].collect().toSet
    assert(routed == plain)
    // serving mode: anything kept is definitely not in the corpus
    val kept = Dedup.dropSketchMembers(newB, "text", sketch)
    assert(Dedup.exactAgainst(kept, corpus, "doc_id", "text").isEmpty)
  }

  test("dedupCorpus removes transitive near-dup clusters, keeps representatives") {
    val (cleaned, stats) = Dedup.dedupCorpus(docs, "doc_id", "text",
      threshold = 0.5)
    assert(stats("total") == 500L)
    assert(stats("removed") > 0L && stats("removed") < 100L)
    assert(cleaned.count() == stats("kept"))
    // no surviving pair above the threshold
    val residual = Dedup.jaccardPairs(cleaned, "doc_id", "text", 3, 0.5)
    assert(residual.isEmpty)
  }

  test("dropDuplicates removes the higher-id side of each pair") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("i", "j")
    val out = Dedup.dropDuplicates(df, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("boilerplateSpans finds windows shared across documents, with counts") {
    val footer = "generated by acme corp all rights reserved contact legal dept"
    val df = Seq(
      (1L, s"unique alpha words one $footer"),
      (2L, s"other beta content two $footer"),
      (3L, s"third gamma text three $footer and a tail"),
      (4L, "completely unrelated text with no shared spans at all here"),
      (5L, "short")).toDF("doc_id", "text")
    val spans = Dedup.boilerplateSpans(df, "doc_id", "text", w = 10, minDocs = 3)
      .as[(String, Long, Long)].collect()
    // the 10-token footer appears once in each of docs 1-3
    assert(spans.exists(s => s._1 == footer && s._2 == 3L && s._3 == 3L))
    // nothing from the unrelated or too-short docs
    assert(spans.forall(s => s._1.split(" ").length == 10))
    // doc-repeated span does not inflate n_docs: "x y "*12 in ONE doc
    val rep = Seq((9L, Array.fill(24)("x y").mkString(" ")))
      .toDF("doc_id", "text")
    val repSpans = Dedup.boilerplateSpans(rep, "doc_id", "text",
      w = 4, minDocs = 2)
    assert(repSpans.isEmpty) // 1 distinct doc < minDocs, however many hits
  }

  test("contaminationHits flags only true 13-gram overlaps; decontaminate strips them") {
    val leak = (1 to 13).map(i => s"tok$i").mkString(" ")
    val train = Seq(
      (1L, s"clean document with its own words and nothing shared at all $leak"),
      (2L, "another clean document with completely different content here"),
      (3L, (1 to 12).map(i => s"tok$i").mkString(" "))) // only 12 shared → no hit
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"benchmark question stem $leak answer choices"))
      .toDF("doc_id", "text")
    val hits = Dedup.contaminationHits(train, bench, "doc_id", "text", n = 13)
      .as[(Long, Long, Long)].collect()
    assert(hits.toSeq == Seq((1L, 1L, 1L)))
    val kept = Dedup.decontaminate(train, bench, "doc_id", "text", n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
    // a doc repeating the leaked window counts each occurrence once per window
    val rep = Seq((7L, s"$leak padding words $leak")).toDF("doc_id", "text")
    val repHits = Dedup.contaminationHits(rep, bench, "doc_id", "text", n = 13)
      .as[(Long, Long, Long)].collect()
    assert(repHits.toSeq == Seq((7L, 2L, 1L)))
  }

  test("contaminationOverlap grades coverage and reports clean docs as rows") {
    val leak = (1 to 13).map(i => s"tok$i").mkString(" ")
    val train = Seq(
      (1L, s"one clean lead-in $leak"),            // 3 lead + 13 → 4 windows, 1 hit
      (2L, "totally clean words that never appear in any benchmark doc x y z a b"),
      (3L, "short doc"),                           // < 13 tokens → 0 windows
      (4L, leak))                                  // exactly the window → frac 1.0
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"stem $leak tail")).toDF("doc_id", "text")
    val got = Dedup.contaminationOverlap(train, bench, "doc_id", "text", n = 13)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "every training doc is a row")
    assert(got(1L) == ((1L, 4L, 1L, 0.25)))
    assert(got(2L)._3 == 0L && got(2L)._4 == 0.0)
    assert(got(3L) == ((3L, 0L, 0L, 0.0)))
    assert(got(4L) == ((4L, 1L, 1L, 1.0)))
    // the binary verdict agrees: hit docs here == docs contaminationHits flags
    val flagged = Dedup.contaminationHits(train, bench, "doc_id", "text", n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(got.filter(_._2._3 > 0).keySet == flagged)
  }

  test("boilerplateSpans hashExchange mode returns the identical span set") {
    val default = Dedup.boilerplateSpans(docs, "doc_id", "text",
        w = 8, minDocs = 3)
      .as[(String, Long, Long)].collect().toSet
    val hashed = Dedup.boilerplateSpans(docs, "doc_id", "text",
        w = 8, minDocs = 3, hashExchange = true)
      .as[(String, Long, Long)].collect().toSet
    assert(default.nonEmpty && hashed == default)
  }

  test("stripBoilerplate removes flagged spans surgically and keeps the docs") {
    val footer = "generated by acme corp all rights reserved contact legal dept"
    val df = Seq(
      (1L, s"unique alpha words one $footer"),
      (2L, s"other beta content two $footer"),
      (3L, s"third gamma text three $footer and a tail"),
      (4L, "completely unrelated text with no shared spans at all here"),
      (5L, "short")).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(df, "doc_id", "text", w = 10, minDocs = 3)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    // the footer's 10 tokens vanish; each doc's own prose survives
    assert(out(1L) == "unique alpha words one")
    assert(out(2L) == "other beta content two")
    assert(out(3L) == "third gamma text three and a tail")
    // untouched docs come back whitespace-normalized but otherwise intact
    assert(out(4L) == "completely unrelated text with no shared spans at all here")
    assert(out(5L) == "short")
  }

  test("stripBoilerplate unions overlapping flagged windows and empties covered docs") {
    // w=2, minDocs=3: both "a b" and "b c" flagged → doc of "a b c" loses
    // all three tokens (overlap unions), not just one window
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (4L, "x a b y"), (5L, "")).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(df, "doc_id", "text", w = 2, minDocs = 3)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "" && out(2L) == "" && out(3L) == "")
    assert(out(4L) == "x y") // only the flagged "a b" window is covered
    assert(out(5L) == "")
  }

  test("stripBoilerplate relational mode matches the compiled kernel mode") {
    val kernel = Dedup.stripBoilerplate(docs, "doc_id", "text",
        w = 8, minDocs = 3)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    val relational = Dedup.stripBoilerplate(docs, "doc_id", "text",
        w = 8, minDocs = 3, relational = Some(true))
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(kernel.nonEmpty && kernel == relational)
    // at least one doc actually changed on the golden corpus data
    val changed = docs.select("doc_id", "text").as[(Long, String)].collect()
      .count { case (id, text) =>
        kernel(id) != text.trim.replaceAll("\\s+", " ") }
    assert(changed > 0, "no doc was rewritten — fixture lost its planted spans")
  }

  test("stripBoilerplate auto mode cuts over to relational when the flagged set overflows") {
    // high-duplication corpus: every doc shares a 10-token footer, so
    // w=4/minDocs=3 flags 12 windows; relationalCutover=3 forces the
    // overflow path without needing a >1M-span corpus in a unit test
    val footer = "shared footer tokens one two three four five six seven"
    val df = (0 until 8).map(i =>
      (i.toLong, s"doc $i unique words here $footer")).toDF("doc_id", "text")
    val auto = Dedup.stripBoilerplate(df, "doc_id", "text",
      w = 4, minDocs = 3, relationalCutover = 3L)
    // overflow ⇒ the auto plan is the relational rewrite (it shuffles);
    // the kernel mode is plan-asserted Exchange-free in the map-only test
    assert(auto.queryExecution.executedPlan.toString.contains("Exchange"),
      "auto mode did not cut over to the relational rewrite")
    // ... and the two modes agree on the answer (memory placement only)
    val kernel = Dedup.stripBoilerplate(df, "doc_id", "text",
        w = 4, minDocs = 3, relational = Some(false))
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    val out = auto.select("doc_id", "clean_text")
      .as[(Long, String)].collect().toMap
    assert(out == kernel && out.values.forall(!_.contains("footer")))
    // under the default roomy cutover the same corpus stays map-only
    val roomy = Dedup.stripBoilerplate(df, "doc_id", "text",
      w = 4, minDocs = 3)
    assert(!roomy.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("releaseStripCaches hands back the auto overflow path's persisted frames") {
    val footer = "shared footer tokens one two three four five six seven"
    val df = (0 until 8).map(i =>
      (i.toLong, s"doc $i unique words here $footer")).toDF("doc_id", "text")
    // a DIFFERENT reference frame for the Against form: the CacheManager
    // dedups identical canonicalized plans, so flagging from the same df
    // would share one cache entry and hide the second registration
    val ref = ((0 until 8).map(i =>
      (i.toLong, s"doc $i unique words here $footer")) :+
      (99L, s"extra reference doc $footer")).toDF("doc_id", "text")
    def cachedCount() = spark.sparkContext.getPersistentRDDs.size
    Dedup.releaseStripCaches(blocking = true) // clean slate
    val before = cachedCount()
    // overflow on BOTH operators: each registers one persisted probe frame
    Dedup.stripBoilerplate(df, "doc_id", "text",
      w = 4, minDocs = 3, relationalCutover = 3L).count()
    Dedup.stripBoilerplateAgainst(df, ref, "doc_id", "text",
      w = 4, minDocs = 3, relationalCutover = 3L).count()
    assert(cachedCount() >= before + 2,
      s"expected 2 new persisted frames, before=$before now=${cachedCount()}")
    Dedup.releaseStripCaches(blocking = true)
    assert(cachedCount() <= before,
      s"release left cached RDDs: before=$before now=${cachedCount()}")
    // idempotent on an empty registry
    Dedup.releaseStripCaches()
  }

  test("boilerplateHashes overflow fails loudly with distributed-path guidance") {
    val footer = "shared footer tokens one two three four five six seven"
    val df = (0 until 8).map(i =>
      (i.toLong, s"doc $i unique words here $footer")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.boilerplateHashes(df, "doc_id", "text", w = 4, minDocs = 3,
        maxHashes = 3L)
    }
    assert(e.getMessage.contains("stay distributed"),
      s"overflow message must carry guidance, got: ${e.getMessage}")
    // the pinned kernel mode surfaces the same loud failure (no driver OOM)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.stripBoilerplate(df, "doc_id", "text", w = 4, minDocs = 3,
        relational = Some(false), relationalCutover = 3L)
    }
    assert(e2.getMessage.contains("stay distributed"))
    // in-bounds behavior is unchanged: the full sorted flagged set
    val hashes = Dedup.boilerplateHashes(df, "doc_id", "text",
      w = 4, minDocs = 3)
    assert(hashes.nonEmpty && hashes.toSeq == hashes.toSeq.sorted
      && hashes.distinct.length == hashes.length)
  }

  test("stripBoilerplate rewrite pass is map-only (no reassembly shuffle)") {
    val out = Dedup.stripBoilerplate(docs, "doc_id", "text", w = 8, minDocs = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"rewrite plan must be a pure projection over the scan:\n$plan")
  }

  test("dropBoilerplateDocs strips documents carrying flagged spans") {
    val footer = "generated by acme corp all rights reserved contact legal dept"
    val df = Seq(
      (1L, s"unique alpha words one $footer"),
      (2L, s"other beta content two $footer"),
      (3L, s"third gamma text three $footer"),
      (4L, "completely unrelated text with no shared spans at all here"))
      .toDF("doc_id", "text")
    val spans = Dedup.boilerplateSpans(df, "doc_id", "text", w = 10, minDocs = 3)
    val kept = Dedup.dropBoilerplateDocs(df, spans, "doc_id", "text", w = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(4L))
  }

  test("dropBoilerplateDocs maxSpans counts DISTINCT spans, not repeats") {
    val s1 = "one two three four"
    val s2 = "five six seven eight"
    val df = Seq(
      (1L, s"$s1 x $s1 y"),   // span s1 twice, ONE distinct flagged span
      (2L, s"$s1 z $s2 w"))   // two distinct flagged spans
      .toDF("doc_id", "text")
    val spans = Seq(s1, s2).toDF("span")
    val kept = Dedup.dropBoilerplateDocs(df, spans, "doc_id", "text",
        w = 4, maxSpans = 2)
      .select("doc_id").as[Long].collect().toSet
    // only doc 2 contains >= 2 of the GIVEN spans
    assert(kept == Set(1L))
  }

  // ------------------------------------------------ exact substring dedup
  test("substringDupStats measures cross-document window duplication") {
    // shared passage is aperiodic vs the 25-char stride, so its three
    // windows (rel 0/25/50) are pairwise distinct strings; doc-unique
    // parts come from disjoint alphabets so no accidental cross-matches
    val shared = (0 until 100).map(_ % 7).mkString
    val docA = shared + "a" * 100    // shared at chars 1..100
    val docB = "b" * 100 + shared    // shared at chars 101..200 (25-aligned)
    val docC = "c" * 200             // no cross-doc content
    val docD = "short"               // < w: no windows, absent from output
    val df = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
    val out = Dedup.substringDupStats(df, "doc_id", "text", w = 50, stride = 25)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // 200 chars -> window starts 1,26,...,151 = 7; the 3 fully-shared
    // windows are duplicated in both carriers
    assert(out(1L) == ((7L, 3L, 0.428571)))
    assert(out(2L) == ((7L, 3L, 0.428571)))
    assert(out(3L) == ((7L, 0L, 0.0)))
  }

  test("substringDupStats ignores intra-document repeats (minDocs counts DISTINCT docs)") {
    val p = (0 until 50).map(_ % 7).mkString
    val df = Seq((1L, p + p), (2L, "z" * 80)).toDF("doc_id", "text")
    // both docs repeat a window INTERNALLY; no window crosses documents
    val out = Dedup.substringDupStats(df, "doc_id", "text", w = 50, stride = 25)
    assert(out.filter(col("n_dup_windows") > 0).isEmpty)
  }

  test("dropSubstringDups strips docs over the threshold and keeps short docs") {
    val shared = (0 until 100).map(_ % 7).mkString
    val df = Seq(
      (1L, shared + "a" * 100),   // dup_frac 3/7 ~ 0.43
      (2L, "b" * 100 + shared),
      (3L, "c" * 200),            // 0.0
      (4L, "short"))              // windowless: always kept
      .toDF("doc_id", "text")
    val kept = Dedup.dropSubstringDups(df, "doc_id", "text", maxFrac = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
    val keptAll = Dedup.dropSubstringDups(df, "doc_id", "text", maxFrac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptAll == Set(1L, 2L, 3L, 4L))
  }

  test("stripBoilerplateAgainst cuts reference spans only, kernel ≡ relational") {
    val footer = "generated by acme corp all rights reserved contact legal dept"
    val reference = Seq(
      (1L, s"unique alpha words one $footer"),
      (2L, s"other beta content two $footer"),
      (3L, s"third gamma text three $footer")).toDF("doc_id", "text")
    // a batch-internal template repeated across the batch must SURVIVE:
    // only reference boilerplate is flagged
    val tmpl = "batch internal template phrase repeated across the fresh batch"
    val batch = Seq(
      (10L, s"fresh arriving page $footer and more prose"),
      (11L, s"$tmpl with trailing one"),
      (12L, s"$tmpl with trailing two"),
      (13L, s"$tmpl with trailing three"))
      .toDF("doc_id", "text")
    val kernel = Dedup.stripBoilerplateAgainst(batch, reference,
        "doc_id", "text", w = 10, minDocs = 3)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(kernel(10L) == "fresh arriving page and more prose")
    assert(kernel(11L) == s"$tmpl with trailing one")
    val relational = Dedup.stripBoilerplateAgainst(batch, reference,
        "doc_id", "text", w = 10, minDocs = 3, relational = Some(true))
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(relational == kernel)
    // and forced-kernel mode agrees too
    val forced = Dedup.stripBoilerplateAgainst(batch, reference,
        "doc_id", "text", w = 10, minDocs = 3, relational = Some(false))
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(forced == kernel)
  }

  test("substringDupStatsAgainst scores new docs against the corpus only") {
    val shared = (0 until 100).map(_ % 7).mkString          // digits 0-6
    val newOnly = (0 until 100).map(i => ('g' + i % 7).toChar).mkString
    val corpus = Seq((100L, shared + "x" * 50)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, shared + "a" * 100),    // 3 of 7 windows in the corpus
      (2L, "b" * 100 + shared),    // shared 25-aligned at the tail: 3 of 7
      (3L, "c" * 200),             // nothing shared: 0 of 7
      (4L, "short"),               // < w: no windows, absent from output
      (5L, newOnly + "d" * 100),   // new×new duplication must NOT count
      (6L, "e" * 100 + newOnly))
      .toDF("doc_id", "text")
    val out = Dedup.substringDupStatsAgainst(batch, corpus, "doc_id", "text",
        w = 50, stride = 25)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L, 6L))
    assert(out(1L) == ((7L, 3L, 0.428571)))
    assert(out(2L) == ((7L, 3L, 0.428571)))
    assert(out(3L) == ((7L, 0L, 0.0)))
    assert(out(5L) == ((7L, 0L, 0.0)))
    assert(out(6L) == ((7L, 0L, 0.0)))
  }

  test("substringDupStatsAgainst minCorpusDocs counts DISTINCT corpus docs") {
    val common = (0 until 100).map(_ % 7).mkString     // in 2 corpus docs
    val rare = (0 until 100).map(i => ('g' + i % 7).toChar).mkString // in 1
    val corpus = Seq(
      (100L, common + "x" * 50),
      (101L, "y" * 50 + common),   // distinct doc, same windows (aligned)
      (102L, rare + rare)          // ONE doc repeating rare internally
    ).toDF("doc_id", "text")
    // 150 chars of payload: windows at 1,26,51 from the leading passage
    val probe = Seq((1L, common + "a" * 100), (2L, rare + "a" * 100))
      .toDF("doc_id", "text")
    val out = Dedup.substringDupStatsAgainst(probe, corpus, "doc_id", "text",
        w = 50, stride = 25, minCorpusDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 3L)   // common: 2 distinct corpus carriers
    assert(out(2L) == 0L)   // rare: 1 corpus doc (intra-doc repeat ignored)
  }

  test("dropSubstringDupsAgainst strips corpus-covered docs, keeps short ones") {
    val shared = (0 until 100).map(_ % 7).mkString
    val corpus = Seq((100L, shared + "x" * 50)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, shared + "a" * 100),    // 3/7 ~ 0.43 against the corpus
      (3L, "c" * 200),
      (4L, "short"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropSubstringDupsAgainst(batch, corpus, "doc_id", "text",
        maxFrac = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
  }

  test("dedupEval: hand vector; orientation/duplicate invariance; " +
      "null ratios on empty inputs") {
    import org.apache.spark.sql.functions._
    val pred = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("i", "j")
    val truth = Seq((2L, 1L), (3L, 4L), (7L, 8L)).toDF("i", "j")
    val r = Dedup.dedupEval(pred, truth).collect()(0)
    // tp = {1,2},{3,4}; fp = {5,6}; fn = {7,8}
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 3L, 2L, 1L, 1L)), r.toString)
    assert(r.getDouble(5) == 2.0 / 3 && r.getDouble(6) == 2.0 / 3 &&
      r.getDouble(7) == 2.0 / 3)
    // flipped orientations + duplicated rows + self-pairs score the same
    val messy = Seq((2L, 1L), (1L, 2L), (4L, 3L), (6L, 5L), (9L, 9L))
      .toDF("i", "j")
    val r2 = Dedup.dedupEval(messy, truth).collect()(0)
    assert(r2.getLong(0) == 3L && r2.getLong(2) == 2L, r2.toString)
    // empty predictions: precision/f1-denominator semantics
    val empty = pred.filter(lit(false))
    val r3 = Dedup.dedupEval(empty, truth).collect()(0)
    assert(r3.getLong(0) == 0L && r3.getLong(2) == 0L &&
      r3.isNullAt(5) && r3.getDouble(6) == 0.0, r3.toString)
    val r4 = Dedup.dedupEval(pred, empty).collect()(0)
    assert(r4.getLong(1) == 0L && r4.isNullAt(6), r4.toString)
  }
}
