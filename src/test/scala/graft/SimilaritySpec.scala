package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sf0, "embeddings").cache()

  test("cosine on hand-constructed vectors") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, df.filter($"vec_id" === 1), k = 3)
      .orderBy("rank").select("corpus_id").as[Long].collect()
    // nearest to (1,0): (2,0) sim 1.0, then (1,1) sim .707, then (0,1) sim 0
    assert(top.sameElements(Array(4L, 3L, 2L)))
  }

  test("brute-force top-k returns k rows per query with ranks 1..k") {
    val out = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3), k = 5)
    assert(out.count() == 15)
    assert(out.groupBy("query_id").agg(max("rank")).as[(Long, Int)]
      .collect().forall(_._2 == 5))
    assert(out.filter($"sim" > 1.000001 || $"sim" < -1.000001).isEmpty)
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 8)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    // random embeddings are a worst case for IVF; nprobe=8/16 should still
    // recover half the true neighbors
    assert(recall >= 0.4, s"recall $recall")
  }

  test("Lloyd-trained centroids strictly improve IVF recall on clustered data") {
    // IVF training exists for corpora WITH cluster structure; the testdata
    // embeddings are near-uniform on the sphere, where recall@fixed-nprobe
    // is a misleading metric (skewed first-N cells scan a LARGER corpus
    // fraction per probe, inflating recall at hidden extra cost — measured
    // in the objective test below). This corpus plants 16 deterministic
    // clusters (hash-derived centers and perturbations, no RNG): the
    // workload quantizers are for, and where trained cells must win.
    def h(x: Long): Double = {
      var z = x * 0x9E3779B97F4A7C15L
      z ^= (z >>> 29); z *= 0xBF58476D1CE4E5B9L; z ^= (z >>> 32)
      ((z & 0xFFFFFL).toDouble / 0xFFFFF.toLong) * 2.0 - 1.0
    }
    val dim = 32
    // BLOCK-assigned clusters (i/32): the first-N seed takes its 16
    // centroids from cluster 0 alone — the degenerate init real corpora
    // produce when ingest order correlates with content — so the
    // untrained quantizer is blind to 15 of 16 clusters and training has
    // something real to recover
    val rows = (0L until 512L).map { i =>
      val cl = i / 32
      val v = Array.tabulate(dim)(d => (h(cl * 97 + d) + 0.8 * h(i * 131 + d)).toFloat)
      (i, v.toSeq)
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val queries = clustered.filter($"vec_id" % 37 === 0) // spread over clusters
    val exact = Similarity.bruteForceTopK(clustered, queries, k = 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    def recall(trainIters: Int): Double = {
      val got = Similarity.ivfTopK(clustered, queries, k = 10, nlist = 16,
          nprobe = 2, trainIters = trainIters)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      exact.count(got.contains).toDouble / exact.size
    }
    val untrained = recall(0)
    val trained = recall(3)
    // deterministic data + deterministic training ⇒ fixed numbers, not a flake
    assert(trained > untrained,
      s"trained recall $trained !> first-N recall $untrained")
  }

  test("Lloyd training strictly improves the quantization objective on real embeddings") {
    // what Lloyd provably optimizes: mean cosine of each vector to its
    // assigned centroid. On the near-uniform testdata embeddings this is
    // the honest metric (see the clustered-recall test for why raw
    // recall@nprobe is not): measured 0.245 → 0.330 at nlist=16.
    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(emb, cents).join(cents, "centroid_id")
        .select(avg(Similarity.cosine($"cv", $"centroid"))).as[Double].head()
    val untrained = objective(Similarity.centroids(emb, 16))
    val trained = objective(Similarity.trainCentroids(emb, 16, iters = 3))
    assert(trained > untrained + 0.05,
      s"objective $trained !>> $untrained")
  }

  test("ivfAssign kernel bit-matches the crossJoin+window formulation") {
    import org.apache.spark.sql.expressions.Window
    val cents = Similarity.trainCentroids(emb, nlist = 16, iters = 1)
    for (metric <- Seq("cosine", "l2")) {
      val kernel = Similarity.ivfAssign(emb, cents, metric = metric)
        .select("corpus_id", "centroid_id").as[(Long, Long)].collect().toMap
      val c = emb.select($"vec_id".as("corpus_id"),
        $"embedding".cast("array<double>").as("cv"))
      val (scoreCol, ord) =
        if (metric == "cosine")
          (Similarity.cosine($"cv", $"centroid"), $"csim".desc)
        else (graft.expressions.GraftExpressions
          .l2DistanceSq($"cv", $"centroid"), $"csim".asc)
      val w = Window.partitionBy("corpus_id").orderBy(ord, $"centroid_id")
      val windowed = c.crossJoin(broadcast(cents))
        .select($"corpus_id", $"centroid_id", scoreCol.as("csim"))
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select("corpus_id", "centroid_id").as[(Long, Long)].collect().toMap
      assert(kernel == windowed, s"metric=$metric")
    }
  }

  test("Lloyd training is bit-deterministic and keeps empty cells alive") {
    val a = Similarity.trainCentroids(emb, nlist = 16, iters = 3)
      .orderBy("centroid_id").as[(Long, Seq[Double])].collect()
    val b = Similarity.trainCentroids(
        emb.repartition(7), nlist = 16, iters = 3) // different partitioning
      .orderBy("centroid_id").as[(Long, Seq[Double])].collect()
    assert(a.length == 16 && a.forall(_._2.length == 64))
    // decimal-exact dimension means ⇒ identical bits across partitionings
    assert(a.zip(b).forall { case ((i1, v1), (i2, v2)) =>
      i1 == i2 && v1 == v2 })
    // centroid ids are re-numbered 0..nlist-1 (means, not corpus vectors)
    assert(a.map(_._1).toSeq == (0L until 16L))
  }

  test("PQ: codes compress to m small ids and encoding is deterministic") {
    val books = Similarity.pqTrain(emb, m = 8, k = 16, iters = 2)
    assert(books.count() == 8 * 16)
    val codes = Similarity.pqEncode(emb, books)
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(codes.length == emb.count())
    assert(codes.forall(_._2.length == 8)) // 64 floats → 8 codes
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 16)))
    val again = Similarity.pqEncode(emb.repartition(5), books)
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(codes.toSeq == again.toSeq) // partitioning-independent
  }

  test("PQ top-k with exact re-rank recalls most true neighbors") {
    val queries = emb.filter($"vec_id" < 15)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(emb, queries, k = 10, m = 8,
        codebookSize = 16, rerank = 8)
      .select("query_id", "rank", "corpus_id", "sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(pq.length == 150) // k rows per query
    val recall = exact.count(pq.map(r => (r._1, r._3)).toSet.contains)
      .toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // re-ranked sims are EXACT cosines: spot-check one against brute force
    val bf = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "corpus_id", "sim")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pq.foreach { case (q, _, c, s) =>
      bf.get((q, c)).foreach(exactSim => assert(exactSim == s)) }
  }

  test("IVF-PQ composed index prunes by cell, ADC-scores, re-ranks exactly") {
    val queries = emb.filter($"vec_id" < 15)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "corpus_id", "sim")
      .as[(Long, Long, Double)].collect()
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 10,
        nlist = 8, nprobe = 6, m = 8, codebookSize = 16, rerank = 8)
      .select("query_id", "rank", "corpus_id", "sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(ivfpq.length == 150) // k rows per query, ranks complete
    assert(ivfpq.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == (1 to 10)))
    val recall = exactSet.count(ivfpq.map(r => (r._1, r._3)).toSet.contains)
      .toDouble / exactSet.size
    assert(recall >= 0.4, s"recall $recall") // prunes cells AND codes
    // output sims are EXACT cosines wherever they overlap brute force
    val bf = exact.map(r => (r._1, r._2) -> r._3).toMap
    ivfpq.foreach { case (q, _, c, s) =>
      bf.get((q, c)).foreach(exactSim => assert(exactSim == s)) }
    // determinism: a repartitioned corpus yields the identical result set
    val again = Similarity.ivfPqTopK(emb.repartition(13), queries, k = 10,
        nlist = 8, nprobe = 6, m = 8, codebookSize = 16, rerank = 8)
      .select("query_id", "rank", "corpus_id", "sim")
      .as[(Long, Int, Long, Double)].collect()
    assert(again.toSet == ivfpq.toSet)
  }

  test("semanticNearDupPairs finds within-cluster duplicates; semanticDedup keeps one per group") {
    // 3 semantic groups of 3 near-identical vectors each; ids 0..2 are
    // one member per group, so the first-N centroid seed covers all
    // groups and every member assigns to its own group's cluster
    val rows = (0 until 9).map { i =>
      val g = i % 3
      val v = Array.fill(8)(0.0f)
      v(g) = 1.0f
      v(3 + i % 5) = v(3 + i % 5) + 0.01f // tiny member-specific wiggle
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDupPairs(df, nClusters = 3,
        threshold = 0.95, trainIters = 0)
      .as[(Long, Long, Double)].collect()
    // every pair is intra-group (ids ≡ mod 3), each group has C(3,2)=3
    assert(pairs.length == 9, s"got ${pairs.toSeq}")
    assert(pairs.forall { case (i, j, s) => i % 3 == j % 3 && s >= 0.95 })
    val kept = Similarity.semanticDedup(df, nClusters = 3,
        threshold = 0.95, trainIters = 0)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L)) // min id per semantic group
    // trained mode agrees on this well-separated data
    val keptTrained = Similarity.semanticDedup(df, nClusters = 3,
        threshold = 0.95, trainIters = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(keptTrained == kept)
  }

  test("semanticNearDupPairsAgainst matches new vectors to reference cells only") {
    // reference: 3 well-separated groups of 2; new batch: one near-dup
    // of group 1, one near-dup of group 2, one novel direction
    def vec(axis: Int, wiggle: Int): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(axis) = 1.0f
      v(4 + wiggle % 4) = v(4 + wiggle % 4) + 0.01f; v
    }
    val reference = Seq(
      (10L, vec(0, 0)), (11L, vec(0, 1)),
      (20L, vec(1, 0)), (21L, vec(1, 1)),
      (30L, vec(2, 0)), (31L, vec(2, 1))).toDF("vec_id", "embedding")
    val novel = Array.fill(8)(0.0f); novel(3) = 1.0f
    val newBatch = Seq(
      (100L, vec(0, 2)), (200L, vec(1, 3)), (300L, novel))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDupPairsAgainst(
        newBatch, reference, nClusters = 6, threshold = 0.95)
      .as[(Long, Long, Double)].collect()
    // every pair maps a new id to ITS group's reference members, and the
    // novel vector pairs with nothing
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (i, j, s) =>
      (i == 100L && Set(10L, 11L)(j) || i == 200L && Set(20L, 21L)(j)) &&
        s >= 0.95 })
    assert(pairs.map(_._1).toSet == Set(100L, 200L))
    // the dedup facade keeps exactly the novel arrival
    val kept = Similarity.semanticDedupAgainst(
        newBatch, reference, nClusters = 6, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(300L))
  }

  test("SemDeDup auto mode sizes clusters from the corpus and matches the explicit call") {
    // sizing formula: ceil(n / target) floored at 16, deterministic
    val target = Similarity.SemDeDupTargetClusterSize
    assert(target == 300L)
    val tiny = (0 until 9).map { i =>
      val v = Array.fill(8)(0.0f); v(i % 3) = 1.0f; (i.toLong, v)
    }.toDF("vec_id", "embedding")
    assert(Similarity.semanticAutoClusters(tiny) == 16) // floor
    // 10k vectors, each direction appearing exactly twice (id % 5000):
    // hash-valued dims make cross-direction cosines land well below the
    // 0.9999 bar, so the expected pair set is the 5000 exact-dup twins
    // plus at most a handful of hash coincidences — small enough to
    // collect, big enough that auto sizing (34 clusters) really engages
    val big = spark.range(10000).select(col("id").as("vec_id"),
      array(Seq.tabulate(8)(d =>
        pmod(xxhash64(col("id") % 5000, lit(d)), lit(1000L)).cast("float")): _*)
        .as("embedding"))
    assert(Similarity.semanticAutoClusters(big) == 34) // ceil(10000/300)
    // default-arg call == explicit call at the auto-derived count, so the
    // auto path changes WHO picks the knob, not the operator's answer
    val auto = Similarity.semanticNearDupPairs(big, threshold = 0.9999)
      .as[(Long, Long, Double)].collect().toSet
    val explicit = Similarity.semanticNearDupPairs(big, nClusters = 34,
      threshold = 0.9999).as[(Long, Long, Double)].collect().toSet
    assert(auto == explicit)
    // every twin pair (i, i+5000) is an exact duplicate: same vector ⇒
    // same cluster ⇒ the within-cluster scan must surface all of them
    val twins = auto.filter { case (i, j, _) => j == i + 5000L }
    assert(twins.size == 5000, s"got ${twins.size} twin pairs")
  }

  test("hyperplane LSH buckets group cosine-similar vectors") {
    val df = Seq(
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.fill(8)(0.99f)), // same direction as 1
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val cands = Similarity.lshBucketCandidates(df, nPlanes = 8)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
  }

  test("knnLabelVote predicts by majority with the deterministic tie-break") {
    // query 1 (label 0) has 3 class-0 neighbors clustered around it and
    // 2 class-1 vectors further off: 5-NN vote 3:2 → predicted 0.
    // query 10 (label 9, mislabeled on purpose) sits IN the class-1
    // cluster → predicted 1, correct = false.
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (3L, Array(0.9f, -0.1f, 0f, 0f), 0),
      (4L, Array(1f, 0.05f, 0f, 0f), 0),
      (5L, Array(0f, 1f, 0f, 0f), 1),
      (6L, Array(0.1f, 1f, 0f, 0f), 1),
      (7L, Array(-0.1f, 1f, 0f, 0f), 1),
      (10L, Array(0.05f, 1f, 0f, 0f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelVote(vecs,
        vecs.filter(col("vec_id") === 1L || col("vec_id") === 10L), k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2),
        r.getBoolean(3)))).toMap
    assert(out(1L) == ((0, 0, true)))
    assert(out(10L) == ((9, 1, false)))
  }

  test("knnLabelVote neighbor source is pluggable: brute ≡ ivf candidates at recall=1") {
    // at nprobe == nlist every cell is probed, so IVF candidate
    // generation is exhaustive (recall 1) and the votes must elect the
    // same winners as the brute-force sweep — the documented
    // billion-vector swap, now an argument instead of a code edit
    val emb = Tables.load(spark, sf0, "embeddings")
    val queries = emb.filter(col("vec_id") < 40)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    val brute = asMap(Similarity.knnLabelVote(emb, queries, k = 5))
    val viaCandidates = asMap(Similarity.knnLabelVote(emb, queries, k = 5,
      candidates = Some(Similarity.ivfTopK(emb, queries, k = 5,
        nlist = 4, nprobe = 4))))
    assert(brute == viaCandidates && brute.nonEmpty)
    // the strategy flag routes to the same machinery (defaults differ in
    // recall, so just assert it runs and covers every query)
    val viaIvf = asMap(Similarity.knnLabelVote(emb, queries, k = 5,
      strategy = "ivf"))
    assert(viaIvf.keySet == brute.keySet)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnLabelVote(emb, queries, k = 5, strategy = "annoy")
    }
    assert(e.getMessage.contains("unknown neighbor strategy"))
  }

  test("labelMargin: best same/other-label cosine, NULL for singleton labels") {
    // axis-aligned plants: 1 and 2 share label 0 and direction (cos 1.0);
    // 3 (label 1) is oblique to both; 4 is label 2's only vector
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(2f, 0f, 0f, 0f), 0),
      (3L, Array(1f, 1f, 0f, 0f), 1),
      (4L, Array(0f, 0f, 1f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelMargin(vecs, vecs)
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4))))).toMap
    // 1: same-label best = cos(1,2) = 1.0; other best = cos(1,3) = √2/2
    assert(out(1L) == ((Some(1.0), Some(0.707107), Some(true))))
    assert(out(2L) == ((Some(1.0), Some(0.707107), Some(true))))
    // 3: no same-label partner → NULL same side, NULL verdict
    assert(out(3L)._1.isEmpty && out(3L)._3.isEmpty)
    assert(out(3L)._2 == Some(0.707107))
    // 4: orthogonal to everything → other best is 0, loses by NULL
    assert(out(4L) == ((None, Some(0.0), None)))
  }

  test("hardNegatives: other-label only, ranked by cosine, matches a " +
      "plain-Scala reference") {
    val out = Similarity.hardNegatives(emb,
        emb.filter($"vec_id" < 20), k = 3)
      .as[(Long, String, Int, Long, String, Double)].collect()
    assert(out.nonEmpty)
    // never the query's own label, never itself
    out.foreach { case (qid, ql, _, cid, nl, _) =>
      assert(ql != nl, s"query $qid got same-label negative $cid")
      assert(qid != cid)
    }
    // per query: ranks are 1..k with non-increasing sims
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to byRank.size))
      assert(byRank.map(_._6).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      }, s"query $qid sims not ranked")
    }
    // top-1 parity with an independent Scala argmax on unrounded sims
    val vecs = emb.select($"vec_id", $"label",
        $"embedding".cast("array<double>"))
      .as[(Long, String, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.size) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val top1 = out.filter(_._3 == 1).map(r => r._1 -> r._4).toMap
    vecs.filter(_._1 < 20).foreach { case (qid, ql, qv) =>
      val best = vecs.filter(v => v._1 != qid && v._2 != ql)
        .map(v => (v._1, cos(v._3, qv)))
        .minBy { case (id, s) => (-s, id) }._1
      assert(top1(qid) == best, s"query $qid: top-1 ${top1(qid)} != $best")
    }
  }

  test("randomProjection matches the driver-side reference bit-for-bit " +
      "and is partitioning-invariant") {
    val out = Similarity.randomProjection(emb, inDim = 64, outDim = 16)
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // independent reference: same sign derivation, plain Scala left fold
    val signs = Similarity.projectionSigns("rp", 16, 64)
    val raw = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    assert(raw.nonEmpty)
    raw.foreach { case (id, v) =>
      (0 until 16).foreach { k =>
        var acc = 0.0
        var j = 0
        while (j < 64) { acc += v(j) * signs(k)(j); j += 1 }
        val expected = acc / math.sqrt(16.0)
        assert(out((id, k)) == expected,
          s"vec $id comp $k: ${out((id, k))} != $expected")
      }
    }
    // stable under repartitioning (pure projection, no shuffle state)
    val again = Similarity.randomProjection(emb.repartition(7),
      inDim = 64, outDim = 16).as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(again == out)
    // a mismatched vector length refuses loudly (zip_with would
    // silently null-pad, and an oracle's list_sum would skip the nulls)
    val bad = Seq((1L, Seq.fill(63)(0.5))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.randomProjection(bad, inDim = 64, outDim = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("64-dim")),
      s"wrong error: ${e.getMessage}")
  }

  test("randomProjection approximately preserves pairwise distance " +
      "ordering (JL property) and is zero-shuffle") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L)
    val vecs = emb.filter($"vec_id".isin(ids: _*))
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val proj = Similarity.randomProjection(
        emb.filter($"vec_id".isin(ids: _*)), inDim = 64, outDim = 16)
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // JL at 16 dims is loose per pair (squared-distance ratio ~
    // chi²₁₆/16, σ≈0.35) — bound individual pairs at 6× and require the
    // MEAN ratio near 1 (the unbiasedness that makes the projection
    // usable for clustering/ANN)
    val ratios = for (i <- ids; j <- ids if i < j) yield {
      val orig = d2(vecs(i), vecs(j))
      val low = d2(proj(i), proj(j))
      assert(low < orig * 6 && low > orig / 6,
        s"pair ($i,$j): $orig -> $low distorted beyond 6x")
      low / orig
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.6, s"mean distortion $mean off unit")
    val plan = Similarity.randomProjection(emb, inDim = 64, outDim = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffled:\n$plan")
  }

  test("scalarQuantize: round-trip error ≤ scale/2, extremes hit the code range") {
    import spark.implicits._
    val emb = Tables.load(spark, sf0, "embeddings")
    val sq = Similarity.scalarQuantize(emb)
    val joined = sq.join(emb, "vec_id").select(col("vec_id"),
        col("lo"), col("scale"), col("codes"),
        col("embedding").cast("array<double>").as("v"))
      .as[(Long, Double, Double, Seq[Byte], Seq[Double])].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (id, lo, scale, codes, v) =>
      assert(codes.length == v.length)
      // per-element reconstruction bound: half a quantization step
      codes.zip(v).foreach { case (c, x) =>
        val recon = lo + (c.toInt + 128).toDouble * scale
        assert(math.abs(recon - x) <= scale / 2 * (1 + 1e-9) + 1e-12,
          s"vec $id: |$recon - $x| > ${scale / 2}")
      }
      // the min element is code -128, the max is 127 (0 / 255 unshifted)
      assert(codes(v.indexOf(v.min)) == -128.toByte)
      assert(codes(v.indexOf(v.max)) == 127.toByte)
    }
  }

  test("scalarQuantize: constant vector → scale 0, all codes -128, exact recon") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(8)(3.25f)), (2L, Array[Float]()))
      .toDF("vec_id", "embedding")
    val sq = Similarity.scalarQuantize(df)
      .select(col("vec_id"), col("lo"), col("scale"),
        Similarity.dequantize(col("codes"), col("lo"), col("scale"))
          .as("recon"), col("codes"))
      .as[(Long, Option[Double], Option[Double], Seq[Double], Seq[Byte])]
      .collect().sortBy(_._1)
    val (_, lo, scale, recon, codes) = sq(0)
    assert(lo.contains(3.25) && scale.contains(0.0))
    assert(codes.forall(_ == -128.toByte))
    assert(recon.forall(_ == 3.25))
    // empty vector: empty codes, null min/max, and recon null-propagates
    // through the null lo/scale (standard ternary-expression semantics)
    assert(sq(1)._5.isEmpty && sq(1)._2.isEmpty && sq(1)._4 == null)
  }

  test("sqTopK: high agreement with the exact search from 4x less data") {
    import spark.implicits._
    val emb = Tables.load(spark, sf0, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, k = 10)
      .select(col("query_id"), col("corpus_id")).as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq = Similarity.sqTopK(emb, q, k = 10)
      .select(col("query_id"), col("corpus_id")).as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(sq.keySet == exact.keySet)
    val recalls = exact.map { case (qid, want) =>
      sq(qid).intersect(want).size.toDouble / want.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean SQ recall@10 $mean < 0.9 " +
      s"(per-query ${recalls.toSeq.sorted.mkString(",")})")
  }

  test("sqTopKAgainst: the parquet-reloaded quantized store serves identically") {
    val emb = Tables.load(spark, sf0, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val direct = Similarity.sqTopK(emb, q, k = 10)
    val dir = java.nio.file.Files.createTempDirectory("graft-sq").toString
    Similarity.scalarQuantize(emb).write.parquet(s"$dir/codes")
    val served = Similarity.sqTopKAgainst(
      spark.read.parquet(s"$dir/codes"), q, k = 10)
    assert(served.exceptAll(direct).isEmpty && direct.exceptAll(served).isEmpty)
  }

  test("meanPoolVectors: exact hand-vector means, partitioning " +
      "determinism, ragged groups refused loudly") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 4.0f)),
      ("b", Array(-1.5f, 0.5f))
    ).toDF("k", "embedding")
    for (parts <- Seq(1, 5)) {
      val out = Similarity.meanPoolVectors(df.repartition(parts), "k")
        .as[(String, Long, Seq[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(out("a") == ((2L, Seq(2.0, 3.0))), out("a").toString)
      assert(out("b") == ((1L, Seq(-1.5, 0.5))), out("b").toString)
    }
    // a group mixing vector lengths must throw, naming the group
    val ragged = Seq(("a", Array(1.0f, 2.0f)), ("a", Array(1.0f)))
      .toDF("k", "embedding")
    val ex = intercept[Exception] {
      Similarity.meanPoolVectors(ragged, "k").collect()
    }
    assert(ex.getMessage.contains("ragged"), ex.getMessage)
  }

  test("prototypeClassify: nearest class mean predicts on clean " +
      "geometry; ties break to the smaller label; output contract") {
    // two well-separated classes along axes 0/1; one query per class
    // plus one exactly between them (tie → smaller label "a")
    val corpus = Seq(
      ("a", Array(1f, 0f, 0f, 0f)), ("a", Array(0.9f, 0.1f, 0f, 0f)),
      ("b", Array(0f, 1f, 0f, 0f)), ("b", Array(0.1f, 0.9f, 0f, 0f))
    ).zipWithIndex.map { case ((l, v), i) => (100L + i, l, v) }
      .toDF("vec_id", "label", "embedding")
    val queries = Seq(
      (1L, "a", Array(1f, 0f, 0f, 0f)),
      (2L, "a", Array(0f, 1f, 0f, 0f)), // mislabeled on purpose
      (3L, "b", Array(1f, 1f, 0f, 0f))  // equidistant → tie → "a"
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.prototypeClassify(corpus, queries)
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L) == (("a", true)), out(1L).toString)
    assert(out(2L) == (("b", false)), out(2L).toString)
    assert(out(3L) == (("a", false)), s"tie must break to 'a': ${out(3L)}")
  }

  test("marginBitext: ratio margin recovers aligned pairs and demotes " +
      "the hub vector that wins raw cosine") {
    val src = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f)),
      (4L, Array(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      // hub: cos 0.5 with EVERY src 0-3 — wins raw cosine against z
      (10L, Array(0.35f, 0.35f, 0.35f, 0.35f, 0f, 0f, 0f, 0f)),
      // z: cos ~0.447 with src 0 only — loses cosine, wins margin
      (11L, Array(0.45f, 0f, 0f, 0f, 0f, 0f, 0f, 0.9f)),
      (12L, Array(0f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)), // fillers
      (13L, Array(0f, 0f, 0f, 0f, 0f, 0f, 1f, 0f)),
      // aligned partner of src 4
      (14L, Array(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0.01f))
    ).toDF("vec_id", "embedding")
    for (parts <- Seq(1, 5)) {
      val out = Similarity.marginBitext(src.repartition(parts),
          tgt.repartition(parts), k = 4)
        .select("src_id", "tgt_id", "margin")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // the aligned pair is recovered with a dominant margin
      assert(out(4L)._1 == 14L, s"missed aligned pair: $out")
      assert(out(4L)._2 > 2.0, s"aligned margin not dominant: $out")
      // the hub wins raw cosine for src 0 (0.5 > 0.447)...
      val cosBest = Similarity.bruteForceTopK(tgt,
          src.filter(col("vec_id") === 0L), k = 1)
        .select("corpus_id").as[Long].collect().head
      assert(cosBest == 10L, s"test geometry broken: cos best = $cosBest")
      // ...but the margin demotes it: z's un-promiscuous neighborhood
      // beats the hub's inflated one
      assert(out(0L)._1 == 11L, s"hub not demoted: $out")
    }
    intercept[IllegalArgumentException] {
      Similarity.marginBitext(src, tgt, k = 0)
    }
    // mutual mode: only reciprocal bests survive. srcs 1-3 all point
    // at the hub; the hub's single best SOURCE is src 1 — srcs 1-3 tie
    // on sim but src 0's richer neighborhood (it also sees z) lowers
    // its margin, and the 1-3 tie breaks to the smallest id — so
    // (1,10) is genuinely reciprocal while (2,10)/(3,10) are not, and
    // (0,11)/(4,14) are reciprocal on both sides
    val mut = Similarity.marginBitext(src, tgt, k = 4, mutual = true)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    assert(mut == Set((0L, 11L), (1L, 10L), (4L, 14L)),
      s"mutual pairs: $mut")
    // k beyond both sides' sizes: means divide by the ACTUAL neighbor
    // count, one best row per source either way
    val big = Similarity.marginBitext(src, tgt, k = 50)
      .select("src_id").as[Long].collect().sorted
    assert(big.sameElements(Array(0L, 1L, 2L, 3L, 4L)), big.mkString(","))
  }

  test("VectorIndex: ivfTopKAgainst / ivfPqTopKAgainst reproduce the " +
      "one-shot ops bit-for-bit through a parquet round-trip") {
    val q = emb.filter(col("vec_id") < 5)
    val idx = Similarity.buildVectorIndex(emb, nlist = 16, m = 8,
      codebookSize = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-vidx").toString
    idx.centroids.write.parquet(s"$dir/centroids")
    idx.codebooks.write.parquet(s"$dir/codebooks")
    idx.vectors.write.parquet(s"$dir/vectors")
    // the reloaded index serves with ZERO training work — the frames
    // below never touch `emb` again
    val re = Similarity.VectorIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codebooks"),
      spark.read.parquet(s"$dir/vectors"))
    val ivfDirect = Similarity.ivfTopK(emb, q, k = 10, nlist = 16, nprobe = 4)
    val ivfServed = Similarity.ivfTopKAgainst(re, q, k = 10, nprobe = 4)
    assert(ivfServed.exceptAll(ivfDirect).isEmpty &&
      ivfDirect.exceptAll(ivfServed).isEmpty, "IVF serving parity broken")
    val pqDirect = Similarity.ivfPqTopK(emb, q, k = 10, nlist = 16,
      nprobe = 8, m = 8, codebookSize = 16, rerank = 8)
    val pqServed = Similarity.ivfPqTopKAgainst(re, q, k = 10, nprobe = 8,
      rerank = 8)
    assert(pqServed.exceptAll(pqDirect).isEmpty &&
      pqDirect.exceptAll(pqServed).isEmpty, "IVF-PQ serving parity broken")
    // the vote family serves from the index through the candidates
    // hook — the last per-call-training consumer gets a steady state
    val voteIdx = Similarity.knnLabelVote(emb, q, k = 10,
      candidates = Some(ivfServed.select("query_id", "corpus_id")))
    val voteIvf = Similarity.knnLabelVote(emb, q, k = 10, strategy = "ivf")
    assert(voteIdx.exceptAll(voteIvf).isEmpty &&
      voteIvf.exceptAll(voteIdx).isEmpty, "index-served vote diverged")
  }

  test("VectorIndex: extendVectorIndex and mergeVectorIndexes equal a " +
      "fresh build over the union when the training prefix is shared") {
    // first-16 ids (the whole geometry at trainIters=0) live in slice a,
    // so extending a's index with b is bit-identical to rebuilding on
    // the union — the incremental-maintenance contract
    val a = emb.filter(col("vec_id") < 300)
    val b = emb.filter(col("vec_id") >= 300)
    val q = emb.filter(col("vec_id") < 5)
    val idxA = Similarity.buildVectorIndex(a)
    val ext = Similarity.extendVectorIndex(idxA, b)
    val full = Similarity.buildVectorIndex(emb)
    val sFull = Similarity.ivfTopKAgainst(full, q, k = 10)
    val sExt = Similarity.ivfTopKAgainst(ext, q, k = 10)
    assert(sExt.exceptAll(sFull).isEmpty && sFull.exceptAll(sExt).isEmpty,
      "extended index diverges from the union rebuild")
    // merge of disjoint same-geometry parts ≡ extend; IVF-PQ path
    val partB = Similarity.extendVectorIndex(
      Similarity.VectorIndex(idxA.centroids, idxA.codebooks,
        idxA.vectors.limit(0)), b)
    val merged = Similarity.mergeVectorIndexes(Seq(idxA, partB))
    val mPq = Similarity.ivfPqTopKAgainst(merged, q, k = 10, nprobe = 8,
      rerank = 8)
    val ePq = Similarity.ivfPqTopKAgainst(ext, q, k = 10, nprobe = 8,
      rerank = 8)
    assert(mPq.exceptAll(ePq).isEmpty && ePq.exceptAll(mPq).isEmpty,
      "merged parts diverge from the extended index")
    intercept[IllegalArgumentException] {
      Similarity.mergeVectorIndexes(Seq.empty)
    }
  }

  test("VectorIndex geometry fingerprints: stamped through parquet, " +
      "mismatched merges and serves raise loudly; certification is " +
      "deterministic and perfect when serving is exhaustive") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val q = emb.filter(col("vec_id") < 5)
    val idxA = Similarity.buildVectorIndex(emb.filter(col("vec_id") < 300))
    // a DIFFERENT first-N training slice → different geometry → fp differs
    val idxB = Similarity.buildVectorIndex(emb.filter(col("vec_id") >= 100))
    val fpA = Similarity.geometryFingerprint(idxA)
    assert(fpA != Similarity.geometryFingerprint(idxB),
      "distinct geometries must fingerprint differently")
    // independent build over a different slice with a SHARED trainOn:
    // same geometry, same fingerprint — the mergeable case
    val shared = Similarity.buildVectorIndex(
      emb.filter(col("vec_id") >= 300),
      trainOn = emb.filter(col("vec_id") < 300))
    assert(fpA == Similarity.geometryFingerprint(shared),
      "shared-trainOn builds must fingerprint identically")
    assert(Similarity.mergeVectorIndexes(Seq(idxA, shared))
      .vectors.count() > 0)
    // the stamp is a literal column: survives parquet, one value
    val dir = java.nio.file.Files.createTempDirectory("graft-geofp")
      .toString + "/vectors"
    idxA.vectors.write.parquet(dir)
    val stamps = spark.read.parquet(dir).select("geo_fp")
      .distinct().as[Long].collect()
    assert(stamps.toSeq == Seq(fpA), s"stamp lost in parquet: ${stamps.toSeq}")
    // mismatched-geometry merge: throws naming the offending part
    val e = intercept[IllegalArgumentException] {
      Similarity.mergeVectorIndexes(Seq(idxA, idxB))
    }
    assert(e.getMessage.contains("geometry fingerprint mismatch") &&
      e.getMessage.contains("part 1"), e.getMessage)
    // mismatched serve: A's vectors under B's geometry raises in-plan
    // (both IVF and IVF-PQ serving paths), never a silent wrong answer
    val franken = Similarity.VectorIndex(idxB.centroids, idxB.codebooks,
      idxA.vectors)
    val e2 = intercept[Exception] {
      Similarity.ivfTopKAgainst(franken, q, k = 5).collect()
    }
    assert(chain(e2).contains("geometry mismatch"), chain(e2))
    val e3 = intercept[Exception] {
      Similarity.ivfPqTopKAgainst(franken, q, k = 5).collect()
    }
    assert(chain(e3).contains("geometry mismatch"), chain(e3))
    // extending a hand-assembled mismatched index raises on consumption
    val e4 = intercept[Exception] {
      Similarity.extendVectorIndex(franken,
        emb.filter(col("vec_id") >= 300)).vectors.count()
    }
    assert(chain(e4).contains("geometry mismatch"), chain(e4))
    // certification: hash-deterministic sample (same rows every run) and
    // perfect recall when nprobe = nlist makes serving exhaustive
    val c1 = Similarity.certifyVectorIndex(idxA, k = 5, nprobe = 16,
      sampleN = 4).select("query_id", "recall", "rr")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(c1.length == 4 && c1.forall(r => r._2 == 1.0 && r._3 == 1.0),
      s"exhaustive serving must certify perfectly: ${c1.toSeq}")
    val c2 = Similarity.certifyVectorIndex(idxA, k = 5, nprobe = 16,
      sampleN = 4).select("query_id", "recall", "rr")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(c1.toSeq == c2.toSeq, "certification sample must be deterministic")
    // approximate serving still certifies with recall in [0, 1]
    val c3 = Similarity.certifyVectorIndex(idxA, k = 5, nprobe = 2,
      sampleN = 4).select("recall").as[Double].collect()
    assert(c3.nonEmpty && c3.forall(r => r >= 0.0 && r <= 1.0), c3.toSeq)
    // the IVF-PQ serving path certifies through the same op: exhaustive
    // probes + full rerank = the ADC index only prunes, rerank is exact
    // cosine → perfect recall
    val cpq = Similarity.certifyVectorIndex(idxA, k = 5, nprobe = 16,
        sampleN = 4, strategy = "ivfpq", rerank = 64)
      .select("recall").as[Double].collect()
    assert(cpq.length == 4 && cpq.forall(_ == 1.0),
      s"exhaustive IVF-PQ must certify perfectly: ${cpq.toSeq}")
    intercept[IllegalArgumentException] {
      Similarity.certifyVectorIndex(idxA, strategy = "bogus")
    }
  }

  test("maintainVectorIndex: a drifted batch trips the recall gate, the " +
      "rebuild regenerates geometry and certifies above the floor; a " +
      "healthy batch keeps the extension") {
    // seed corpus: two orthogonal single-vector clusters (ids 0, 1) —
    // nlist = 2 pins the centroids to exactly e1 and e3
    def v(x: Double, y: Double, z: Double, w: Double) =
      Array(x.toFloat, y.toFloat, z.toFloat, w.toFloat)
    val seed = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0, 0, 1, 0))
    ).toDF("vec_id", "embedding")
    // drifted batch: a tight 30-vector cluster around e2 with tiny
    // deterministic jitter in the e1/e3 components — under the OLD
    // geometry the jitter signs scatter the cluster across both cells,
    // so nprobe = 1 serving misses ~half of every query's true top-k
    val drift = (0 until 30).map { i =>
      (100L + i, v(((i * 37) % 7 - 3) * 0.001, 1.0,
        ((i * 53) % 7 - 3) * 0.001, 0.0))
    }.toDF("vec_id", "embedding")
    val idx = Similarity.buildVectorIndex(seed, nlist = 2, m = 2,
      codebookSize = 2)
    val union = seed.unionByName(drift)
    val m1 = Similarity.maintainVectorIndex(idx, drift, union,
      minRecall = 0.8, k = 10, nprobe = 1, sampleN = 8, trainIters = 2)
    assert(m1.rebuilt, s"drift must trip the gate " +
      s"(extended recall ${m1.extendedRecall})")
    assert(m1.extendedRecall < 0.8,
      s"fixture broken: extended recall ${m1.extendedRecall} not degraded")
    assert(m1.finalRecall >= 0.8 && m1.finalRecall > m1.extendedRecall,
      s"rebuild must certify above the floor: ${m1.finalRecall} vs " +
        s"extended ${m1.extendedRecall}")
    // the certificate frame is the rebuilt index's, not the extension's
    val certAvg = m1.certificate.agg(avg("recall")).as[Double].head()
    assert(math.abs(certAvg - m1.finalRecall) < 1e-12)
    // the regenerated geometry is a NEW generation: fingerprints differ
    assert(idx.geometryFp != m1.index.geometryFp,
      "rebuild must regenerate geometry")
    // healthy path: same batch against an index whose geometry was
    // trained on the full mixed corpus — recall holds, extension kept
    val healthyIdx = Similarity.buildVectorIndex(seed, nlist = 2, m = 2,
      codebookSize = 2, trainIters = 2, trainOn = union)
    val m2 = Similarity.maintainVectorIndex(healthyIdx, drift, union,
      minRecall = 0.8, k = 10, nprobe = 1, sampleN = 8, trainIters = 2)
    assert(!m2.rebuilt && m2.finalRecall >= 0.8,
      s"healthy extension must pass: rebuilt=${m2.rebuilt} " +
        s"recall=${m2.finalRecall}")
    assert(m2.index.geometryFp == healthyIdx.geometryFp,
      "healthy path must keep the serving geometry")
    intercept[IllegalArgumentException] {
      Similarity.maintainVectorIndex(idx, drift, union, minRecall = 1.5)
    }
  }

  test("clusterProfile: populations sum to the corpus, cohesion stats are sane") {
    val prof = Similarity.clusterProfile(emb, nClusters = 8).cache()
    val rows = prof.collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == emb.count())
    rows.foreach { r =>
      val (lo, mean, hi) = (r.getAs[Double]("min_sim"),
        r.getAs[Double]("mean_sim"), r.getAs[Double]("max_sim"))
      assert(lo <= mean + 1e-6 && mean <= hi + 1e-6 &&
        lo >= -1.0 - 1e-6 && hi <= 1.0 + 1e-6, s"bad cohesion row: $r")
    }
    // each seed centroid IS a corpus vector: every cell the assignment
    // sends its own seed to must top out at sim ~1
    val cents = Similarity.centroids(emb, 8)
    val seedCells = Similarity.ivfAssign(
        cents.select($"centroid_id".as("vec_id"),
          $"centroid".as("embedding")), cents)
      .filter($"corpus_id" === $"centroid_id")
      .select("centroid_id").as[Long].collect().toSet
    assert(seedCells.nonEmpty)
    val selfCells = rows.filter(r => seedCells(r.getAs[Long]("centroid_id")))
    assert(selfCells.nonEmpty &&
      selfCells.forall(_.getAs[Double]("max_sim") >= 0.999999),
      s"seed cells must contain their seed at sim 1: ${selfCells.toSeq}")
    // deterministic under repartitioning (integer-sum discipline)
    val again = Similarity.clusterProfile(emb.repartition(13), nClusters = 8)
    assert(prof.exceptAll(again).isEmpty && again.exceptAll(prof).isEmpty)
    prof.unpersist()
  }

  test("applyFeedToVectorIndex: retract + encode equals the one-shot " +
      "index; re-applying a re-pulled window refreshes, not duplicates") {
    import graft.llm.Similarity
    def vecs(ids: Seq[Long]) = ids.map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat)))
      .toDF("vec_id", "embedding")
    val base = vecs(0L until 40L)
    val idx0 = Similarity.buildVectorIndex(base, nlist = 4, m = 4,
      trainOn = base)
    // window: ids 10-14 updated (shifted embeddings), 35-39 deleted,
    // 40-44 born
    val updated = vecs(10L until 15L)
      .withColumn("embedding", org.apache.spark.sql.functions.transform(
        col("embedding"), x => x + lit(1.0f)))
    val feed = vecs(35L until 40L).withColumn("__op", lit("delete"))
      .unionByName(vecs(10L until 15L).withColumn("__op", lit("delete")))
      .unionByName(updated.withColumn("__op", lit("insert")))
      .unionByName(vecs(40L until 45L).withColumn("__op", lit("insert")))
    val maintained = Similarity.applyFeedToVectorIndex(idx0, feed)
    val live = vecs((0L until 10L) ++ (15L until 35L))
      .unionByName(updated).unionByName(vecs(40L until 45L))
    val oneShot = Similarity.buildVectorIndex(live, nlist = 4, m = 4,
      trainOn = base)
    def state(ix: Similarity.VectorIndex) =
      ix.vectors.select("corpus_id", "cell", "codes")
        .collect().map(_.toString).sorted.toSeq
    assert(state(maintained) == state(oneShot))
    assert(maintained.vectors.count() == 40L)
    // the upsert treatment: re-applying the SAME window (the re-pulled
    // open-window case) retracts its own first application — counts
    // and content stay fixed
    val again = Similarity.applyFeedToVectorIndex(maintained, feed)
    assert(state(again) == state(oneShot))
    assert(again.vectors.count() == 40L)
  }

  test("clusterProfile with Lloyd refinement keeps exact populations") {
    val prof = Similarity.clusterProfile(emb, nClusters = 4, trainIters = 2)
    assert(prof.agg(sum("n_members")).head().getLong(0) == emb.count())
    assert(prof.count() <= 4)
  }

  test("clusterBalancedSample caps cells at k, picks real members, deterministic") {
    val k = 5
    val sample = Similarity.clusterBalancedSample(emb, nClusters = 8,
      kPerCluster = k).cache()
    val perCell = sample.groupBy("centroid_id").count()
      .as[(Long, Long)].collect()
    assert(perCell.forall(_._2 <= k))
    // every sampled id belongs to the cell assignment says it does
    val cents = Similarity.centroids(emb, 8)
    val assigned = Similarity.ivfAssign(emb, cents)
      .select($"corpus_id".as("vec_id"), $"centroid_id")
    assert(sample.select("vec_id", "centroid_id")
      .exceptAll(assigned).isEmpty)
    // full cells take exactly k; small cells keep everything
    val cellSizes = assigned.groupBy("centroid_id").count()
      .as[(Long, Long)].collect().toMap
    perCell.foreach { case (cell, n) =>
      assert(n == math.min(k.toLong, cellSizes(cell)), s"cell $cell: $n")
    }
    val again = Similarity.clusterBalancedSample(emb.repartition(11),
      nClusters = 8, kPerCluster = k)
    assert(sample.exceptAll(again).isEmpty && again.exceptAll(sample).isEmpty)
    sample.unpersist()
  }

  test("scalarQuantize is a zero-exchange scan-side projection") {
    val emb = Tables.load(spark, sf0, "embeddings")
    val plan = Similarity.scalarQuantize(emb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization shuffled:\n$plan")
  }
}
