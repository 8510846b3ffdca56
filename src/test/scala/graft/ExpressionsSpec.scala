package graft

import org.apache.spark.sql.functions._

import graft.expressions.GraftExpressions
import graft.llm.{Dedup, Similarity}

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("CosineSimilarity matches the column-level formulation bit-for-bit") {
    val df = Tables.load(spark, sf0, "embeddings").limit(50)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val a = df.select($"vec_id".as("i"), $"v".as("va"))
    val b = df.select($"vec_id".as("j"), $"v".as("vb"))
    val pairs = a.crossJoin(b).filter($"i" < $"j")
    val viaExpr = pairs.select($"i", $"j",
      GraftExpressions.cosineSimilarity($"va", $"vb").as("sim"))
    val viaCols = pairs.select($"i", $"j",
      (Similarity.dot($"va", $"vb") /
        (Similarity.l2Norm($"va") * Similarity.l2Norm($"vb"))).as("sim"))
    // bit-identical doubles required (exceptAll compares exact values)
    assert(viaExpr.exceptAll(viaCols).isEmpty)
  }

  test("CosineSimilarity basic identities") {
    val df = Seq((Array(1.0, 0.0), Array(1.0, 0.0), 1.0),
      (Array(1.0, 0.0), Array(0.0, 2.0), 0.0),
      (Array(1.0, 1.0), Array(-1.0, -1.0), -1.0)).toDF("a", "b", "want")
    val got = df.select(GraftExpressions.cosineSimilarity($"a", $"b"), $"want")
      .as[(Double, Double)].collect()
    got.foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("MinHashSignature: identical sets → identical signatures, similarity ∝ overlap") {
    val df = Seq(
      (1L, (1 to 50).map(i => s"s$i")),
      (2L, (1 to 50).map(i => s"s$i")),
      (3L, (1 to 50).map(i => s"s${i + 5}")), // 45/55 overlap
      (4L, (1 to 50).map(i => s"t$i")) // disjoint
    ).toDF("id", "sh")
    val sig = df.select($"id",
      GraftExpressions.minhashSignature($"sh", 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(1L) == sig(2L))
    def agree(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(agree(sig(1L), sig(3L)) > 0.6)
    assert(agree(sig(1L), sig(4L)) < 0.2)
  }

  test("SimHash64: identical → equal, disjoint → distant") {
    val df = Seq(
      (1L, (1 to 100).map(i => s"s$i")),
      (2L, (1 to 100).map(i => s"s$i")),
      (3L, (1 to 100).map(i => s"z$i"))
    ).toDF("id", "sh")
    val sigs = df.select($"id", GraftExpressions.simhash64($"sh"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 16)
  }

  test("JaccardSimilarity computes exact set Jaccard") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d"), 0.5),
      (Seq("a"), Seq("a"), 1.0),
      (Seq("a"), Seq("b"), 0.0),
      (Seq.empty[String], Seq.empty[String], 0.0)
    ).toDF("a", "b", "want")
    df.select(GraftExpressions.jaccardSimilarity($"a", $"b"), $"want")
      .as[(Double, Double)].collect()
      .foreach { case (g, w) => assert(g == w) }
  }

  test("expressions are SQL-registered (graft_* functions)") {
    GraftExpressions.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) c,
        |       graft_jaccard(array('a','b'), array('b','c')) j,
        |       graft_simhash64(array('x','y')) s,
        |       size(graft_minhash(array('x','y'))) m""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-12)
    assert(r.getLong(2) != 0L)
    assert(r.getInt(3) == 64)
    val r2 = spark.sql(
      """SELECT graft_repetition_stats('a a b').dup_unigram_frac d,
        |       graft_word_ngrams('a b c', 2) g,
        |       graft_word_chunks('a b c d', 2, 0) k""".stripMargin).collect()(0)
    assert(r2.getDouble(0) == 1.0 / 3)
    assert(r2.getSeq[String](1) == Seq("a b", "b c"))
    assert(r2.getSeq[String](2) == Seq("a b", "c d"))
    // the sketch aggregate registers too (small vocab → exact counts)
    val r3 = spark.sql(
      """SELECT graft_misra_gries(t, 8) sk
        |FROM VALUES ('a'), ('b'), ('a') AS v(t)""".stripMargin).collect()(0)
    assert(r3.getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getString(0), e.getLong(1))) == Seq(("a", 2L), ("b", 1L)))
    // session-4 scalars: intrinsic ln + the quantize/dequantize pair
    val r4 = spark.sql(
      """SELECT graft_platform_ln(1.0d) l,
        |       graft_scalar_quantize(array(0.0d, 1.0d)) q,
        |       graft_dequantize(
        |         graft_scalar_quantize(array(0.0d, 255.0d)).codes,
        |         0.0d, 1.0d) d""".stripMargin).collect()(0)
    assert(r4.getDouble(0) == 0.0)
    val qrow = r4.getStruct(1)
    assert(qrow.getDouble(0) == 0.0 &&
      qrow.getSeq[Byte](2) == Seq(-128.toByte, 127.toByte))
    assert(r4.getSeq[Double](2) == Seq(0.0, 255.0))
    // session-5: the Bloom union aggregate registers (merged filter must
    // still contain keys from both input sketches)
    import graft.expressions.{GraftExpressions => GE}
    val sk = Seq((0, "alpha"), (1, "beta")).toDF("slice", "t")
      .groupBy("slice")
      .agg(GE.bloomSketch(xxhash64($"t"), 100L, 0.01).as("sketch"))
    sk.createOrReplaceTempView("bloom_slices")
    val merged = spark.sql(
      "SELECT graft_bloom_union(sketch) sk FROM bloom_slices")
      .head().getAs[Array[Byte]](0)
    val probes = Seq("alpha", "beta", "missing-token").toDF("t")
      .select(GE.bloomMightContain(lit(merged), xxhash64($"t")))
      .as[Boolean].collect().toSeq
    assert(probes(0) && probes(1) && !probes(2))
  }

  test("BloomBuildAgg honors geometry past Spark's runtime-filter clamps") {
    import graft.expressions.{GraftExpressions => GE}
    // 10M keys @ 1% → ~95.85M bits — past the 64-Mbit session-conf clamp
    // Spark's own BloomFilterAggregate silently applies (the clamp that
    // motivates the custom build aggregate: a saturated membership
    // filter answers "seen" for everything)
    val bytes = Seq("a", "b").toDF("t")
      .agg(GE.bloomSketch(xxhash64($"t"), 10000000L, 0.01))
      .head().getAs[Array[Byte]](0)
    val f = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val want = (-10000000L * math.log(0.01) /
      (math.log(2) * math.log(2))).toLong
    assert(f.bitSize() >= want && f.bitSize() < want + 64,
      s"bitSize ${f.bitSize()} != requested ~$want")
    // past the 8-Gbit broadcast-sanity ceiling: loud, with guidance
    val e = intercept[IllegalArgumentException] {
      GE.bloomSketch(xxhash64($"t"), 20000000000L, 0.000001)
    }
    assert(e.getMessage.contains("raise fpp"))
  }

  test("SignatureAgreement matches the zip_with/filter column stack bit-for-bit") {
    val sigs = Dedup.minhashSignatures(
      Tables.load(spark, sf0, "documents").limit(100), "doc_id", "text")
      .repartition($"id")
    val a = sigs.select($"id".as("i"), $"signature".as("sig_i"))
    val b = sigs.select($"id".as("j"), $"signature".as("sig_j"))
    val pairs = a.crossJoin(b).filter($"i" < $"j").limit(2000)
    val viaExpr = pairs.select($"i", $"j",
      GraftExpressions.signatureAgreement($"sig_i", $"sig_j").as("est"))
    val viaCols = pairs.select($"i", $"j",
      (size(filter(zip_with($"sig_i", $"sig_j", (x, y) => x === y),
        (eq: org.apache.spark.sql.Column) => eq)).cast("double") /
        size($"sig_i")).as("est"))
    assert(viaExpr.exceptAll(viaCols).isEmpty)
  }

  test("PairGenerator streams the same pairs as explode(PairCombinations)") {
    val buckets = Seq(
      Seq((5L, 10L), (2L, 20L), (9L, 30L), (1L, 40L)),
      Seq((7L, 7L), (3L, 3L)),
      Seq((42L, 1L))) // single-doc bucket → no pairs
      .map(b => Tuple1(b)).toDF("docs")
      .select($"docs".cast("array<struct<id:bigint,sh_size:bigint>>").as("docs"))
    val viaGen = buckets
      .select(GraftExpressions.pairGenerator($"docs")).toDF("i", "j", "si", "sj")
    val viaArray = buckets.filter(size($"docs") > 1)
      .select(explode(GraftExpressions.pairCombinations($"docs")).as("p"))
      .select($"p.i", $"p.j", $"p.si", $"p.sj")
    assert(viaGen.exceptAll(viaArray).isEmpty && viaArray.exceptAll(viaGen).isEmpty)
    assert(viaGen.count() == 4 * 3 / 2 + 1)
    // i < j invariant straight from the generator
    assert(viaGen.filter($"i" >= $"j").isEmpty)
  }

  test("SignatureAgreement yields NULL (never NaN) for an empty left signature") {
    // empty-text doc → empty shingle set → empty signature array; the
    // replaced column stack returned NULL and the estimator must too, in
    // BOTH the codegen and interpreted paths
    val df = Seq(
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 2L), Array(1L, 3L))).toDF("a", "b")
    val got = df.select(
      GraftExpressions.signatureAgreement($"a", $"b").as("est")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) == 0.5)
    // interpreted path (eval without codegen) via a non-codegen context
    val viaFilter = df.filter(
      GraftExpressions.signatureAgreement($"a", $"b").isNull).count()
    assert(viaFilter == 1L)
    assert(!got.exists(r => !r.isNullAt(0) && r.getDouble(0).isNaN))
  }

  test("HyperplaneSignatures matches the column formulation bit-for-bit") {
    val emb = Tables.load(spark, sf0, "embeddings").limit(100)
    val nPlanes = 12
    val nTables = 4
    val viaExpr = emb.select($"vec_id",
      GraftExpressions.hyperplaneSignatures($"embedding", nPlanes, nTables).as("sigs"))
    val viaCols = emb.select($"vec_id",
      array((0 until nTables).map(t =>
        Similarity.hyperplaneSignature($"embedding", nPlanes, t)): _*).as("sigs"))
    assert(viaExpr.exceptAll(viaCols).isEmpty)
    // signatures discriminate: not all vectors land in one bucket
    val distinct = viaExpr.select(explode($"sigs")).distinct().count()
    assert(distinct > 1)
  }

  test("PqAssign matches the struct-min column formulation bit-for-bit") {
    val emb = Tables.load(spark, sf0, "embeddings").limit(100)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val dim = emb.select(size($"v")).head().getInt(0)
    val m = 4
    val w = dim / m
    // codebooks: subspace slices of the first k vectors, ids 0..k-1
    val seeds = emb.orderBy($"vec_id").limit(5)
      .select($"v").as[Seq[Double]].collect()
    val books = for {
      s <- 0 until m; (sv, i) <- seeds.zipWithIndex
    } yield (s, i.toLong, sv.slice(s * w, s * w + w): Seq[Double])
    val viaExpr = emb.select($"vec_id",
      GraftExpressions.pqAssign($"v", books).as("codes"))
    // independent formulation: per-subspace array_min over (d2, cid)
    // structs — struct ordering reproduces the (d2 asc, cid asc) tie-break
    val viaCols = emb.select($"vec_id", array((0 until m).map { s =>
      val sv = slice($"v", s * w + 1, w)
      array_min(array(books.filter(_._1 == s).map { case (_, cid, cvec) =>
        struct(GraftExpressions.l2DistanceSq(sv, typedLit(cvec)).as("d2"),
          lit(cid).as("cid"))
      }: _*)).getField("cid")
    }: _*).as("codes"))
    assert(viaExpr.exceptAll(viaCols).isEmpty)
    // codes discriminate: more than one distinct codeword assigned
    assert(viaExpr.select(explode($"codes")).distinct().count() > 1)
  }

  test("jaccardPairs (relational) agrees with JaccardSimilarity (expression)") {
    val docs = Tables.load(spark, sf0, "documents").limit(200)
    val rel = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select($"i", $"j", $"jaccard").as[(Long, Long, Double)].collect().toMap2
    val sh = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val a = sh.select($"doc_id".as("i"), $"sh".as("sa"))
    val b = sh.select($"doc_id".as("j"), $"sh".as("sb"))
    val brute = a.crossJoin(b).filter($"i" < $"j")
      .select($"i", $"j",
        round(GraftExpressions.jaccardSimilarity($"sa", $"sb"), 6).as("jc"))
      .filter($"jc" >= 0.5)
      .as[(Long, Long, Double)].collect().toMap2
    assert(rel == brute)
  }

  test("kernel expressions run INSIDE whole-stage codegen, with fallback disabled") {
    // spark.sql.codegen.fallback=false turns any janino compile failure in
    // these plans into a hard error — a silently-interpreted fallback
    // cannot fake this test green. Plan lines prefixed `*(n)` are inside a
    // WholeStageCodegen span.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = Tables.load(spark, sf0, "documents").limit(200)
      def finalPlan(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString.linesIterator
          .takeWhile(!_.contains("== Initial Plan ==")).mkString("\n")
      def codegenLine(df: org.apache.spark.sql.DataFrame, marker: String): Unit = {
        df.collect() // throws on codegen failure with fallback off
        val plan = finalPlan(df)
        val lines = plan.linesIterator.filter(_.contains(marker)).toSeq
        assert(lines.nonEmpty, s"no '$marker' in plan:\n$plan")
        assert(lines.forall(_.contains("*(")),
          s"'$marker' outside WholeStageCodegen:\n${lines.mkString("\n")}")
      }
      // scalar kernels: one fused project over the scan
      codegenLine(docs.select(
        GraftExpressions.simhash64(Dedup.shingles($"text", 3)).as("sh"),
        GraftExpressions.minhashSignature(Dedup.shingles($"text", 3), 64).as("mh")),
        "graft_simhash64")
      codegenLine(docs.select(GraftExpressions.wordShingles($"text", 3).as("w")),
        "graft_shingles")
      codegenLine(docs.select(GraftExpressions.wordNGrams($"text", 8).as("g")),
        "graft_word_ngrams")
      codegenLine(docs.select(GraftExpressions.wordChunks($"text", 32, 8).as("c")),
        "graft_word_chunks")
      codegenLine(docs.select(GraftExpressions.repetitionStats($"text").as("r")),
        "graft_repetition_stats")
      codegenLine(docs.select(GraftExpressions.windowSetContains(
        $"text", 13, Array(1L, 2L, 3L)).as("b")), "graft_window_set_contains")
      codegenLine(docs.select(GraftExpressions.stripWindowsInSet(
        $"text", 8, Array(1L, 2L, 3L)).as("ct")), "graft_strip_windows")
      codegenLine(docs.select(GraftExpressions.bpeEncode(
        $"text", Seq(("a", "b"), ("ab", "</w>"))).as("p")), "graft_bpe_encode")
      codegenLine(docs.select(GraftExpressions.bpeCount(
        $"text", Seq(("a", "b"))).as("n")), "graft_bpe_count")
      val withSh = docs.select($"doc_id",
        GraftExpressions.wordShingles($"text", 3).as("sh"))
      codegenLine(withSh.as("a").crossJoin(withSh.as("b")).limit(50).select(
        GraftExpressions.jaccardSimilarity($"a.sh", $"b.sh").as("j")),
        "graft_jaccard(")
      val emb = Tables.load(spark, sf0, "embeddings").limit(100)
      codegenLine(emb.select(GraftExpressions.hyperplaneSignatures(
        $"embedding", 12, 8).as("hp")), "graft_hyperplane")
      val embD = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val pqSeeds = embD.orderBy($"vec_id").limit(4)
        .select($"v").as[Seq[Double]].collect()
      val pqDim = pqSeeds.head.size
      val pqBooks = for {
        s <- 0 until 4; (sv, i) <- pqSeeds.zipWithIndex
      } yield (s, i.toLong, sv.slice(s * (pqDim / 4), (s + 1) * (pqDim / 4)): Seq[Double])
      codegenLine(embD.select(
        GraftExpressions.pqAssign($"v", pqBooks).as("codes")), "graft_pq_assign")
      // the lake-layout Morton key: inline integer bit arithmetic
      codegenLine(docs.select(GraftExpressions.interleaveBits(
        Seq($"doc_id", ($"doc_id" * 7L) % 100L), 8).as("z")),
        "graft_interleave_bits")
      // the per-file Bloom manifest probe: per-ROW sketch, literal keys
      val bmRows = docs.groupBy(($"doc_id" % 4).as("g"))
        .agg(GraftExpressions.bloomSketch(
          org.apache.spark.sql.functions.xxhash64($"doc_id"),
          1000L, 0.01).as("b"))
        .repartition(2) // barrier: keep the probe out of the agg's
                        // result projection so its own span is visible
      codegenLine(bmRows.select(GraftExpressions.bloomMightContainAny(
        $"b", Seq(1L, 2L, 3L)).as("m")), "graft_bloom_any")
      // the CDF rank serve: explode once, binary-search per row
      val sk = docs.agg(GraftExpressions.kllSketch(
        org.apache.spark.sql.functions.length($"text").cast("double"),
        64).as("s"))
      codegenLine(docs.crossJoin(org.apache.spark.sql.functions
          .broadcast(sk.select(GraftExpressions.kllCdf($"s").as("c"))))
        .select(GraftExpressions.cdfRank($"c.items", $"c.cumw", $"c.n",
          org.apache.spark.sql.functions.lit(5.0)).as("r")),
        "graft_cdf_rank")
      // TWO kllCdf instances in ONE projection (the zValueByQuantile
      // shape): each instance's generated locals must be fresh-named —
      // a fixed name collides in janino and silently falls back
      val sk2 = docs.agg(
        GraftExpressions.kllSketch(
          org.apache.spark.sql.functions.length($"text").cast("double"),
          64).as("s0"),
        GraftExpressions.kllSketch($"doc_id".cast("double"), 64).as("s1"))
        .repartition(2) // barrier: keep the probe out of the agg's
                        // result projection so its own span is visible
      codegenLine(sk2.select(GraftExpressions.kllCdf($"s0").as("c0"),
        GraftExpressions.kllCdf($"s1").as("c1")), "graft_kll_cdf")
      // the full equal-frequency Morton key rides the same kernels
      codegenLine(graft.core.Layout.zValueByQuantile(
        docs.select($"doc_id", $"n_chars"), Seq("doc_id", "n_chars"),
        bits = 6, k = 64), "graft_interleave_bits")
      // the generator: the Generate node itself carries the codegen star
      // (CollectionGenerator path — same machinery as explode/inline)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5)
      pairs.collect()
      val pplan = finalPlan(pairs)
      val gen = pplan.linesIterator
        .filter(_.contains("Generate graft_pair_generator")).toSeq
      assert(gen.nonEmpty, s"no PairGenerator Generate node:\n$pplan")
      assert(gen.forall(_.contains("*(")),
        s"Generate outside WholeStageCodegen:\n${gen.mkString("\n")}")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  // ------------------------------------------------------------- topKByKey
  test("topKByKey matches the window row_number formulation on real data") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf0, "documents")
    // composite unique key (hash, id) makes both formulations deterministic
    val hkey = struct(md5(concat(lit("tk:"), $"doc_id".cast("string"))), $"doc_id")
    val viaAgg = docs.groupBy($"lang")
      .agg(GraftExpressions.topKByKey(hkey, $"doc_id", 7).as("top"))
      .select($"lang", posexplode($"top"))
      .select($"lang", ($"pos" + 1).as("rk"), $"col.payload".as("doc_id"))
      .as[(String, Int, Long)].collect().toSet
    val viaWindow = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy($"lang").orderBy(
          md5(concat(lit("tk:"), $"doc_id".cast("string"))), $"doc_id")))
      .filter($"rk" <= 7).select($"lang", $"rk", $"doc_id")
      .as[(String, Int, Long)].collect().toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("topKByKey keeps largest keys when asc=false, skips null keys, handles small groups") {
    val df = Seq(
      ("a", Some(3L), 30L), ("a", Some(1L), 10L), ("a", Some(2L), 20L),
      ("a", None, 99L),    // null key: skipped
      ("b", Some(5L), 50L) // group smaller than k
    ).toDF("g", "key", "p")
    val out = df.groupBy($"g")
      .agg(GraftExpressions.topKByKey($"key", $"p", 2, asc = false).as("top"))
      .select($"g", $"top.payload".as("ps"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("a") == Seq(30L, 20L))  // best-first (largest keys)
    assert(out("b") == Seq(50L))
  }

  test("topKByKey runs under ObjectHashAggregate (map-side combining, no window sort)") {
    val docs = Tables.load(spark, sf0, "documents")
    val df = docs.groupBy($"lang")
      .agg(GraftExpressions.topKByKey($"doc_id", $"doc_id", 3).as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }

  test("topKByKeyPerGroup: parity with fixed-k form at constant k") {
    val docs = Tables.load(spark, sf0, "documents")
    val hkey = struct(md5(concat(lit("pg:"), $"doc_id".cast("string"))), $"doc_id")
    def explode3(df: org.apache.spark.sql.DataFrame) = df
      .select($"lang", posexplode($"top"))
      .select($"lang", ($"pos" + 1).as("rk"), $"col.payload".as("doc_id"))
      .as[(String, Int, Long)].collect().toSet
    val fixed = explode3(docs.groupBy($"lang")
      .agg(GraftExpressions.topKByKey(hkey, $"doc_id", 5).as("top")))
    val perGroup = explode3(docs.groupBy($"lang")
      .agg(GraftExpressions.topKByKeyPerGroup(hkey, $"doc_id", lit(5))
        .as("top")))
    assert(perGroup == fixed && perGroup.nonEmpty)
  }

  test("topKByKeyPerGroup: loud contract failures (varying k, null k, k<1)") {
    def rootMsgs(t: Throwable): String = {
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    }
    val varying = Seq(("a", 1L, 3), ("a", 2L, 4)).toDF("g", "id", "k")
    val e1 = intercept[Throwable] {
      varying.coalesce(1).groupBy($"g")
        .agg(GraftExpressions.topKByKeyPerGroup(struct($"id"), $"id", $"k"))
        .collect()
    }
    assert(rootMsgs(e1).contains("k changed within one group"), rootMsgs(e1))
    val nullK = Seq(("a", 1L)).toDF("g", "id")
      .withColumn("k", lit(null).cast("int"))
    val e2 = intercept[Throwable] {
      nullK.groupBy($"g")
        .agg(GraftExpressions.topKByKeyPerGroup(struct($"id"), $"id", $"k"))
        .collect()
    }
    assert(rootMsgs(e2).contains("NULL k"), rootMsgs(e2))
    val zeroK = Seq(("a", 1L, 0)).toDF("g", "id", "k")
    val e3 = intercept[Throwable] {
      zeroK.groupBy($"g")
        .agg(GraftExpressions.topKByKeyPerGroup(struct($"id"), $"id", $"k"))
        .collect()
    }
    assert(rootMsgs(e3).contains("outside [1,"), rootMsgs(e3))
  }

  test("misraGries: heavy-hitter guarantee and count lower bounds hold " +
      "under arbitrary partitioning") {
    // Zipf-ish stream: item k appears ~1000/k times; plus a long unique
    // tail that forces constant evictions
    val heavy = (1 to 40).flatMap(k => Seq.fill(1000 / k)(s"item$k"))
    val tail = (1 to 3000).map(i => s"rare$i")
    val stream = new scala.util.Random(42).shuffle(heavy ++ tail)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val cap = 64
    for (parts <- Seq(1, 7)) {
      val sk = stream.toDF("token").repartition(parts)
        .agg(GraftExpressions.misraGries($"token", cap).as("sk"))
        .select(explode($"sk").as("e"))
        .select($"e.item".as("item"), $"e.count_lb".as("lb"))
        .as[(String, Long)].collect().toMap
      assert(sk.size <= cap)
      val bound = n / (cap + 1)
      // every item with freq > N/(cap+1) must be present
      exact.filter(_._2 > bound).keys.foreach { k =>
        assert(sk.contains(k), s"lost heavy hitter $k (parts=$parts)")
      }
      // counts are lower bounds, short by at most the bound
      sk.foreach { case (k, lb) =>
        assert(lb <= exact(k), s"$k overcounted: $lb > ${exact(k)}")
        assert(exact(k) - lb <= bound,
          s"$k deficit ${exact(k) - lb} > $bound")
      }
    }
  }

  test("misraGries: non-atomic item types are refused at analysis") {
    // struct rows compare by reference and arrays mix Generic/Unsafe
    // representations — as hash-map keys either silently corrupts counts
    val df = Seq(("a", 1)).toDF("s", "i")
    val e = intercept[Exception] {
      df.agg(GraftExpressions.misraGries(struct($"s", $"i"), 8)).collect()
    }
    assert(e.getMessage.contains("not atomic"), e.getMessage)
  }

  test("misraGries: small-vocab sketch is exact; output sorted " +
      "(count desc, item); nulls skipped") {
    val df = Seq(Some("b"), Some("a"), Some("b"), None, Some("c"),
      Some("b"), Some("a")).toDF("t")
    val out = df.agg(GraftExpressions.misraGries($"t", 10).as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.item", $"e.count_lb").as[(String, Long)].collect()
    // vocab ≤ capacity → no eviction ever → exact counts
    assert(out.toSeq == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("countMin: wide sketch is exact on a small vocab; narrow sketch " +
      "only ever OVERcounts; n tracked; nulls skipped") {
    val counts = Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L)
    val rows = counts.toSeq.flatMap { case (t, c) =>
      Seq.fill(c.toInt)(Option(t)) } :+ (None: Option[String])
    val df = rows.toDF("t")
    for (width <- Seq(4, 4096)) {
      val sk = df.agg(GraftExpressions.countMinSketch($"t", 4, width)
        .as("sk"))
      val ests = counts.keys.toSeq.toDF("token")
        .crossJoin(sk)
        .select($"token", GraftExpressions.countMinEstimate($"sk", $"token"),
          GraftExpressions.countMinN($"sk"))
        .as[(String, Long, Long)].collect()
      ests.foreach { case (t, est, n) =>
        assert(n == 11L, s"n=$n (width=$width)")
        assert(est >= counts(t), s"$t undercounted: $est (width=$width)")
        if (width == 4096) assert(est == counts(t),
          s"$t inexact at collision-free width: $est")
      }
    }
  }

  test("countMin: slice merge is bit-for-bit the single-pass build, " +
      "under any partitioning") {
    val docs = (1 to 500).map(i => (i % 5, s"tok${i % 37} tok${i % 11}"))
      .toDF("slice", "text")
      .selectExpr("slice", "explode(split(text, ' ')) AS t")
    val single = docs.repartition(1)
      .agg(GraftExpressions.countMinSketch($"t", 4, 64))
      .head().getAs[Array[Byte]](0)
    val shuffled = docs.repartition(7)
      .agg(GraftExpressions.countMinSketch($"t", 4, 64))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(single, shuffled),
      "cellwise sums must be partitioning-independent")
    val merged = docs.groupBy("slice")
      .agg(GraftExpressions.countMinSketch($"t", 4, 64).as("sk"))
      .agg(GraftExpressions.countMinUnion($"sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(single, merged),
      "slice union must equal the one-shot build byte-for-byte")
  }

  test("countMin: union refuses geometry mismatches loudly; bad " +
      "geometry and non-string items are refused at analysis") {
    val a = Seq("x").toDF("t")
      .agg(GraftExpressions.countMinSketch($"t", 4, 64).as("sk"))
    val b = Seq("y").toDF("t")
      .agg(GraftExpressions.countMinSketch($"t", 4, 128).as("sk"))
    val e = intercept[Exception] {
      a.unionAll(b).agg(GraftExpressions.countMinUnion($"sk")).collect()
    }
    assert(e.getMessage.contains("geometry mismatch"), e.getMessage)
    val e2 = intercept[Exception] {
      Seq("x").toDF("t")
        .agg(GraftExpressions.countMinSketch($"t", 5, 64)).collect()
    }
    assert(e2.getMessage.contains("md5 has 4"), e2.getMessage)
    val e3 = intercept[Exception] {
      Seq(1L).toDF("k")
        .agg(GraftExpressions.countMinSketch($"k", 4, 64)).collect()
    }
    assert(e3.getMessage.contains("must be STRING"), e3.getMessage)
  }

  test("countMin: SQL-registered (graft_countmin / _union / _est / _n)") {
    GraftExpressions.registerAll(spark)
    val r = spark.sql(
      """WITH sk AS (
        |  SELECT s, graft_countmin(t, 4, 64) AS sk
        |  FROM VALUES (0,'a'), (0,'a'), (1,'b') AS v(s, t) GROUP BY s),
        |m AS (SELECT graft_countmin_union(sk) AS sk FROM sk)
        |SELECT graft_countmin_est(sk, 'a'), graft_countmin_n(sk)
        |FROM m""".stripMargin).as[(Long, Long)].head()
    assert(r == ((2L, 3L)))
  }

  implicit class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(t => ((t._1, t._2), t._3)).toMap
  }
}
