package graft

import org.apache.spark.sql.functions._

import graft.llm.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // hand-traceable corpus: "low"×5, "lowest"×2
  private val handCounts = Seq("low" -> 5L, "lowest" -> 2L)

  test("trainFromWordCounts: greedy merges with deterministic tie-break, hand-traced") {
    // pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, rest 2 —
    // tie at 7 breaks to the lexicographically smallest pair (l,o);
    // rounds 4-5 are all-tied at 2, again lexicographic
    val m = Bpe.trainFromWordCounts(handCounts, numMerges = 5)
    assert(m.merges == Seq(
      ("l", "o"), ("lo", "w"), ("low", "</w>"), ("e", "s"), ("es", "t")))
    assert(m.pieces == Seq("lo", "low", "low</w>", "es", "est"))
  }

  test("trainFromWordCounts stops early when nothing is left to merge") {
    val m = Bpe.trainFromWordCounts(Seq("ab" -> 1L), numMerges = 100)
    // a+b, ab+</w> — then every word is one symbol, loop must stop
    assert(m.merges == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("encode applies merges in rank order; unseen suffixes fall back to chars") {
    val model = Bpe.trainFromWordCounts(handCounts, numMerges = 5)
    val out = Bpe.encode(Seq(("low lowest lower")).toDF("text"), "text", model)
      .select("pieces").as[Seq[String]].head()
    assert(out == Seq(
      "low</w>",                  // trained word, fully merged
      "low", "est", "</w>",       // trained word via its merges
      "low", "e", "r", "</w>"))   // unseen word: shared prefix + chars
  }

  test("encode with an empty model yields code-point symbols plus </w>") {
    val out = Bpe.encode(Seq(("ab c")).toDF("text"), "text", Bpe.Model(Nil))
      .select("pieces").as[Seq[String]].head()
    assert(out == Seq("a", "b", "</w>", "c", "</w>"))
    // non-BMP character stays ONE symbol (never split into surrogates)
    val emoji = Bpe.encode(Seq(("a😀")).toDF("text"), "text",
        Bpe.Model(Nil))
      .select("pieces").as[Seq[String]].head()
    assert(emoji == Seq("a", "😀", "</w>"))
  }

  test("encode round-trips: pieces concatenate back to the token stream") {
    val docs = Tables.load(spark, sf0, "documents")
      .filter(col("doc_id") < 50)
    val model = Bpe.train(docs, "text", numMerges = 40)
    val rows = Bpe.encode(docs, "text", model)
      .select(col("text"), array_join(col("pieces"), "").as("glued"))
      .as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (text, glued) =>
      val expected = text.trim.split("\\s+").mkString(Bpe.EndOfWord) +
        (if (text.trim.isEmpty) "" else Bpe.EndOfWord)
      assert(glued == expected, s"round-trip broke for: $text")
    }
  }

  test("decode inverts encode at any merge count; blanks decode to empty") {
    val docs = Tables.load(spark, sf0, "documents")
      .filter(col("doc_id") < 50)
    for (n <- Seq(0, 40, 2000)) {
      val model = Bpe.train(docs, "text", numMerges = n)
      val rows = Bpe.decode(Bpe.encode(docs, "text", model), "pieces")
        .select(col("text"), col("decoded")).as[(String, String)].collect()
      rows.foreach { case (text, decoded) =>
        assert(decoded == text.trim.split("\\s+").filter(_.nonEmpty)
          .mkString(" "), s"decode broke at numMerges=$n for: $text")
      }
    }
    val blank = Bpe.decode(
      Bpe.encode(Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text"),
        "text", Bpe.Model(Seq.empty)), "pieces")
      .select("decoded").as[String].collect().toSeq
    assert(blank == Seq("", ""))
  }

  test("more merges never increase the token count; floor is one piece per word") {
    val docs = Tables.load(spark, sf0, "documents")
      .filter(col("doc_id") < 100)
    val m0 = Bpe.Model(Nil)
    val m20 = Bpe.train(docs, "text", numMerges = 20)
    val m80 = Bpe.train(docs, "text", numMerges = 80)
    def counts(m: Bpe.Model): Map[Long, Long] =
      Bpe.tokenCount(docs, "text", m).select("doc_id", "n_bpe_tokens")
        .as[(Long, Long)].collect().toMap
    val c0 = counts(m0); val c20 = counts(m20); val c80 = counts(m80)
    assert(c0.keySet == c20.keySet && c20.keySet == c80.keySet)
    c0.keys.foreach { id =>
      assert(c20(id) <= c0(id) && c80(id) <= c20(id),
        s"doc $id: ${c0(id)} → ${c20(id)} → ${c80(id)}")
    }
    // fully-merged floor: at least one piece per word
    val words = docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("nw"))
      .as[(Long, Long)].collect().toMap
    c80.foreach { case (id, n) => assert(n >= words(id)) }
  }

  test("train is deterministic across partitionings; model round-trips via DataFrame") {
    val docs = Tables.load(spark, sf0, "documents")
    val a = Bpe.train(docs, "text", numMerges = 30)
    val b = Bpe.train(docs.repartition(7), "text", numMerges = 30)
    assert(a == b)
    val back = Bpe.modelFromDF(Bpe.modelToDF(spark, a).repartition(3))
    assert(back == a)
  }

  test("train reproduces the reviewed golden merge sequence at sf0.01") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val trained = Bpe.train(docs, "text", numMerges = 2000)
    val golden = Bpe.modelFromDF(spark.read.parquet("golden/bpe_merges.parquet"))
    assert(trained == golden,
      s"merge sequence drifted: trained ${trained.size} vs golden ${golden.size}")
  }

  test("tokenCount composes: BPE-budgeted packing and streaming counting") {
    // the real-world contract: pack sequences by TRAINED-TOKENIZER
    // length, not whitespace estimate — tokenCount feeds lenCol
    val docs = Tables.load(spark, sf0, "documents")
    val model = Bpe.train(docs, "text", numMerges = 40)
    val withLen = Bpe.tokenCount(docs, "text", model)
    val bench = Seq("unrelated benchmark words only").toDF("text")
    val (packed, _) = graft.llm.Corpus.buildTrainingSet(
      withLen, bench, "doc_id", "text", "source",
      budget = 512L, lenCol = Some("n_bpe_tokens"))
    assert(packed.count() > 0)
    // pure projection ⇒ works unchanged on a stream (no state, no shuffle)
    val drop = java.nio.file.Files.createTempDirectory("bpe-stream")
    java.nio.file.Files.write(drop.resolve("d.txt"),
      "low lowest lower".getBytes("UTF-8"))
    val stream = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(drop.toString)
      .select(col("content").cast("string").as("text"))
    val outDir = java.nio.file.Files.createTempDirectory("bpe-out").toString
    val ck = java.nio.file.Files.createTempDirectory("bpe-ck").toString
    val m5 = Bpe.trainFromWordCounts(handCounts, 5)
    val q = Bpe.tokenCount(stream, "text", m5)
      .writeStream.format("parquet").outputMode("append")
      .option("path", outDir).option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.read.parquet(outDir).select("n_bpe_tokens")
      .as[Long].head()
    assert(n == 8L) // low</w> | low,est,</w> | low,e,r,</w>
  }

  test("encode is a map-only projection (merge table rides in the expression)") {
    val docs = Tables.load(spark, sf0, "documents")
    val model = Bpe.trainFromWordCounts(handCounts, 5)
    val plan = Bpe.encode(docs, "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }
}
