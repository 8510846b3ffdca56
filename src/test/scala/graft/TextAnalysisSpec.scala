package graft

import org.apache.spark.sql.functions._

import graft.llm.{TextAnalysis => TA}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(
      implicit enc: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("t").select(c).as[T].head()

  test("token counting") {
    assert(one[Int](TA.tokenCount(col("t")), "a b  c") == 3)
    assert(one[Int](TA.tokenCount(col("t")), "   ") == 0)
    assert(one[Int](TA.tokenCount(col("t")), "") == 0)
    assert(one[Int](TA.tokenCount(col("t")), "single") == 1)
  }

  test("subword estimate: ceil(len/4) per token") {
    // "hello"(2) + "hi"(1) + "tokenizers"(3)
    assert(one[Long](TA.subwordCountEstimate(col("t")), "hello hi tokenizers") == 6L)
  }

  test("character-class ratios") {
    assert(one[Double](TA.punctRatio(col("t")), "ab!?") == 0.5)
    assert(one[Double](TA.upperRatio(col("t")), "AbCd") == 0.5)
    assert(one[Double](TA.alphaRatio(col("t")), "ab12") == 0.5)
    assert(one[Double](TA.punctRatio(col("t")), "") == 0.0)
  }

  test("stopword ratio and mean word length") {
    assert(one[Double](TA.stopwordRatio(col("t")), "the cat sat on a mat") == 0.5)
    assert(one[Double](TA.meanWordLength(col("t")), "ab abcd") == 3.0)
  }

  test("quality score is bounded and monotone in fluency") {
    val fluent = "the quick brown fox jumps over the lazy dog and runs on to the hills"
    val junk = "XQZT!!! ###% ZZKW!!!! @@@@@ PQRST!!!"
    val qf = one[Double](TA.qualityScore(col("t")), fluent)
    val qj = one[Double](TA.qualityScore(col("t")), junk)
    assert(qf > qj)
    assert(qf <= 1.0 && qj >= 0.0)
  }

  test("langId picks marker language, und on no hits") {
    assert(one[String](TA.langId(col("t")),
      "the cat is of the house and it is fine") == "en")
    assert(one[String](TA.langId(col("t")),
      "der hund ist nicht das problem und die katze") == "de")
    assert(one[String](TA.langId(col("t")),
      "le chat est dans les jardins et une maison") == "fr")
    assert(one[String](TA.langId(col("t")),
      "el perro y la casa que es un gato") == "es")
    assert(one[String](TA.langId(col("t")), "xyzzy plugh") == "und")
  }

  test("tokenStatsByLang aggregates exact counts per predicted language") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is grey"),        // en: 4 tok, 4 subwords, 15 chars
      (2L, "der hund ist nicht da"),  // de: 5 tok, 6 subwords, 21 chars
      (3L, "zzz qqq"),                // und: 2 tok, 2 subwords, 7 chars
      (4L, "")                        // und: blank — 0 everywhere
    ).toDF("doc_id", "text")
    val out = TA.tokenStatsByLang(df, "text")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect().toSet
    assert(out == Set(
      ("en", 1L, 4L, 4L, 15L, Some(1.0)),
      ("de", 1L, 5L, 6L, 21L, Some(1.2)),
      ("und", 2L, 2L, 2L, 7L, Some(1.0))))
  }

  test("tokenStatsByLang: fertility is null for a zero-token bucket") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = TA.tokenStatsByLang(df, "text")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect().toSet
    assert(out == Set(("und", 2L, 0L, 0L, 3L, None)))
  }

  test("langIdConfusion: exact counts and per-label shares") {
    import spark.implicits._
    val df = Seq(
      ("en", "the cat is here"), ("en", "the dog and it"),
      ("en", "zzz qqq"), // an en-labeled doc the heuristic misses
      ("de", "der hund ist da")
    ).toDF("lang", "text")
    val out = TA.langIdConfusion(df, "text", "lang")
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(
      ("en", "en", 2L, 0.666667), ("en", "und", 1L, 0.333333),
      ("de", "de", 1L, 1.0)))
  }

  test("fingerprint is invariant under word order and repetition") {
    val a = one[String](TA.fingerprint(col("t")), "alpha beta gamma")
    val b = one[String](TA.fingerprint(col("t")), "gamma alpha beta beta")
    val c = one[String](TA.fingerprint(col("t")), "alpha beta delta")
    assert(a == b)
    assert(a != c)
  }

  test("rollingHash is order-sensitive (complement of fingerprint)") {
    val a = one[Long](TA.rollingHash(col("t")), "alpha beta gamma")
    val b = one[Long](TA.rollingHash(col("t")), "gamma beta alpha")
    assert(a != b)
    val a2 = one[Long](TA.rollingHash(col("t")), "alpha beta gamma")
    assert(a == a2)
  }

  test("normalizeText lowercases, strips non-alphanumerics, collapses space") {
    assert(one[String](TA.normalizeText(col("t")),
      "  Hello,   World! (v2.0) ") == "hello world v2 0")
    assert(one[String](TA.normalizeText(col("t")), "Café—ole") == "caf ole")
    assert(one[String](TA.normalizeText(col("t")), "...") == "")
  }

  test("maskPii masks emails, IPs, and long digit runs in the right order") {
    assert(one[String](TA.maskPii(col("t")),
      "mail jane.doe+x@corp.example.org now") == "mail <EMAIL> now")
    assert(one[String](TA.maskPii(col("t")),
      "from 192.168.10.1 port 8080") == "from <IP> port 8080")
    assert(one[String](TA.maskPii(col("t")),
      "acct 123456789 ok, pin 1234 kept") == "acct <NUM> ok, pin 1234 kept")
    // the IP's octets must not be re-masked as numbers
    assert(one[String](TA.maskPii(col("t")),
      "a@b.co 10.0.0.1 99999999") == "<EMAIL> <IP> <NUM>")
  }

  test("repetitionStats computes Gopher-style n-gram fractions") {
    def stats(text: String): (Double, Double, Double, Double, Double, Double) =
      Seq(text).toDF("t").select(TA.repetitionStats(col("t")).as("r"))
        .select("r.*")
        .as[(Double, Double, Double, Double, Double, Double)].head()
    // "a a b": unigrams {a:2,b:1} total 3 → dup 1/3, top 2/3;
    // bigrams {"a a","a b"} total 2 → dup 0, top 1/2;
    // trigrams {"a a b"} total 1 → dup 0, top 1
    assert(stats("a a b") ==
      (1.0 / 3, 2.0 / 3, 0.0, 0.5, 0.0, 1.0))
    // repeated bigram: "x y x y" bigrams = {x y:2, y x:1} total 3
    val (_, _, db, tb, _, _) = stats("x y x y")
    assert(db == 1.0 / 3 && tb == 2.0 / 3)
    assert(stats("") == (0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    assert(stats("solo") == (0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    // whitespace-only behaves as empty, not one empty token
    assert(stats("   ") == (0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("repetitionOk rejects degenerate repeated text, keeps normal prose") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near a river bank"),
      (2L, "spam spam spam spam spam spam spam spam spam spam")).toDF("id", "t")
    val kept = df.filter(TA.repetitionOk(col("t"))).select("id").as[Long].collect()
    assert(kept.toSeq == Seq(1L))
  }

  test("mixCorpus applies per-stratum rates, default elsewhere") {
    val docs = Tables.load(spark, sf0, "documents")
    val mixed = docs.filter(TA.mixCorpus(col("source"), col("text"),
        Map("src0" -> 0.0, "src1" -> 1.0), defaultRate = 0.5))
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(!mixed.contains("src0"))              // rate 0 → stratum dropped
    assert(mixed("src1") == 25L)                 // rate 1 → stratum intact
    // default strata sample at ~0.5 (content-hash, exact per sampleByHash)
    val rest = mixed.view.filterKeys(k => k != "src0" && k != "src1").values.sum
    assert(math.abs(rest / 450.0 - 0.5) < 0.1, s"rest $rest")
    // stratum rate nests within a larger rate of the same stratum
    val small = docs.filter(TA.mixCorpus(col("source"), col("text"),
      Map("src2" -> 0.25), 0.0)).select("doc_id").as[Long].collect().toSet
    val big = docs.filter(TA.mixCorpus(col("source"), col("text"),
      Map("src2" -> 0.75), 0.0)).select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("chunkDocuments splits with overlap, short tail, no contained chunk") {
    def chunks(text: String, size: Int, overlap: Int): Seq[(Int, String, Long)] =
      TA.chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"), "doc_id",
          "text", size, overlap)
        .select("chunk_index", "chunk", "n_tokens")
        .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    val ws = (1 to 10).map(i => s"w$i")
    // len 10, size 8, overlap 4 → starts 0 and 4 ONLY (a start-8 chunk
    // would be fully contained in the start-4 chunk)
    assert(chunks(ws.mkString(" "), 8, 4) == Seq(
      (0, ws.take(8).mkString(" "), 8L),
      (1, ws.drop(4).mkString(" "), 6L)))
    // exact fit → one chunk; shorter than size → one chunk; empty → none
    assert(chunks(ws.take(8).mkString(" "), 8, 4).map(_._3) == Seq(8L))
    assert(chunks("a b", 8, 4) == Seq((0, "a b", 2L)))
    assert(chunks("", 8, 4).isEmpty)
    // zero overlap partitions the tokens exactly
    val parts = chunks(ws.mkString(" "), 4, 0)
    assert(parts.map(_._3).sum == 10L && parts.size == 3)
  }

  test("sampleByHash is deterministic, content-keyed, and ~rate-sized") {
    val docs = Tables.load(spark, sf0, "documents")
    val n = docs.count().toDouble
    val s1 = docs.filter(TA.sampleByHash(col("text"), 0.25))
      .select("doc_id").as[Long].collect().toSet
    val s2 = docs.repartition(13).filter(TA.sampleByHash(col("text"), 0.25))
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2) // partitioning-independent
    assert(math.abs(s1.size / n - 0.25) < 0.08, s"rate ${s1.size / n}")
    // monotone: a larger rate strictly contains a smaller one
    val s3 = docs.filter(TA.sampleByHash(col("text"), 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
    assert(docs.filter(TA.sampleByHash(col("text"), 0.0)).isEmpty)
  }

  test("gopherFlags applies each §A1.1 rule on hand-built documents") {
    val good = (("the quick brown fox jumps over and over with plenty " * 6)
      + "of that have words be here now").trim // >50 words, sane lengths
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short to pass the count rule"),    // wordcount fails
      (3L, ("a " * 60).trim),                      // mean word len 1 < 3
      (4L, good + (" ###" * 20)),                  // symbol ratio > 0.1
      (5L, good.split(" ").map("- " + _).mkString("\n")), // all bullets
      (6L, good.split(" ").grouped(8).map(_.mkString(" ") + " ...")
        .mkString("\n")),                          // every line ends ...
      (7L, ("12345 " * 60).trim),                  // no alphabetic words
      (8L, ("zork blap fizz " * 20).trim)          // no required stopwords
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TA.gopherFlags(col("text")).as("g")).select("doc_id", "g.*")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(8), "doc 1 must pass the full gate")
    assert(!out(2L).getBoolean(1), "wordcount_ok")       // field 1
    assert(!out(3L).getBoolean(2), "mean_len_ok")
    assert(!out(4L).getBoolean(3), "symbol_ok")
    assert(!out(5L).getBoolean(4), "bullet_ok")
    assert(!out(6L).getBoolean(5), "ellipsis_ok")
    assert(!out(7L).getBoolean(6), "alpha_ok")
    assert(!out(8L).getBoolean(7), "stopword_ok")
    assert((2L to 8L).forall(i => !out(i).getBoolean(8)), "composite keep")
    // facade filters to exactly the passing rows
    assert(TA.gopherGate(docs, "text").select("doc_id")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("c4Clean keeps punctuated >=minWords lines and drops code/lorem pages") {
    val page =
      """this line has exactly six words.
        |no terminal punctuation on this line
        |short one.
        |another fully valid sentence sits right here!
        |does this question have enough words too?""".stripMargin
    val docs = Seq(
      (1L, page),                                    // 3 kept lines → keep
      (2L, page + "\nlorem ipsum dolor sit amet."),  // lorem → drop
      (3L, page + "\nif (x) { return y; }"),         // brace → drop
      (4L, "one good sentence is not enough here.")  // <3 kept → drop
    ).toDF("doc_id", "text")
    val out = TA.c4Clean(docs, "text")
      .select("doc_id", "n_lines_kept", "keep", "clean_text")
      .as[(Long, Int, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 3 && out(1L)._3)
    assert(out(1L)._4 ==
      """this line has exactly six words.
        |another fully valid sentence sits right here!
        |does this question have enough words too?""".stripMargin)
    assert(out(2L)._2 == 4 && !out(2L)._3) // lorem line kept, page dropped
    assert(out(3L)._2 == 3 && !out(3L)._3)
    assert(out(4L)._2 == 1 && !out(4L)._3)
  }

  test("lineStats measures duplicate-line and duplicate-char fractions") {
    val docs = Seq(
      (1L, "alpha beta\ngamma\nalpha beta\ndelta"), // line 3 = line 1
      (2L, "all\nlines\nunique"),
      (3L, "same\nsame\nsame\nsame"),
      (4L, "")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TA.lineStats(col("text")).as("s")).select("doc_id", "s.*")
      .as[(Long, Int, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4, 0.25, 0.333333))) // 10 dup chars of 30
    assert(out(2L) == ((2L, 3, 0.0, 0.0)))
    assert(out(3L) == ((3L, 4, 0.75, 0.75)))
    assert(out(4L) == ((4L, 1, 0.0, 0.0))) // empty text → one empty line
  }

  test("gopher gate and c4 clean run scan-side (zero exchanges)") {
    // both are pure projections: at 100 TB they ride the parquet scan
    // stage — any Exchange here would be a plan regression
    for (q <- Seq("text_gopher_gate", "text_c4_clean",
        "text_strip_html", "text_url_canonical")) {
      val plan = SparkEntry.queries(q)(spark, sf0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$q plan shuffles:\n$plan")
    }
  }

  test("stripHtml: tags, script/style subtrees, comments, entity decoding") {
    def strip(s: String): String =
      Seq(s).toDF("t").select(TA.stripHtml(col("t"))).as[String].head()
    assert(strip("<html><body><p>hello <b>world</b></p></body></html>") ==
      "hello world")
    assert(strip("<style>p{a:1}</style>keep<script>drop();</script>me") ==
      "keep me")
    // script content with tags inside a string must still vanish (lazy
    // match to the CLOSING tag)
    assert(strip("<script>var s = '<p>x</p>';</script>after") == "after")
    assert(strip("a <!-- <b>gone</b> --> b") == "a b")
    assert(strip("x &lt;tag&gt; &amp; &quot;q&quot; &#39;a&#39;&nbsp;y") ==
      "x <tag> & \"q\" 'a' y")
    // double-escaped: &amp;lt; is the literal TEXT '&lt;'
    assert(strip("&amp;lt;") == "&lt;")
    // malformed markup degrades, never throws: an unclosed tag (no '>')
    // is not a tag — its text survives rather than swallowing the rest
    assert(strip("<p unclosed attr») text") == "<p unclosed attr») text")
    // the documented heuristic trade: a '<…>' spanning prose is eaten
    // (regex pass, not a parser) — pinned so the behavior is deliberate
    assert(strip("a < b and c > d") == "a d")
  }

  test("canonicalizeUrl: authority lowering, ports, tracking params, fragments") {
    def canon(s: String): String =
      Seq(s).toDF("u").select(TA.canonicalizeUrl(col("u"))).as[String].head()
    assert(canon("HTTPS://WWW.Example.COM:443/KeepCase/?utm_source=x&id=5#frag")
      == "https://example.com/KeepCase/?id=5")
    assert(canon("http://Host.org:80/a/b/") == "http://host.org/a/b")
    // non-default port survives
    assert(canon("https://h.io:8443/x") == "https://h.io:8443/x")
    // tracking-only query collapses entirely
    assert(canon("https://a.b/p?utm_campaign=z&fbclid=abc") == "https://a.b/p")
    // interior utm between kept params repairs the separators
    assert(canon("https://a.b/p?x=1&utm_a=2&y=3") == "https://a.b/p?x=1&y=3")
    // path/query case preserved; only scheme+authority lower
    assert(canon("HTTP://A.B/QueryCase?Q=V") == "http://a.b/QueryCase?Q=V")
    // non-URL input: only generic cleanups apply
    assert(canon("  not a url  ") == "not a url")
    // userinfo: default port strips through `user:pass@` (the ':' in the
    // userinfo must not break the port match) — with and without
    // credentials canonicalize to the same key shape
    assert(canon("https://u:p@Host.COM:443/x") == "https://u:p@host.com/x")
    assert(canon("https://u:p@Host.COM/x") == "https://u:p@host.com/x")
    assert(canon("http://alice@h.org:80/") == "http://alice@h.org")
    // non-default port with userinfo survives
    assert(canon("https://u:p@h.io:8443/x") == "https://u:p@h.io:8443/x")
    // an '@' later in the path does not fake a userinfo
    assert(canon("https://h.io:443/a@b") == "https://h.io/a@b")
  }

  test("scriptProfile: hand vectors across scripts; zero-shuffle plan") {
    import graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "Hello 123"),
      (2L, "你好世界"), // 你好世界 — 4 Han chars
      (3L, "привет"), // привет — Cyrillic
      (4L, "1234 !?"),
      (5L, "mixed 中文 words here"), // latin-dominant + 2 Han
      (6L, ""),
      // vertical tab between a and b: in the explicit space class
      // (Java \s and RE2 \s disagree on it — see scriptProfile)
      (7L, "a\u000Bb")).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        TextAnalysis.scriptProfile($"text").as("p"))
      .select($"doc_id", $"p.n_latin", $"p.n_digit", $"p.n_space",
        $"p.n_han", $"p.n_other_nonascii", $"p.script")
      .as[(Long, Int, Int, Int, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(out(1L) == ((5, 3, 1, 0, 0, "latin")))
    assert(out(2L) == ((0, 0, 0, 4, 0, "han")))
    assert(out(3L) == ((0, 0, 0, 0, 6, "other")))
    assert(out(4L) == ((0, 4, 1, 0, 0, "none")))
    assert(out(5L) == ((14, 0, 3, 2, 0, "latin")))
    assert(out(6L) == ((0, 0, 0, 0, 0, "none")))
    assert(out(7L) == ((2, 0, 1, 0, 0, "latin")))
    // pure scan-side projection
    val plan = docs.select(TextAnalysis.scriptProfile($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"profile shuffled:\n$plan")
  }

  test("langIdLines: per-line majority, tie to smallest lang, blank " +
      "lines excluded, all-blank docs drop") {
    val en = "the cat and the dog is in that house"
    val de = "der hund und die katze ist nicht ein vogel"
    val docs = Seq(
      // 2 en lines + 1 de line + a blank → dominant en, mixed 1/3
      (1L, s"$en\n$de\n \n$en"),
      // 1 en + 1 de → tie → de (lexicographically smaller)
      (2L, s"$en\n$de"),
      // pure de
      (3L, de),
      // only blank lines → drops
      (4L, " \n ")
    ).toDF("doc_id", "text")
    val out = TA.langIdLines(docs, "doc_id", "text")
      .select("doc_id", "n_lines", "dominant_lang", "n_dominant",
        "mixed_frac")
      .as[(Long, Long, String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), out.toString)
    assert(out(1L) == ((3L, "en", 2L, 0.333333)), out(1L).toString)
    assert(out(2L) == ((2L, "de", 1L, 0.5)), out(2L).toString)
    assert(out(3L) == ((1L, "de", 1L, 0.0)), out(3L).toString)
  }
}
