package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.api.Jwt
import graft.core.{Diff, Rebuild}
import graft.functions.GraftFunctions

/** Randomized invariants over the core kernels — the properties the
  * example-based specs assert at single points, checked across generated
  * inputs. Sampling is seed-pinned (deterministic) because the offline
  * cache carries raw ScalaCheck without the scalatest bridge, and pinned
  * seeds keep CI stable anyway. Dataframe-valued properties use fewer,
  * larger samples (each check runs Spark jobs); pure codec properties
  * sample wider.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val keyGen: Gen[String] = for {
    depth <- Gen.choose(1, 4)
    parts <- Gen.listOfN(depth, Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8)),
      Gen.oneOf("data", "ünî©ođé", "a b", "x.y.z")))
  } yield parts.mkString("/")

  test("JWT round-trips any dataset/key and never verifies under a wrong secret") {
    val cases = samples(for {
      ds <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      key <- keyGen
      secret <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    } yield (ds, key, secret), 100)
    assert(cases.size >= 50)
    cases.foreach { case (dataset, key, secret) =>
      val now = 1000000L
      val tok = Jwt.create(dataset, key, now + 60, secret)
      assert(Jwt.verify(tok, secret, now).contains((dataset, key)),
        s"round-trip failed for ($dataset, $key)")
      assert(Jwt.verify(tok, secret + "x", now).isEmpty)
      assert(Jwt.verify(tok, secret, now + 61).isEmpty) // expired
    }
  }

  test("pathAncestors: every ancestor is a proper prefix, ordered shallow-first") {
    val keys = samples(keyGen, 60).distinct
    val got = keys.toDF("key")
      .select($"key", GraftFunctions.pathAncestors($"key").as("anc"))
      .as[(String, Seq[String])].collect()
    assert(got.nonEmpty)
    got.foreach { case (key, anc) =>
      assert(anc.length == key.count(_ == '/'), s"key=$key anc=$anc")
      anc.foreach(a => assert(key.startsWith(a + "/"), s"key=$key a=$a"))
      assert(anc == anc.sortBy(_.count(_ == '/')))
    }
  }

  test("globFilter agrees with its documented regex semantics on random paths") {
    val globs = Seq("*.txt", "a/*", "*", "a?c", "[ab]*", "*/deep/*.pdf")
    val keys = samples(keyGen, 40).distinct
    val df = keys.toDF("key").cache()
    globs.foreach { glob =>
      val matched = df.filter(GraftFunctions.globFilter($"key", Some(glob), None))
        .as[String].collect().toSet
      val re = ("^" + glob.flatMap {
        case '*' => ".*"
        case '?' => "."
        case '[' => "["
        case ']' => "]"
        case c if "\\.^$+{}()|".contains(c) => "\\" + c
        case c => c.toString
      } + "$").r
      val want = keys.filter(k => re.findFirstIn(k).isDefined).toSet
      assert(matched == want, s"glob=$glob matched=$matched want=$want")
    }
    df.unpersist()
  }

  test("keepLatest is idempotent, keeps one row per key, and keeps the max version") {
    val rowsGen = Gen.listOfN(30, for {
      k <- Gen.oneOf("a", "b", "c", "d/e")
      v <- Gen.choose(0L, 5L)
      h <- Gen.oneOf("h1", "h2", "h3")
    } yield (k, new java.sql.Timestamp(v * 1000), h))
    samples(rowsGen, 5).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("key", "updated_at", "content_hash")
      val once = Rebuild.keepLatest(df, Seq("key"), "updated_at",
        tieBreak = Seq("content_hash"))
      val twice = Rebuild.keepLatest(once, Seq("key"), "updated_at",
        tieBreak = Seq("content_hash"))
      val got = once.select("key").as[String].collect()
      assert(got.toSet == rows.map(_._1).toSet)
      assert(got.length == got.toSet.size)
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      val kept = once.as[(String, java.sql.Timestamp, String)].collect()
        .map(r => r._1 -> r._2.getTime).toMap
      rows.groupBy(_._1).foreach { case (k, grp) =>
        assert(kept(k) == grp.map(_._2.getTime).max)
      }
    }
  }

  test("snapshotDiff/applyDiff reconstruct any target snapshot") {
    val snapGen = Gen.listOfN(12, for {
      k <- Gen.oneOf("a", "b", "c", "d", "e/f")
      h <- Gen.oneOf("h1", "h2")
    } yield (k, h, 1L)).map(_.distinct)
    val cases = samples(Gen.zip(snapGen, snapGen), 5)
    cases.foreach { case (prevRows, nextRows) =>
      val prev = prevRows.toDF("key", "content_hash", "size")
      val next = nextRows.toDF("key", "content_hash", "size")
      val rebuilt = Diff.applyDiff(prev, Diff.snapshotDiff(prev, next))
      assert(rebuilt.exceptAll(next).isEmpty && next.exceptAll(rebuilt).isEmpty,
        s"prev=$prevRows next=$nextRows")
    }
  }

  test("CharWindowDupStats kernel ≡ the relational substring scorer on random docs") {
    // the streaming kernel (substringSQL + xxhash64 over UTF-8 bytes,
    // binary-searched baked set) must agree with the batch operator's
    // SQL-function formulation — including multi-byte unicode, where a
    // CHAR-indexed substr over BYTE-hashed windows is exactly the
    // convention drift this property exists to catch
    val wordGen = Gen.oneOf("alpha", "beta", "γάμμα", "ñandú", "x1", "zz")
    val docGen: Gen[String] = for {
      n <- Gen.choose(0, 14)
      ws <- Gen.listOfN(n, wordGen)
      planted <- Gen.oneOf(true, false)
    } yield {
      val base = ws.mkString(" ")
      if (planted) s"shared reference passage copied verbatim $base" else base
    }
    val (w, stride) = (12, 5)
    samples(Gen.listOfN(6, docGen), 5).foreach { texts =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      val batchDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = graft.llm.Dedup.substringDupStatsAgainst(
          batchDf, corpus, "doc_id", "text", w = w, stride = stride)
        .select("doc_id", "n_windows", "n_dup_windows")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val hashes = graft.llm.Dedup.substringWindowHashes(
        corpus, "doc_id", "text", w = w, stride = stride)
      val kernel = batchDf.select(col("doc_id"),
          graft.expressions.GraftExpressions
            .charWindowDupStats(col("text"), w, stride, hashes).as("s"))
        .select(col("doc_id"), col("s.n_windows"), col("s.n_dup_windows"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // batch drops windowless docs; the kernel reports (0, 0) for them
      kernel.foreach { case (id, (nw, nd)) =>
        if (nw == 0L) assert(!batch.contains(id), s"doc $id: $nw/$nd")
        else assert(batch(id) == ((nw, nd)), s"doc $id")
      }
      assert(batch.keySet == kernel.filter(_._2._1 > 0L).keySet)
    }
  }

  test("stripBoilerplate kernel ≡ relational on random multi-whitespace corpora") {
    // random corpora with planted shared spans, ragged whitespace, empty
    // and unicode docs — the kernel rewrite must equal the relational
    // explode→join→reassemble twin row-for-row
    val wordGen = Gen.oneOf("alpha", "beta", "γάμμα", "d-1", "e", "ff")
    val docGen: Gen[String] = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, wordGen)
      sep <- Gen.oneOf(" ", "  ", "\t", " \n ")
      planted <- Gen.oneOf(true, false)
    } yield {
      val base = ws.mkString(sep)
      if (planted) s"$base shared span one two$sep$base" else base
    }
    val corpora = samples(Gen.listOfN(8, docGen), 6)
    corpora.foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kernel = graft.llm.Dedup.stripBoilerplate(df, "doc_id", "text",
          w = 4, minDocs = 2, relational = Some(false))
        .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
      val relational = graft.llm.Dedup.stripBoilerplate(df, "doc_id", "text",
          w = 4, minDocs = 2, relational = Some(true))
        .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
      assert(kernel == relational, s"diverged on corpus: $texts")
    }
  }

  // ---- plain-Scala reference implementations of the text gates: same
  // rule definitions, zero Spark machinery — divergence means a plan or
  // codegen bug in the column formulation, which is what these properties
  // exist to catch. Spark's trim/ltrim/rtrim strip SPACES only (not \t\n),
  // so the references replicate that precisely.
  private def spTrim(s: String, left: Boolean = true, right: Boolean = true): String = {
    var a = 0; var b = s.length
    if (left) while (a < b && s(a) == ' ') a += 1
    if (right) while (b > a && s(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }
  // Spark's split() calls Pattern.split(str, -1), KEEPING trailing empty
  // strings — java.lang.String#split(regex) (limit 0) drops them, so a
  // doc ending in whitespace would token-count differently
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")
  private def refTokens(s: String): Seq[String] = {
    val t = spTrim(s)
    if (t.isEmpty) Seq.empty else wsPattern.split(t, -1).toSeq
  }
  private def refGopher(text: String): Seq[Boolean] = {
    val toks = refTokens(text)
    val nw = toks.length
    val lines = text.split("\n", -1).toSeq
    val nl = lines.length.toDouble
    val wordcountOk = nw >= 50 && nw <= 100000
    val mwl = if (nw == 0) 0.0 else toks.map(_.length).sum.toDouble / nw
    val meanLenOk = nw > 0 && mwl >= 3.0 && mwl <= 10.0
    val symbols = text.count(_ == '#') +
      (text.length - text.replace("...", "").length) / 3 +
      text.count(_ == '…')
    val symbolOk = nw > 0 && symbols.toDouble / nw <= 0.1
    val bulletOk =
      lines.count(l => spTrim(l, right = false)
        .headOption.exists("•*-".contains(_))) / nl < 0.9
    val ellipsisOk = lines.count { l =>
      val r = spTrim(l, left = false)
      r.endsWith("...") || r.endsWith("…")
    } / nl <= 0.3
    val alphaOk = nw > 0 &&
      toks.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toDouble / nw >= 0.8
    val stopOk = graft.llm.TextAnalysis.gopherRequiredStops
      .count(sw => toks.exists(_.toLowerCase == sw)) >= 2
    val all = Seq(wordcountOk, meanLenOk, symbolOk, bulletOk, ellipsisOk,
      alphaOk, stopOk)
    all :+ all.forall(identity)
  }
  private def refC4(text: String): (Int, Boolean, String) = {
    val kept = text.split("\n", -1).toSeq.filter { l =>
      val r = spTrim(l, left = false)
      r.nonEmpty && ".!?\"".contains(r.last) && refTokens(l).length >= 5
    }
    (kept.length,
      kept.length >= 3 && !text.contains("{") &&
        !text.toLowerCase.contains("lorem ipsum"),
      kept.mkString("\n"))
  }

  test("gopherFlags and c4Clean match plain-Scala reference implementations") {
    val lineGen: Gen[String] = Gen.oneOf(
      Gen.listOfN(6, Gen.oneOf("the", "word", "of", "##", "be", "longer",
        "x", "and")).map(_.mkString(" ") + "."),
      Gen.listOfN(3, Gen.alphaLowerStr.map(_.take(5))).map(_.mkString(" ")),
      Gen.const("- bullet item"),
      Gen.const("trailing ellipsis line ..."),
      Gen.const("unicode ellipsis …"),
      Gen.const(""),
      Gen.const("   "),
      Gen.const("if (x) { y }"),
      Gen.const("lorem ipsum dolor sit amet."),
      Gen.listOfN(60, Gen.oneOf("the", "of", "and", "that", "have",
        "with", "words", "plenty")).map(_.mkString(" ") + " end."))
    val docGen: Gen[String] = for {
      n <- Gen.choose(1, 8)
      ls <- Gen.listOfN(n, lineGen)
    } yield ls.mkString("\n")
    val corpora = samples(Gen.listOfN(10, docGen), 5)
    corpora.foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val g = df.select(col("doc_id"),
          graft.llm.TextAnalysis.gopherFlags(col("text")).as("g"))
        .select("doc_id", "g.*").collect()
        .map(r => r.getLong(0) -> (1 to 8).map(r.getBoolean)).toMap
      val c = graft.llm.TextAnalysis.c4Clean(df, "text")
        .select("doc_id", "n_lines_kept", "keep", "clean_text")
        .as[(Long, Int, Boolean, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(g(i.toLong) == refGopher(t), s"gopher diverged on: ${t.take(120)}")
        assert(c(i.toLong) == refC4(t), s"c4 diverged on: ${t.take(120)}")
      }
    }
  }

  test("BPE pieces always concatenate back to the token stream, count monotone") {
    val textGen: Gen[String] = for {
      n <- Gen.choose(0, 10)
      ws <- Gen.listOfN(n, Gen.oneOf("low", "lower", "lowest", "newest",
        "wide", "😀x", "a"))
    } yield ws.mkString(" ")
    val corpora = samples(Gen.listOfN(10, textGen), 5)
    corpora.foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val m = graft.llm.Bpe.train(df, "text", numMerges = 30)
      val rows = graft.llm.Bpe.encode(df, "text", m)
        .select($"text", org.apache.spark.sql.functions
          .array_join($"pieces", "").as("glued"),
          org.apache.spark.sql.functions.size($"pieces").as("np"))
        .as[(String, String, Int)].collect()
      rows.foreach { case (text, glued, np) =>
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        assert(glued == toks.map(_ + "</w>").mkString(""),
          s"round-trip broke on '$text'")
        // fully-merged floor: ≥1 piece per word; ceiling: chars + markers
        assert(np >= toks.length)
        assert(np <= toks.map(w => w.codePointCount(0, w.length) + 1).sum)
      }
    }
  }

  test("PairGenerator emits exactly n*(n-1)/2 ordered pairs for any bucket") {
    val bucketGen = Gen.listOfN(6, Gen.zip(Gen.choose(0L, 100L), Gen.choose(1L, 50L)))
      .map(_.distinctBy(_._1))
    samples(bucketGen, 8).filter(_.size >= 2).foreach { docs =>
      val df = Seq(Tuple1(docs)).toDF("docs")
        .select($"docs".cast("array<struct<id:bigint,sh_size:bigint>>").as("docs"))
      val pairs = df.select(
        graft.expressions.GraftExpressions.pairGenerator($"docs"))
        .toDF("i", "j", "si", "sj")
        .as[(Long, Long, Long, Long)].collect()
      val n = docs.size
      assert(pairs.length == n * (n - 1) / 2, s"docs=$docs")
      assert(pairs.forall { case (i, j, _, _) => i < j })
      assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
      val sizes = docs.toMap
      pairs.foreach { case (i, j, si, sj) =>
        assert(sizes(i) == si && sizes(j) == sj)
      }
    }
  }
}
