package graft

import org.apache.spark.sql.functions._

import graft.llm.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala Levenshtein — the independent reference the engine's
    * banded/blocked formulation is checked against. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brutePairs(names: Seq[(Long, String)], maxDist: Int) =
    (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib && lev(na, nb) <= maxDist
    } yield (ia, ib, lev(na, nb).toLong)).toSet

  // deterministic mutated dictionary: base words plus edits at known spots
  private val base = Seq("alexandra petrova", "alexander petrov",
    "acme holdings ltd", "acme holding ltd", "acme holdings", "meridian llc",
    "meridian lcc", "meridian", "jose garcia", "josé garcia", "jose garcya",
    "offshore services sa", "offshore service sa", "ofshore services sa",
    "x", "", "zz", "z")
  private val dict: Seq[(Long, String)] =
    base.zipWithIndex.map { case (n, i) => (i.toLong, n) }

  test("deletionVariants enumerates the exact FastSS neighborhood") {
    val v1 = Seq("abc").toDF("nm")
      .select(Linkage.deletionVariants(col("nm"), 1)).as[Seq[String]].head()
    assert(v1.toSet == Set("abc", "bc", "ac", "ab"))
    val v2 = Seq("abc").toDF("nm")
      .select(Linkage.deletionVariants(col("nm"), 2)).as[Seq[String]].head()
    assert(v2.toSet == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    val empty = Seq("").toDF("nm")
      .select(Linkage.deletionVariants(col("nm"), 1)).as[Seq[String]].head()
    assert(empty == Seq(""))
  }

  test("fuzzyPairs is complete vs brute force at maxDist=1 and 2") {
    val df = dict.toDF("id", "nm")
    for (d <- Seq(1, 2)) {
      val got = Linkage.fuzzyPairs(df, "id", "nm", maxDist = d)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == brutePairs(dict, d), s"maxDist=$d")
    }
  }

  test("fuzzyPairs normalizes case and whitespace before matching") {
    val df = Seq((1L, "  Acme   Holdings Ltd"), (2L, "acme holdings ltd"))
      .toDF("id", "nm")
    val got = Linkage.fuzzyPairs(df, "id", "nm").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 2L, 0L)))
    // and the raw form sees them as distance > 1 (no pair)
    assert(Linkage.fuzzyPairs(df, "id", "nm", normalize = false).isEmpty)
  }

  test("fuzzyPairs bucket ceiling fails loudly on exact-duplicate floods") {
    val df = (0L until 40L).map(i => (i, "same name")).toDF("id", "nm")
    val e = intercept[Exception] {
      Linkage.fuzzyPairs(df, "id", "nm", bucketCeiling = 10).count()
    }
    assert(e.getMessage.contains("fuzzy-match bucket overflow") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("fuzzy-match bucket overflow"),
      s"unexpected: ${e.getMessage}")
  }

  test("fuzzyMatchAgainst matches brute force across the split") {
    val newSide = dict.filter(_._1 % 3 == 0)
    val refSide = dict.filter(_._1 % 3 != 0)
    val got = Linkage.fuzzyMatchAgainst(
        newSide.toDF("id", "nm"), refSide.toDF("id", "nm"), "id", "nm")
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ia, na) <- newSide; (ib, nb) <- refSide
      if lev(na, nb) <= 1
    } yield (ia, ib, lev(na, nb).toLong)).toSet
    assert(got == want)
  }

  test("fuzzyPairs on the customer table finds one-digit-apart names only") {
    val cust = Tables.load(spark, sf0, "customer")
    val pairs = Linkage.fuzzyPairs(cust, "c_custkey", "c_name").cache()
    val n = pairs.count()
    assert(n > 0, "expected one-digit-apart Customer#... pairs")
    // every returned pair really is within distance 1 (re-verified in
    // plain Scala), and ordering/canonicalization hold
    val rows = pairs.limit(5000).as[(Long, Long, Long)].collect()
    val names = cust.select(col("c_custkey"),
        Linkage.normalizeName(col("c_name")))
      .as[(Long, String)].collect().toMap
    rows.foreach { case (a, b, d) =>
      assert(a < b)
      assert(lev(names(a), names(b)).toLong == d && d <= 1)
    }
    pairs.unpersist()
  }
}
