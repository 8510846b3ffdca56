package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("shardedChecksumKey shards the first three byte-pairs") {
    // spec: docs/rfc.md:38-46 — ab/cd/ef/abcdef…
    val ch = "2aae6c35c94fcfb415dbe95f408b9ce91ee846ed"
    val got = Seq(ch).toDF("ch")
      .select(GraftFunctions.shardedChecksumKey(col("ch"))).as[String].head()
    assert(got == s"2a/ae/6c/$ch")
  }

  test("checksum sha1 matches the published content vectors") {
    // oracle vectors: tests/test_archive.py:22, tests/test_api.py:10
    val got = Seq("hello world").toDF("c")
      .select(GraftFunctions.checksum(col("c"))).as[String].head()
    assert(got == "2aae6c35c94fcfb415dbe95f408b9ce91ee846ed")
  }

  test("checksum algorithms are pluggable") {
    val df = Seq("x").toDF("c")
    assert(df.select(GraftFunctions.checksum(col("c"), "md5")).as[String].head()
      == "9dd4e461268c8034f5c8564e155c67a6")
    assert(df.select(GraftFunctions.checksum(col("c"), "sha256")).as[String].head()
      .length == 64)
    intercept[IllegalArgumentException](GraftFunctions.checksum(col("c"), "nope"))
  }

  test("mimeToSchema maps the reference MIME_SCHEMAS table") {
    // ftm_datalake/util.py:19-38
    val cases = Seq(
      "application/pdf" -> "Pages", "text/html" -> "HyperText",
      "text/csv" -> "Table", "image/png" -> "Image",
      "message/rfc822" -> "Email", "text/plain" -> "PlainText",
      "application/zip" -> "Document", "" -> "Document")
    val got = cases.map(_._1).toDF("m")
      .select(col("m"), GraftFunctions.mimeToSchema(col("m")))
      .as[(String, String)].collect().toMap
    cases.foreach { case (m, s) => assert(got(m) == s, s"mime $m") }
  }

  test("basename + pathAncestors") {
    val df = Seq("a/b/c/file.txt", "root.txt").toDF("k")
    val got = df.select(GraftFunctions.basename(col("k"))).as[String].collect()
    assert(got.sameElements(Array("file.txt", "root.txt")))
    val anc = df.select(GraftFunctions.pathAncestors(col("k")))
      .as[Seq[String]].collect()
    assert(anc(0) == Seq("a", "a/b", "a/b/c"))
    assert(anc(1) == Seq.empty)
  }

  test("globMatch compiles to pushdown-friendly predicates with fnmatch semantics") {
    import graft.functions.GraftFunctions.globMatch
    val df = Seq("src1/a.pdf", "src12/b.txt", "other/c.pdf", "exact").toDF("k")
    def matches(glob: String): Set[String] =
      df.filter(globMatch(col("k"), glob)).as[String].collect().toSet
    assert(matches("src1*") == Set("src1/a.pdf", "src12/b.txt"))
    assert(matches("*.pdf") == Set("src1/a.pdf", "other/c.pdf"))
    assert(matches("*pdf*") == Set("src1/a.pdf", "other/c.pdf"))
    assert(matches("exact") == Set("exact"))
    assert(matches("src?2*") == Set("src12/b.txt")) // structured → regex path
    // prefix form must surface as a pushable StartsWith, not RLike
    val plan = df.filter(globMatch(col("k"), "src1*"))
      .queryExecution.analyzed.toString
    assert(plan.toLowerCase.contains("startswith"), s"got $plan")
    assert(!plan.toLowerCase.contains("rlike"))
  }

  test("character classes: [seq], [!seq], unterminated [ is literal (fnmatch)") {
    import graft.functions.GraftFunctions.globToRegex
    assert("abc".matches(globToRegex("[ab]*")))
    assert(!"xbc".matches(globToRegex("[ab]*")))
    assert("xbc".matches(globToRegex("[!ab]*")))
    assert(!"abc".matches(globToRegex("[!ab]*")))
    assert("a-c".matches(globToRegex("[a-b]-c"))) // range kept
    assert("[ab".matches(globToRegex("[ab")))     // unterminated → literal
  }

  test("globToRegex implements fnmatch semantics") {
    val cases = Seq(
      ("*.pdf", "doc.pdf", true), ("*.pdf", "doc.pdfx", false),
      ("*.pdf", "a/b.pdf", true), // fnmatch: * crosses separators
      ("data?.csv", "data1.csv", true), ("data?.csv", "data12.csv", false),
      ("a[b", "a[b", true)) // bracket treated literally (escaped)
    cases.foreach { case (glob, s, want) =>
      assert(s.matches(GraftFunctions.globToRegex(glob)) == want, s"$glob vs $s")
    }
  }

  test("fileEntityId is deterministic and dataset-prefixed") {
    // id derivation per ftm_datalake/model.py:49-52; canonical JSON-array
    // serialization (upstream anystore serialization is not reproducible
    // offline — divergence documented in GraftFunctions.fileEntityId)
    val df = Seq(("utf.txt", "5a6acf229ba576d9a40b09292595658bbb74ef56")).toDF("k", "h")
    val id = df.select(GraftFunctions.fileEntityId(lit("default"), col("k"), col("h")))
      .as[String].head()
    assert(id.startsWith("default-file-"))
    assert(id.length == "default-file-".length + 40)
    val id2 = df.select(GraftFunctions.fileEntityId(lit("default"), col("k"), col("h")))
      .as[String].head()
    assert(id == id2)
  }

  test("template key rendering (memorious F8)") {
    // ftm_datalake/sync/memorious.py:95-122 semantics
    assert(GraftFunctions.renderTemplate("{{ a }}/x/{{b}}.pdf",
      Map("a" -> "foo", "b" -> "bar")) == "foo/x/bar.pdf")
    assert(GraftFunctions.renderTemplate("{{ missing }}.txt", Map()) == ".txt")
  }

  test("memorious url key functions") {
    val df = Seq("https://example.org/docs/annual%20report.pdf?v=2#frag").toDF("url")
    import GraftFunctions.KeyFunc
    assert(df.select(KeyFunc.urlPath(col("url"))).as[String].head()
      == "example.org/docs/annual%20report.pdf")
    assert(df.select(KeyFunc.nameOnly(col("url"))).as[String].head()
      == "annual%20report.pdf")
    assert(df.select(KeyFunc.stripPrefix(col("url"), "example.org/docs/")).as[String].head()
      == "annual%20report.pdf")
  }
}
