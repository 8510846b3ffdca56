package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipelines.Memorious

/** Memorious crawler-import suite (S6/J4/P8/F8) over a generated fixture in
  * the reference's layout: `{sha1}.json` metadata + sibling `{sha1}.data.*`
  * blob (tests/test_sync.py semantics re-created, not copied). */
class MemoriousSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-memorious").toString
    def put(name: String, content: String): Unit =
      Files.writeString(Paths.get(s"$d/$name"), content)
    put("aaa.json",
      """{"url": "https://example.org/docs/report.pdf", "content_hash": "aaa",
        | "_file_name": "aaa.data.pdf", "title": "Annual Report"}""".stripMargin)
    put("aaa.data.pdf", "pdf-bytes")
    put("bbb.json",
      """{"url": "https://example.org/data/table.csv", "content_hash": "bbb",
        | "_file_name": "bbb.data.csv"}""".stripMargin)
    put("bbb.data.csv", "a,b\n1,2\n")
    // invalid: no content_hash → must be skipped (P8)
    put("ccc.json", """{"url": "https://example.org/x", "_file_name": "ccc.data.bin"}""")
    put("ccc.data.bin", "junk")
    d
  }

  test("scan pairs metadata with blobs and drops invalid records") {
    val got = Memorious.scan(spark, dir)
    assert(got.count() == 2)
    assert(got.filter($"content_hash" === "ccc").isEmpty)
    val sizes = got.select("content_hash", "size").as[(String, Long)]
      .collect().toMap
    assert(sizes("aaa") == "pdf-bytes".length.toLong)
  }

  test("key strategies: url-path, name-only, strip-prefix (F8 builtins)") {
    val scanned = Memorious.scan(spark, dir).filter($"content_hash" === "aaa")
    def keyOf(s: Memorious.KeyStrategy): String =
      Memorious.deriveKey(scanned, s).select("key").as[String].head()
    assert(keyOf(Memorious.UrlPath) == "example.org/docs/report.pdf")
    assert(keyOf(Memorious.NameOnly) == "report.pdf")
    assert(keyOf(Memorious.StripPrefix("example.org/")) == "docs/report.pdf")
  }

  test("key strategy: template rendering over record fields") {
    val scanned = Memorious.scan(spark, dir).filter($"content_hash" === "aaa")
    val key = Memorious.deriveKey(scanned,
        Memorious.Template("{{ title }}/{{ content_hash }}.pdf",
          Seq("title", "content_hash")))
      .select("key").as[String].head()
    assert(key == "Annual Report/aaa.pdf")
  }

  test("importRecords produces documents-shaped rows") {
    val out = Memorious.importRecords(spark, dir, Memorious.NameOnly)
    assert(out.columns.toSeq == Seq("key", "content_hash", "size", "mimetype",
      "created_at", "updated_at"))
    val m = out.select("key", "mimetype").as[(String, String)].collect().toMap
    assert(m("report.pdf") == "application/pdf")
    assert(m("table.csv") == "text/csv")
  }
}
