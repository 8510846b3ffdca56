package graft

import org.apache.spark.sql.functions._

/** DataSource V2 zip reader (S7): zipped datasets read as DataFrames with
  * per-zip-file parallelism. */
class ZipSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeZip(path: String, entries: (String, String)*): Unit = {
    val z = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    entries.foreach { case (n, c) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    z.close()
  }

  test("reads zip members as rows with key/size/content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipsrc").toString
    writeZip(s"$dir/a.zip", "ds/x.txt" -> "xx", "ds/sub/y.txt" -> "yyy")
    val df = spark.read.format("graft-zip").load(s"$dir/a.zip")
    assert(df.schema.fieldNames.toSeq == Seq("key", "size", "content"))
    val rows = df.select("key", "size").as[(String, Long)].collect().toMap
    assert(rows == Map("ds/x.txt" -> 2L, "ds/sub/y.txt" -> 3L))
    val content = df.filter($"key" === "ds/x.txt")
      .select("content").as[Array[Byte]].head()
    assert(new String(content, "UTF-8") == "xx")
  }

  test("a directory of zips reads with one partition per archive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipsrc2").toString
    writeZip(s"$dir/a.zip", "one.txt" -> "1")
    writeZip(s"$dir/b.zip", "two.txt" -> "22", "three.txt" -> "333")
    val df = spark.read.format("graft-zip").load(dir)
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("round-trip: dataset zip export reads back through the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipsrc3").toString
    writeZip(s"$dir/export.zip",
      "test_dataset/utf.txt" -> "Îș unî©ođ€.\n",
      "test_dataset/testdir/test.txt" -> "hello world")
    val df = spark.read.format("graft-zip").load(s"$dir/export.zip")
      .withColumn("content_hash", sha1($"content"))
    val hashes = df.select("key", "content_hash").as[(String, String)]
      .collect().toMap
    assert(hashes("test_dataset/utf.txt")
      == "5a6acf229ba576d9a40b09292595658bbb74ef56")
    assert(hashes("test_dataset/testdir/test.txt")
      == "2aae6c35c94fcfb415dbe95f408b9ce91ee846ed")
  }

  test("paths option parses as real JSON: commas and quotes in paths survive") {
    import graft.sources.SourceOptions.parseJsonStringArray
    assert(parseJsonStringArray("""["/a/b.zip","/c/d.zip"]""")
      == Seq("/a/b.zip", "/c/d.zip"))
    assert(parseJsonStringArray("""[ "/with, comma/x.zip" , "/q\"uote.zip" ]""")
      == Seq("/with, comma/x.zip", "/q\"uote.zip"))
    assert(parseJsonStringArray("""["/unié.zip"]""") == Seq("/unié.zip"))
    assert(parseJsonStringArray("[]").isEmpty)
    intercept[IllegalArgumentException](parseJsonStringArray("not an array"))
    intercept[IllegalArgumentException](parseJsonStringArray("""["unclosed"""))
    // \uXXXX escapes: valid ones decode; truncated-at-bracket and non-hex
    // ones surface the parser's own error, not NumberFormatException
    assert(parseJsonStringArray("[\"\\u0041.zip\"]") == Seq("A.zip"))
    val truncated = intercept[IllegalArgumentException](
      parseJsonStringArray("[\"\\u00\"]"))
    assert(truncated.getMessage.contains("4 hex digits"))
    val nonHex = intercept[IllegalArgumentException](
      parseJsonStringArray("[\"\\u00zz.zip\"]"))
    assert(nonHex.getMessage.contains("4 hex digits"))
    // end-to-end: a multi-path load where one directory name contains a
    // comma — the old bracket-strip/comma-split mis-parsed exactly this
    val dir = java.nio.file.Files.createTempDirectory("graft-zipsrc4").toString
    val commaDir = java.nio.file.Files
      .createDirectory(java.nio.file.Paths.get(s"$dir/with, comma")).toString
    writeZip(s"$commaDir/a.zip", "one.txt" -> "1")
    writeZip(s"$dir/b.zip", "two.txt" -> "22")
    val df = spark.read.format("graft-zip")
      .load(s"$commaDir/a.zip", s"$dir/b.zip")
    assert(df.select("key").as[String].collect().toSet
      == Set("one.txt", "two.txt"))
  }

  test("a mismatched user schema is rejected, not silently replaced") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipsrc5").toString
    writeZip(s"$dir/a.zip", "one.txt" -> "1")
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-zip")
        .schema("key STRING, wrong INT").load(s"$dir/a.zip")
    }
    assert(e.getMessage.contains("does not match the source schema"))
    // the exact source schema (or a nullability-relaxed one) is accepted
    val ok = spark.read.format("graft-zip")
      .schema("key STRING, size BIGINT, content BINARY").load(s"$dir/a.zip")
    assert(ok.count() == 1L)
  }
}
