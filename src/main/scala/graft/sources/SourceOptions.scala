package graft.sources

import org.apache.spark.sql.types.StructType

/** Shared option plumbing for the DataSource V2 sources
  * ([[ZipDataSource]], [[TarDataSource]]). */
object SourceOptions {

  /** Parse the `paths` option Spark passes for multi-path `load(...)`
    * calls: a JSON string array. The previous bracket-strip +
    * comma-split mis-parsed any path containing a comma or an escaped
    * quote, so this is a real (minimal) JSON reader for the
    * `["...", ...]` shape — strings with full escape handling, which is
    * everything the option can contain. */
  def parseJsonStringArray(s: String): Seq[String] = {
    val t = s.trim
    require(t.length >= 2 && t.startsWith("[") && t.endsWith("]"),
      s"paths option is not a JSON array: $s")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 1
    val end = t.length - 1
    def skipWs(): Unit = while (i < end && t(i).isWhitespace) i += 1
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(
        s"paths option: expected $what at offset $i in: $s")
    skipWs()
    while (i < end) {
      if (t(i) != '"') fail("'\"'")
      i += 1
      val sb = new StringBuilder
      while (i < end && t(i) != '"') {
        if (t(i) == '\\') {
          i += 1
          if (i >= end) fail("escape sequence")
          t(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case 'n'  => sb += '\n'
            case 'r'  => sb += '\r'
            case 't'  => sb += '\t'
            case 'u' =>
              // all four digits must precede the closing ']' (index `end`)
              if (i + 4 >= end) fail("4 hex digits")
              val hex = t.substring(i + 1, i + 5)
              if (!hex.forall(c => c.isDigit ||
                  ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')))
                fail("4 hex digits")
              sb += Integer.parseInt(hex, 16).toChar
              i += 4
            case c => fail(s"valid escape (got \\$c)")
          }
        } else sb += t(i)
        i += 1
      }
      if (i >= end) fail("closing '\"'")
      i += 1
      out += sb.toString
      skipWs()
      if (i < end) {
        if (t(i) != ',') fail("','")
        i += 1
        skipWs()
        if (i >= end) fail("string after ','")
      }
    }
    out.toSeq
  }

  /** These sources advertise `supportsExternalMetadata()` (so
    * `.schema(...)` reaches `getTable`), but each has ONE fixed schema —
    * a user schema that differs must be rejected loudly, not silently
    * replaced by the source's own. Nullability differences are
    * tolerated (`sameType`): a looser-nullable user declaration reads
    * fine. */
  def requireSchema(expected: StructType, given: StructType,
                    source: String): Unit = {
    // simpleString renders names + types and drops nullability — exactly
    // the ignore-nullability comparison wanted here (DataType.sameType is
    // private[sql])
    require(given == null || given.simpleString == expected.simpleString,
      s"$source: user-specified schema ${Option(given).map(_.simpleString)} " +
        s"does not match the source schema ${expected.simpleString}; " +
        "omit .schema(...) or pass the source schema verbatim")
  }
}
