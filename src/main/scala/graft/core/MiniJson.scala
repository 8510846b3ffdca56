package graft.core

/** Minimal recursive-descent JSON reader (plus string escaping for
  * writers). The repo builds its JSON output by hand (index/catalog
  * sinks, API service); the Aleph HTTP connector also needs to READ
  * small control-plane responses (collection lookups, ingest results).
  * Zero-dependency by design — the build resolves offline.
  *
  * Values map to: `Map[String, Any]`, `List[Any]`, `String`, `Double`,
  * `Boolean`, `null`. Numbers are always Double (callers needing ids
  * should accept both string and numeric forms — Aleph serializes ids as
  * strings, but this keeps the reader general).
  */
object MiniJson {

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""

  /** Serialize a flat-ish structure (Map/Seq/String/Number/Boolean/null). */
  def write(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => write(x)
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => quote(k.toString) + ":" + write(x) }
        .mkString("{", ",", "}")
    case xs: collection.Seq[_] => xs.map(write).mkString("[", ",", "]")
    case s: String => quote(s)
    case b: Boolean => b.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Double => n.toString
    case other => quote(other.toString)
  }

  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing JSON content at ${p.pos}")
    v
  }

  /** Fetch a field from a parsed object, else None. */
  def field(v: Any, name: String): Option[Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].get(name)
    case _ => None
  }

  /** String form of an id-ish field (Aleph ids arrive as strings; a
    * numeric id is rendered without a trailing `.0`). */
  def idString(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case d: Double if d.isWhole => Some(d.toLong.toString)
    case d: Double => Some(d.toString)
    case _ => None
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c,
        s"expected '$c' at $pos in ${s.take(80)}")
      pos += 1
    }

    def value(): Any = {
      skipWs()
      require(!eof, "unexpected end of JSON")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }

    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length),
        s"bad literal at $pos")
      pos += word.length
      v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      val b = Map.newBuilder[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs(); expect(':')
        b += k -> value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      b.result()
    }

    private def arr(): List[Any] = {
      expect('['); skipWs()
      val b = List.newBuilder[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb.append(c)
        pos += 1
      }
      pos += 1
      sb.toString
    }

    private def num(): Double = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      s.substring(start, pos).toDouble
    }
  }
}
