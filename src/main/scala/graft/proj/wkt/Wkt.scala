package graft.proj.wkt

import graft.core.{ProjErr, ProjError}

/** WKT2 syntax tree: `KEYWORD[arg, ...]` with `[]`/`()` brackets, quoted
  * strings (doubled-quote escapes), numbers, bare enum words, and nested
  * nodes (grammar per the published ISO 19162 / OGC 18-010 text; reference
  * io.cpp WKTParser is the behavioral model, the implementation shares
  * nothing with it).
  */
final case class WktNode(keyword: String, args: Vector[Any]) {
  /** nested child nodes with the given keyword (case-insensitive). */
  def children(kw: String*): Vector[WktNode] = args.collect {
    case n: WktNode if kw.exists(_.equalsIgnoreCase(n.keyword)) => n
  }
  def child(kw: String*): Option[WktNode] = children(kw: _*).headOption
  def strings: Vector[String] = args.collect { case s: String => s }
  def numbers: Vector[Double] = args.collect { case d: Double => d }
  /** first quoted-string argument (usually the object name). */
  def name: Option[String] = strings.headOption
}

object Wkt {

  def looksLikeWkt(s: String): Boolean = {
    val t = s.dropWhile(_.isWhitespace)
    var i = 0
    while (i < t.length && (t.charAt(i).isLetterOrDigit || t.charAt(i) == '_')) i += 1
    i >= 2 && i < t.length && {
      var j = i
      while (j < t.length && t.charAt(j).isWhitespace) j += 1
      j < t.length && (t.charAt(j) == '[' || t.charAt(j) == '(') &&
        t.substring(0, i).forall(c => c.isUpper || c.isDigit || c == '_')
    }
  }

  def parse(text: String): WktNode = {
    val p = new Parser(text)
    val n = p.node()
    p.ws()
    if (!p.eof)
      throw ProjError(ProjErr.INVALID_OP_WRONG_SYNTAX, "wkt: trailing content")
    n
  }

  private final class Parser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
    private def fail(msg: String): Nothing =
      throw ProjError(ProjErr.INVALID_OP_WRONG_SYNTAX, s"wkt: $msg at offset $i")

    private def ident(): String = {
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      if (i == start) fail("expected keyword")
      s.substring(start, i)
    }

    private def quoted(): String = {
      // double-quote delimited, "" escapes a quote
      i += 1
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (i >= s.length) fail("unterminated string")
        val c = s.charAt(i)
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { sb += '"'; i += 2 }
          else { i += 1; done = true }
        } else { sb += c; i += 1 }
      }
      sb.toString
    }

    private def number(): Double = {
      val start = i
      if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      try java.lang.Double.parseDouble(s.substring(start, i))
      catch { case _: NumberFormatException => fail("bad number") }
    }

    def node(): WktNode = {
      ws()
      val kw = ident()
      ws()
      if (eof || (s.charAt(i) != '[' && s.charAt(i) != '('))
        fail(s"expected '[' after $kw")
      val close = if (s.charAt(i) == '[') ']' else ')'
      i += 1
      val args = Vector.newBuilder[Any]
      ws()
      if (!eof && s.charAt(i) == close) { i += 1; return WktNode(kw.toUpperCase, args.result()) }
      var done = false
      while (!done) {
        ws()
        if (eof) fail("unterminated node")
        val c = s.charAt(i)
        if (c == '"') args += quoted()
        else if (c == '-' || c == '+' || c.isDigit || c == '.') args += number()
        else {
          // keyword: either a nested node or a bare enum word
          val save = i
          val kw2 = ident()
          ws()
          if (!eof && (s.charAt(i) == '[' || s.charAt(i) == '(')) {
            i = save
            args += node()
          } else args += WktNode(kw2.toUpperCase, Vector.empty) // bare enum
        }
        ws()
        if (!eof && s.charAt(i) == ',') i += 1
        else if (!eof && s.charAt(i) == close) { i += 1; done = true }
        else fail("expected ',' or close bracket")
      }
      WktNode(kw.toUpperCase, args.result())
    }
  }
}
