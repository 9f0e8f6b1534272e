package graft.schema

/** Minimal JSON AST + recursive-descent parser + writer. Self-contained
  * (no external deps — the offline sbt cache only carries scalatest).
  * Covers the full table-definition contract (reference
  * `lambda/schema.json:1-162`) and our lake metadata files.
  */
sealed trait JValue {
  def asObj: Map[String, JValue] = this match {
    case JObject(m) => m
    case v => throw new JsonException(s"expected object, got $v")
  }
  def asArr: Seq[JValue] = this match {
    case JArray(a) => a
    case v => throw new JsonException(s"expected array, got $v")
  }
  def asStr: String = this match {
    case JString(s) => s
    case v => throw new JsonException(s"expected string, got $v")
  }
  def asBool: Boolean = this match {
    case JBool(b) => b
    case v => throw new JsonException(s"expected boolean, got $v")
  }
  def asLong: Long = this match {
    case JNumber(n) if n.isValidLong => n.toLong
    case v => throw new JsonException(s"expected integer, got $v")
  }
  def asInt: Int = asLong.toInt
}
case class JObject(fields: Map[String, JValue]) extends JValue
case class JArray(items: Seq[JValue]) extends JValue
case class JString(value: String) extends JValue
case class JNumber(value: BigDecimal) extends JValue
case class JBool(value: Boolean) extends JValue
case object JNull extends JValue

class JsonException(msg: String) extends RuntimeException(msg)

object Json {
  def parse(input: String): JValue = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new JsonException(s"trailing content at ${p.pos}")
    v
  }

  def write(v: JValue): String = v match {
    case JObject(m) =>
      m.map { case (k, x) => s"${quote(k)}: ${write(x)}" }
        .mkString("{", ", ", "}")
    case JArray(a) => a.map(write).mkString("[", ", ", "]")
    case JString(s) => quote(s)
    case JNumber(n) => n.bigDecimal.toPlainString
    case JBool(b) => b.toString
    case JNull => "null"
  }

  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!atEnd && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def fail(msg: String) =
      throw new JsonException(s"$msg at offset $pos")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def parseValue(): JValue = {
      skipWs()
      if (atEnd) fail("unexpected end of input")
      s.charAt(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JString(parseString())
        case 't' => literal("true", JBool(true))
        case 'f' => literal("false", JBool(false))
        case 'n' => literal("null", JNull)
        case _ => parseNumber()
      }
    }

    private def literal(text: String, v: JValue): JValue = {
      if (!s.startsWith(text, pos)) fail(s"expected $text")
      pos += text.length; v
    }

    private def parseObject(): JObject = {
      expect('{'); skipWs()
      val b = scala.collection.mutable.LinkedHashMap.empty[String, JValue]
      if (!atEnd && s.charAt(pos) == '}') { pos += 1; return JObject(b.toMap) }
      while (true) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        b(k) = parseValue()
        skipWs()
        if (atEnd) fail("unterminated object")
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; return JObject(b.toMap)
          case _ => fail("expected ',' or '}'")
        }
      }
      JObject(b.toMap)
    }

    private def parseArray(): JArray = {
      expect('['); skipWs()
      val b = Seq.newBuilder[JValue]
      if (!atEnd && s.charAt(pos) == ']') { pos += 1; return JArray(b.result()) }
      while (true) {
        b += parseValue()
        skipWs()
        if (atEnd) fail("unterminated array")
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; return JArray(b.result())
          case _ => fail("expected ',' or ']'")
        }
      }
      JArray(b.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        s.charAt(pos) match {
          case '"' => pos += 1; return sb.toString
          case '\\' =>
            pos += 1
            if (atEnd) fail("bad escape")
            s.charAt(pos) match {
              case '"' => sb += '"'; case '\\' => sb += '\\'
              case '/' => sb += '/'; case 'b' => sb += '\b'
              case 'f' => sb += '\f'; case 'n' => sb += '\n'
              case 'r' => sb += '\r'; case 't' => sb += '\t'
              case 'u' =>
                if (pos + 4 >= s.length) fail("bad unicode escape")
                sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
                pos += 4
              case c => fail(s"bad escape '\\$c'")
            }
            pos += 1
          case c => sb += c; pos += 1
        }
      }
      sb.toString
    }

    private def parseNumber(): JNumber = {
      val start = pos
      if (!atEnd && s.charAt(pos) == '-') pos += 1
      while (!atEnd && (Character.isDigit(s.charAt(pos)) ||
        "+-.eE".indexOf(s.charAt(pos)) >= 0)) pos += 1
      if (pos == start) fail("expected number")
      try JNumber(BigDecimal(s.substring(start, pos)))
      catch { case _: NumberFormatException => fail("malformed number") }
    }
  }
}
