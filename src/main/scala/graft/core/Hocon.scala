package graft.core

import scala.collection.mutable
import org.json4s._

/** Minimal HOCON parser for pipeline-config cells — the reference's `%arc`
  * cells are HOCON, not JSON (ArcInterpreter.scala:404-423), so every
  * existing notebook uses this syntax. The typesafe-config library is not on
  * the classpath in this environment; this covers the subset those cells use:
  *
  *  - objects with optional root braces, unquoted and dotted keys,
  *    `:` / `=` / implicit-object (`key { … }`) separators
  *  - arrays; elements and fields separated by commas OR newlines
  *  - `"quoted"`, `"""triple-quoted"""` (verbatim, for SQL bodies) and
  *    unquoted strings; numbers / booleans / null
  *  - `//` and `#` comments
  *  - `${name}` / `${?name}` substitutions resolved against a caller-supplied
  *    environment (session params ∪ system env), including concatenation with
  *    adjacent strings (`"prefix"${x}"suffix"`)
  *  - duplicate keys: objects deep-merge, scalars last-wins
  *
  * Parses to json4s JValues so the existing PipelineConfig builders consume
  * HOCON and JSON identically (JSON is a subset of this grammar).
  */
object Hocon {

  def parse(text: String, env: Map[String, String] = Map.empty): JValue =
    new P(text, env).parseRoot()

  final class HoconParseException(msg: String) extends IllegalArgumentException(msg)

  private final class P(s: String, env: Map[String, String]) {
    private var i = 0

    private def eof: Boolean = i >= s.length
    private def peek: Char = s.charAt(i)
    private def startsWith(t: String): Boolean = s.startsWith(t, i)

    private def fail(msg: String): Nothing = {
      val line = s.substring(0, math.min(i, s.length)).count(_ == '\n') + 1
      throw new HoconParseException(s"HOCON parse error at line $line: $msg")
    }

    /** Skip whitespace and comments. When `stopAtNewline`, newlines are left
      * in place (they act as element separators).
      */
    private def ws(stopAtNewline: Boolean = false): Unit = {
      var moved = true
      while (moved && !eof) {
        moved = false
        while (!eof && peek.isWhitespace && !(stopAtNewline && peek == '\n')) { i += 1; moved = true }
        if (!eof && (peek == '#' || startsWith("//"))) {
          while (!eof && peek != '\n') i += 1
          moved = true
        }
      }
    }

    def parseRoot(): JValue = {
      ws()
      val v =
        if (eof) JObject(Nil)
        else if (peek == '[') parseArray()
        else if (peek == '{') parseObject()
        else parseObjectBody(closed = false) // braceless root object
      ws()
      if (!eof) fail(s"unexpected trailing content: '${s.charAt(i)}'")
      v
    }

    private def expect(c: Char): Unit =
      if (eof || peek != c) fail(s"expected '$c'") else i += 1

    private def parseObject(): JValue = {
      expect('{')
      val o = parseObjectBody(closed = true)
      expect('}')
      o
    }

    private def merge(old: JValue, nw: JValue): JValue = (old, nw) match {
      case (JObject(a), JObject(b)) =>
        val m = mutable.LinkedHashMap[String, JValue](a: _*)
        b.foreach { case (k, v) => m(k) = m.get(k).map(merge(_, v)).getOrElse(v) }
        JObject(m.toList)
      case (_, v) => v
    }

    private def nest(path: List[String], v: JValue): JValue =
      path.foldRight(v)((k, acc) => JObject(List(k -> acc)))

    private def parseObjectBody(closed: Boolean): JObject = {
      val fields = mutable.LinkedHashMap[String, JValue]()
      var done = false
      while (!done) {
        ws()
        while (!eof && peek == ',') { i += 1; ws() }
        if (eof) { if (closed) fail("unterminated object"); done = true }
        else if (peek == '}') { if (!closed) fail("unexpected '}'"); done = true }
        else {
          val (key, quoted) = parseKey()
          ws()
          val value =
            if (!eof && peek == '{') parseObject()
            else if (!eof && (peek == ':' || peek == '=')) { i += 1; ws(); parseValue() }
            else fail(s"expected ':', '=' or '{' after key '$key'")
          val (head, v) =
            if (!quoted && key.contains('.')) {
              val parts = key.split('\\' + ".").toList.filter(_.nonEmpty)
              (parts.head, nest(parts.tail, value))
            } else (key, value)
          fields(head) = fields.get(head).map(merge(_, v)).getOrElse(v)
        }
      }
      JObject(fields.toList)
    }

    private def parseKey(): (String, Boolean) =
      if (peek == '"') (parseQuoted(), true)
      else {
        val start = i
        while (!eof && !peek.isWhitespace && !":={[,#".contains(peek) && !startsWith("//")) i += 1
        if (i == start) fail("empty key")
        (s.substring(start, i), false)
      }

    private def parseQuoted(): String =
      if (startsWith("\"\"\"")) {
        i += 3
        val end = s.indexOf("\"\"\"", i)
        if (end < 0) fail("unterminated triple-quoted string")
        val r = s.substring(i, end)
        i = end + 3
        r
      } else {
        expect('"')
        val sb = new StringBuilder
        while (!eof && peek != '"') {
          if (peek == '\\' && i + 1 < s.length) {
            i += 1
            sb.append(peek match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case 'b' => '\b'; case 'f' => '\f'
              case 'u' =>
                val hex = s.substring(i + 1, i + 5); i += 4
                Integer.parseInt(hex, 16).toChar
              case c => c
            })
            i += 1
          } else { sb.append(peek); i += 1 }
        }
        expect('"')
        sb.toString
      }

    private def substitution(): Option[String] = {
      // at "${"
      i += 2
      val optional = !eof && peek == '?'
      if (optional) i += 1
      val end = s.indexOf('}', i)
      if (end < 0) fail("unterminated ${ substitution")
      val name = s.substring(i, end).trim
      i = end + 1
      env.get(name).orElse(sys.env.get(name)) match {
        case Some(v)             => Some(v)
        case None if optional    => None
        case None                => fail(s"substitution $${$name} is undefined")
      }
    }

    /** String-ish value: concatenation chain of quoted strings and
      * substitutions (`"a"${x}"b"`), ending at a separator.
      */
    private def stringChain(first: String): JValue = {
      val sb = new StringBuilder(first)
      var more = true
      while (more && !eof) {
        if (peek == '"') sb.append(parseQuoted())
        else if (startsWith("${")) substitution().foreach(sb.append(_))
        else more = false
      }
      JString(sb.toString)
    }

    private def atSeparator: Boolean =
      eof || peek == '\n' || peek == ',' || peek == ']' || peek == '}' ||
        peek == '#' || startsWith("//")

    private def parseValue(): JValue = {
      if (eof) fail("expected a value")
      peek match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => stringChain(parseQuoted())
        case '$' if startsWith("${") =>
          substitution() match {
            case Some(v) if atSeparator => JString(v)
            case Some(v) if peek == '"' || startsWith("${") => stringChain(v)
            case Some(v)                => interpret(v + unquotedRaw())
            case None if atSeparator    => JNothing // optional + missing: field absent
            case None if peek == '"'    => stringChain("")
            case None                   => interpret(unquotedRaw())
          }
        case _ => interpret(unquotedRaw())
      }
    }

    /** Unquoted scalar text: runs to end-of-line / ',' / ']' / '}' / comment,
      * with inline `${...}` substitutions expanded.
      */
    private def unquotedRaw(): String = {
      val sb = new StringBuilder
      while (!atSeparator) {
        if (startsWith("${")) substitution().foreach(sb.append(_))
        else { sb.append(peek); i += 1 }
      }
      sb.toString.trim
    }

    /** Interpret trimmed unquoted text as bool / null / number / string. */
    private def interpret(raw: String): JValue = raw match {
      case "true"  => JBool(true)
      case "false" => JBool(false)
      case "null"  => JNull
      case _ =>
        if (raw.matches("[+-]?\\d+")) JInt(BigInt(raw))
        else if (raw.matches("[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?"))
          JDouble(raw.toDouble)
        else JString(raw)
    }

    private def parseArray(): JValue = {
      expect('[')
      val items = mutable.ListBuffer[JValue]()
      var done = false
      while (!done) {
        ws()
        while (!eof && peek == ',') { i += 1; ws() }
        if (eof) fail("unterminated array")
        else if (peek == ']') { i += 1; done = true }
        else parseValue() match {
          case JNothing => () // optional substitution that resolved to nothing
          case v        => items += v
        }
      }
      JArray(items.toList)
    }
  }
}
