package graft.serial

/** Dependency-free YAML *subset* parser sufficient for job specs
  * (reference porcupine configures pipelines with exactly this shape of
  * YAML: nested maps, lists, scalars — FIXTURES.md A.5, reference
  * docs/index.md:319-330).
  *
  * Supported: block maps (indentation), block sequences (`- item`),
  * inline `{k: v, ...}` / `[a, b]` (parsed via the JSON parser after
  * quoting bare words), quoted + bare scalars, `#` comments, `null`/
  * `~`/bools/numbers. Not supported (not needed for specs): anchors,
  * multi-doc, block scalars `|`/`>`.
  */
object Yaml {

  def parse(text: String): JValue = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (stripComment(l), i) }
      .filter { case (l, _) => l.trim.nonEmpty }
      .toVector
    if (lines.isEmpty) JNull
    else parseBlock(lines, indentOf(lines.head._1))._1
  }

  def toJson(v: JValue): String = v.render

  private def stripComment(l: String): String = {
    // a '#' outside quotes starts a comment
    var inS = false; var inD = false
    val i = l.indices.find { i =>
      l.charAt(i) match {
        case '\'' if !inD => inS = !inS; false
        case '"' if !inS  => inD = !inD; false
        case '#' if !inS && !inD =>
          i == 0 || l.charAt(i - 1).isWhitespace
        case _ => false
      }
    }
    i.fold(l)(l.substring(0, _))
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private type Lines = Vector[(String, Int)]

  /** Parse the block starting at `lines.head` whose items sit at
    * `indent`; returns (value, remaining lines). */
  private def parseBlock(lines: Lines, indent: Int): (JValue, Lines) = {
    if (lines.isEmpty) return (JNull, lines)
    val first = lines.head._1.trim
    if (first.startsWith("- ") || first == "-") parseSeq(lines, indent)
    else parseMap(lines, indent)
  }

  private def parseSeq(lines0: Lines, indent: Int): (JValue, Lines) = {
    var lines = lines0
    val items = Seq.newBuilder[JValue]
    while (lines.nonEmpty && indentOf(lines.head._1) == indent &&
           lines.head._1.trim.startsWith("-")) {
      val (l, ln) = lines.head
      val rest = l.trim.drop(1).trim
      lines = lines.tail
      if (rest.isEmpty) {
        val (v, rem) = parseBlock(lines, nextIndent(lines, indent))
        items += v; lines = rem
      } else if (rest.contains(": ") || rest.endsWith(":")) {
        // inline first key of a map item: "- k: v"
        val itemIndent = l.indexOf('-') + 2
        val synthetic = (" " * itemIndent + rest, ln) +: lines
        val (v, rem) = parseMap(synthetic, itemIndent)
        items += v; lines = rem
      } else items += scalar(rest)
    }
    (JArr(items.result()), lines)
  }

  private def parseMap(lines0: Lines, indent: Int): (JValue, Lines) = {
    var lines = lines0
    val fields = Seq.newBuilder[(String, JValue)]
    while (lines.nonEmpty && indentOf(lines.head._1) == indent &&
           !lines.head._1.trim.startsWith("- ")) {
      val l = lines.head._1.trim
      lines = lines.tail
      val ci = keyColonIndex(l)
      require(ci > 0, s"expected 'key:' in YAML line: $l")
      val key = unquoteKey(l.substring(0, ci).trim)
      val rhs = l.substring(ci + 1).trim
      if (rhs.nonEmpty) fields += (key -> scalar(rhs))
      else if (lines.nonEmpty && indentOf(lines.head._1) > indent) {
        val (v, rem) = parseBlock(lines, nextIndent(lines, indent))
        fields += (key -> v); lines = rem
      } else fields += (key -> JNull)
    }
    (JObj(fields.result()), lines)
  }

  private def nextIndent(lines: Lines, parent: Int): Int =
    if (lines.isEmpty) parent else indentOf(lines.head._1)

  /** Index of the colon ending the key (respects quoted keys). */
  private def keyColonIndex(l: String): Int =
    if (l.startsWith("\"") || l.startsWith("'")) {
      val q = l.charAt(0)
      val close = l.indexOf(q, 1)
      l.indexOf(':', close)
    } else {
      // first ': ' or trailing ':'
      val i = l.indexOf(": ")
      if (i >= 0) i else if (l.endsWith(":")) l.length - 1 else -1
    }

  private def unquoteKey(k: String): String =
    if ((k.startsWith("\"") && k.endsWith("\"")) ||
        (k.startsWith("'") && k.endsWith("'"))) k.substring(1, k.length - 1)
    else k

  /** Parse a scalar or inline {}/[] value. */
  def scalar(s0: String): JValue = {
    val s = s0.trim
    if (s.startsWith("{") || s.startsWith("[")) inline(s)
    else if (s.startsWith("\"")) JValue.parse(s)
    else if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      JStr(s.substring(1, s.length - 1).replace("''", "'"))
    else s match {
      case "null" | "~" | "Null" | "NULL" => JNull
      case "true" | "True" | "TRUE"       => JBool(true)
      case "false" | "False" | "FALSE"    => JBool(false)
      case _ =>
        s.toDoubleOption.map(JNum(_)).getOrElse(JStr(s))
    }
  }

  /** Inline flow syntax: quote bare words then reuse the JSON parser. */
  private def inline(s: String): JValue = {
    val sb = new StringBuilder
    var i = 0; var inStr = false; var strCh = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == strCh) inStr = false
        sb += (if (strCh == '\'' && c == '\'') '"' else c)
      } else {
        // YAML flow: ':' only separates a key when followed by
        // whitespace or a closing delimiter — "http://x" or "12:30"
        // inside a value is part of the scalar
        def isKeySep(j: Int): Boolean = s.charAt(j) == ':' &&
          (j + 1 >= s.length || s.charAt(j + 1).isWhitespace ||
            ",}]".indexOf(s.charAt(j + 1)) >= 0)
        c match {
          case '"' | '\'' => inStr = true; strCh = c; sb += '"'
          case '{' | '}' | '[' | ']' | ',' => sb += c
          case ':' if isKeySep(i) => sb += c
          case _ if c.isWhitespace => sb += c
          case _ =>
            // bare token: read to delimiter, quote unless number/bool/null
            val start = i
            while (i < s.length && "{}[],".indexOf(s.charAt(i)) < 0 &&
              !isKeySep(i)) i += 1
            val tok = s.substring(start, i).trim
            i -= 1
            sb ++= (scalar(tok) match {
              case v @ (JNum(_) | JBool(_) | JNull) => v.render
              case _ => JValue.quote(tok)
            })
        }
      }
      i += 1
    }
    JValue.parse(sb.result())
  }
}
