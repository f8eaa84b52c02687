package graft.serial

/** Minimal JSON AST + recursive-descent parser + renderer.
  *
  * Dependency-free (offline build): used by the job-spec/config layer
  * (reference's aeson `Value`, SerializationMethod.hs:268-314) and the
  * YAML subset parser. Data-plane JSON goes through `spark.read.json`;
  * this is control-plane only.
  */
sealed trait JValue {
  def render: String = this match {
    case JNull       => "null"
    case JBool(b)    => b.toString
    case JNum(n)     =>
      if (n == math.rint(n) && math.abs(n) < 1e15) n.toLong.toString
      else n.toString
    case JStr(s)     => JValue.quote(s)
    case JArr(xs)    => xs.map(_.render).mkString("[", ",", "]")
    case JObj(fs)    =>
      fs.map { case (k, v) => s"${JValue.quote(k)}:${v.render}" }
        .mkString("{", ",", "}")
  }
  def \(key: String): Option[JValue] = this match {
    case JObj(fs) => fs.collectFirst { case (k, v) if k == key => v }
    case _        => None
  }
  def asString: Option[String] = this match {
    case JStr(s)  => Some(s)
    case JNum(n)  => Some(JNum(n).render)
    case JBool(b) => Some(b.toString)
    case _        => None
  }
  def asObj: Seq[(String, JValue)] = this match {
    case JObj(fs) => fs; case _ => Seq.empty
  }
  def asArr: Seq[JValue] = this match {
    case JArr(xs) => xs; case _ => Seq.empty
  }
}
case object JNull extends JValue
final case class JBool(b: Boolean) extends JValue
final case class JNum(n: Double) extends JValue
final case class JStr(s: String) extends JValue
final case class JArr(xs: Seq[JValue]) extends JValue
final case class JObj(fields: Seq[(String, JValue)]) extends JValue

object JValue {
  /** Right-biased recursive object merge — the non-union monoid for
    * config-like layered reads (SURVEY §1.5: deep-merge, not
    * unionByName): scalars/arrays from `over` replace `base`, objects
    * merge key-wise. */
  def deepMerge(base: JValue, over: JValue): JValue = (base, over) match {
    case (JObj(b), JObj(o)) =>
      val bKeys = b.map(_._1)
      val merged = b.map { case (k, bv) =>
        k -> o.collectFirst { case (`k`, ov) => deepMerge(bv, ov) }
          .getOrElse(bv)
      }
      JObj(merged ++ o.filterNot { case (k, _) => bKeys.contains(k) })
    case (_, o) => o
  }

  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def parse(s: String): JValue = {
    val p = new Parser(s); val v = p.value(); p.skipWs()
    require(p.eof, s"trailing JSON at ${p.pos}: ${s.drop(p.pos).take(20)}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    private def literal(word: String): Unit = {
      // verify the characters, not just the length — "nope" must be a
      // parse error, not a silent JNull
      require(pos + word.length <= s.length &&
        s.regionMatches(pos, word, 0, word.length),
        s"invalid literal at $pos (expected '$word')")
      pos += word.length
    }
    def value(): JValue = {
      skipWs()
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _   => num()
      }
    }
    private def obj(): JValue = {
      expect('{'); skipWs()
      if (s.charAt(pos) == '}') { pos += 1; return JObj(Nil) }
      val fs = Seq.newBuilder[(String, JValue)]
      var done = false
      while (!done) {
        skipWs(); val k = str(); expect(':'); fs += (k -> value()); skipWs()
        if (s.charAt(pos) == ',') pos += 1 else { expect('}'); done = true }
      }
      JObj(fs.result())
    }
    private def arr(): JValue = {
      expect('['); skipWs()
      if (s.charAt(pos) == ']') { pos += 1; return JArr(Nil) }
      val xs = Seq.newBuilder[JValue]
      var done = false
      while (!done) {
        xs += value(); skipWs()
        if (s.charAt(pos) == ',') pos += 1 else { expect(']'); done = true }
      }
      JArr(xs.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'
            case 'r' => sb += '\r'; case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case o => sb += o
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.result()
    }
    private def num(): JValue = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      JNum(s.substring(start, pos).toDouble)
    }
  }
}
