package graft.config

import graft.serial._

/** Documented, defaulted, path-named option fields — the Spark-native
  * docrecords analog (docrecords/src/Data/DocRecord.hs:240-247,
  * 657-674): each field carries a path, a typed default, and a
  * docstring; values resolve by source priority Default < spec file <
  * CLI (OptParse.hs:50-61, DocRecord.hs:220-233).
  */
sealed trait OptValue {
  def render: String = this match {
    case OptStr(s)  => s
    case OptNum(n)  => JNum(n).render
    case OptBool(b) => b.toString
    case OptList(l) => l.map(_.render).mkString(",")
  }
}
final case class OptStr(s: String) extends OptValue
final case class OptNum(n: Double) extends OptValue
final case class OptBool(b: Boolean) extends OptValue
final case class OptList(l: Seq[OptValue]) extends OptValue

object OptValue {
  def fromJson(j: JValue): OptValue = j match {
    case JStr(s)  => OptStr(s)
    case JNum(n)  => OptNum(n)
    case JBool(b) => OptBool(b)
    case JArr(xs) => OptList(xs.map(fromJson))
    case JObj(_)  => OptStr(j.render)
    case JNull    => OptStr("")
  }
  def toJson(v: OptValue): JValue = v match {
    case OptStr(s)  => JStr(s)
    case OptNum(n)  => JNum(n)
    case OptBool(b) => JBool(b)
    case OptList(l) => JArr(l.map(toJson))
  }
}

/** One documented field: dotted path (e.g. "users.range"), default,
  * doc. `required` fields have no default (reference `fieldNoDef`). */
final case class OptField(
    path: String,
    default: Option[OptValue],
    doc: String = "") {
  def flagName: String = "--" + path.replace('.', '-')
}

/** Provenance of a resolved value (reference `SourceTag`). */
sealed trait OptSource
object OptSource {
  case object Default extends OptSource
  case object SpecFile extends OptSource
  case object Cli extends OptSource
}

/** A schema of option fields + resolution / documentation / template
  * generation (reference `getOptions` OPT:68-84, `showDocumentation`
  * DocRecord.hs:408-426, `parseRecFromCLI` OptParse.hs:145-156). */
final case class OptionsSchema(fields: Seq[OptField]) {

  /** Resolve values: defaults, overlaid with the spec's `data:`/
    * `options:` JSON object (dotted-path lookup), overlaid with CLI
    * `--path value` flags. Highest priority wins. */
  def resolve(spec: Option[JValue], cliArgs: Seq[String])
      : Map[String, (OptValue, OptSource)] = {
    def lookup(j: JValue, path: Seq[String]): Option[JValue] =
      path.foldLeft(Option(j))((acc, seg) => acc.flatMap(_ \ seg))
    val fromDefaults = fields.flatMap(f =>
      f.default.map(d => f.path -> (d, OptSource.Default: OptSource)))
    val fromSpec = for {
      s <- spec.toSeq
      f <- fields
      v <- lookup(s, f.path.split('.').toSeq)
      if v != JNull
    } yield f.path -> (OptValue.fromJson(v), OptSource.SpecFile: OptSource)
    val fromCli = cliArgs.sliding(2).collect {
      case Seq(flag, value) if flag.startsWith("--") =>
        val path = flag.drop(2).replace('-', '.')
        fields.find(_.path == path).map { f =>
          f.path -> (Yaml.scalar(value) match {
            case j => OptValue.fromJson(j)
          }, OptSource.Cli: OptSource)
        }
    }.flatten.toSeq
    // boolean --flag / --no-flag shorthand (OptParse.hs:108-121):
    // --no-x always means false; bare --x (no value following) means
    // true when x is a declared boolean field
    val boolCli = cliArgs.collect {
      case flag if flag.startsWith("--no-") &&
          fields.exists(_.path == flag.drop(5).replace('-', '.')) =>
        flag.drop(5).replace('-', '.') ->
          (OptBool(false): OptValue, OptSource.Cli: OptSource)
    }
    val bareBoolCli = cliArgs.zipWithIndex.collect {
      case (flag, i) if flag.startsWith("--") && !flag.startsWith("--no-") && {
        val path = flag.drop(2).replace('-', '.')
        fields.exists(f => f.path == path &&
          f.default.exists(_.isInstanceOf[OptBool])) &&
          (i + 1 >= cliArgs.length || cliArgs(i + 1).startsWith("-"))
      } => flag.drop(2).replace('-', '.') ->
        (OptBool(true): OptValue, OptSource.Cli: OptSource)
    }
    (fromDefaults ++ fromSpec ++ fromCli ++ bareBoolCli ++ boolCli).toMap
  }

  /** Spec keys that match no declared field — surfaced as warnings so
    * a typo'd option doesn't silently fall back to its default
    * (reference YAML/default merge warnings, CLI.hs:377-391). */
  def unknownKeys(spec: JValue): Seq[String] = {
    def walk(j: JValue, prefix: Seq[String]): Seq[Seq[String]] = j match {
      case JObj(fs) => fs.flatMap { case (k, v) => walk(v, prefix :+ k) }
      case _        => Seq(prefix)
    }
    val declared = fields.map(_.path).toSet
    walk(spec, Nil).map(_.mkString("."))
      .filterNot(p => declared.exists(d => d == p || d.startsWith(p + ".")))
  }

  /** Resolve, failing on required fields that never got a value. */
  def resolveStrict(spec: Option[JValue], cliArgs: Seq[String])
      : Map[String, OptValue] = {
    val r = resolve(spec, cliArgs)
    val missing = fields.filter(f => !r.contains(f.path))
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"missing required options: ${missing.map(_.path).mkString(", ")}")
    r.map { case (k, (v, _)) => k -> v }
  }

  /** `--help`-style field docs. */
  def documentation: String =
    fields.map { f =>
      val d = f.default.map(v => s" (default: ${v.render})").getOrElse(" (required)")
      f"  ${f.flagName}%-28s ${f.doc}$d"
    }.mkString("\n")

  /** Default config template body (write-config-template). */
  def templateJson: JValue =
    JObj(fields.map(f =>
      f.path -> f.default.map(OptValue.toJson).getOrElse(JNull)))
}
