package graft.config

import graft.loc.{LocTemplate, MappingRhs, Mappings}
import graft.model.VPath
import graft.serial._

/** The job-spec document: `variables:` / `data:` / `locations:`
  * sections plus CLI overrides — the reference's YAML config surface
  * (PorcupineTree.hs:297-304,330-350; CLI.hs:66-84; FIXTURES.md A.5).
  *
  * ```yaml
  * variables: {folder: experiment1}
  * data:      {Settings: {users: "0..10"}}
  * locations:
  *   /: /data/root                 # root mapping, inherited downward
  *   /Inputs/User: "_-{userId}.json"
  *   /Outputs/Analysis: [a.json, b.json]   # layers
  *   /debug/out: null              # unmapped
  * ```
  */
final case class JobSpec(
    variables: Map[String, String],
    data: JValue,
    mappings: Mappings) {

  /** `--loc vpath=loc` / `vpath+=loc` / `--var k=v` / `-o path=value`
    * CLI overrides (reference PorcupineTree.hs:354-404,
    * ConfigurationReader.hs:69-123). Returns the overridden spec. */
  def withCliArgs(args: Seq[String]): JobSpec = {
    def overrideData(d: JValue, path: Seq[String], v: JValue): JValue =
      path match {
        case Seq() => v
        case head +: rest =>
          val fields = d.asObj
          val updated =
            if (fields.exists(_._1 == head))
              fields.map { case (k, old) =>
                if (k == head) k -> overrideData(old, rest, v) else k -> old
              }
            else fields :+ (head -> overrideData(JObj(Nil), rest, v))
          JObj(updated)
      }
    // cursor walk, NOT grouped(2): a bare boolean flag or positional
    // anywhere in the arg list must not shift flag/value alignment and
    // silently swallow the overrides after it
    @annotation.tailrec
    def walk(spec: JobSpec, rest: List[String]): JobSpec = rest match {
      case "--loc" :: kv :: tail if kv.contains('=') =>
        // the add-layer marker is a '+' IMMEDIATELY before the FIRST
        // '=' (vpath+=loc); a '+=' later in the value ('/out=/x+=y')
        // must not reroute a plain replace
        val eq = kv.indexOf('=')
        val next =
          if (eq > 0 && kv.charAt(eq - 1) == '+')
            spec.copy(mappings = spec.mappings.addLayer(
              VPath(kv.substring(0, eq - 1)),
              LocTemplate(kv.substring(eq + 1))))
          else
            spec.copy(mappings = spec.mappings.set(
              VPath(kv.substring(0, eq)),
              MappingRhs.parse(kv.substring(eq + 1))))
        walk(next, tail)
      case "--var" :: kv :: tail if kv.contains('=') =>
        val Array(k, v) = kv.split("=", 2)
        walk(spec.copy(
          variables = spec.variables + (k -> v),
          mappings = spec.mappings.withVariable(k, v)), tail)
      case "-o" :: kv :: tail if kv.contains('=') =>
        val Array(p, v) = kv.split("=", 2)
        walk(spec.copy(data =
          overrideData(spec.data, p.split('.').toSeq, Yaml.scalar(v))), tail)
      case _ :: tail => walk(spec, tail)
      case Nil => spec
    }
    walk(this, args.toList)
  }

  /** Render back to a JSON document (the `save`/`write-config-template`
    * direction, CLI.hs:203-235). */
  def render: String = {
    val locs = mappings.bindings.toSeq.sortBy(_._1.toString).map {
      case (p, MappingRhs.Layers(Seq(l))) => p.toString -> JStr(l.raw)
      case (p, MappingRhs.Layers(ls)) =>
        p.toString -> JArr(ls.map(l => JStr(l.raw)))
      case (p, MappingRhs.Unmapped) => p.toString -> JNull
      case (p, MappingRhs.Inherit(suffix)) =>
        p.toString -> JStr(if (suffix.isEmpty) "_" else "_" + suffix)
    }
    JObj(Seq(
      "variables" -> JObj(variables.toSeq.sorted.map {
        case (k, v) => k -> JStr(v)
      }),
      "data" -> data,
      "locations" -> JObj(locs))).render
  }
}

object JobSpec {

  val empty: JobSpec = JobSpec(Map.empty, JObj(Nil), Mappings.empty)

  /** Parse a YAML (or JSON — YAML is a superset here) spec document. */
  def parse(text: String): JobSpec = fromJson(
    if (text.trim.startsWith("{")) JValue.parse(text) else Yaml.parse(text))

  def fromJson(doc: JValue): JobSpec = {
    val vars = (doc \ "variables").map(_.asObj.flatMap {
      case (k, v) => v.asString.map(k -> _)
    }.toMap).getOrElse(Map.empty)
    val data = (doc \ "data").getOrElse(JObj(Nil))
    val bindings = (doc \ "locations").map(_.asObj.map {
      case (p, JNull)    => VPath(p) -> (MappingRhs.Unmapped: MappingRhs)
      case (p, JStr(s))  => VPath(p) -> MappingRhs.parse(s)
      case (p, JArr(xs)) => VPath(p) -> (MappingRhs.Layers(
        xs.flatMap(_.asString).map(LocTemplate(_))): MappingRhs)
      case (p, other) => throw new IllegalArgumentException(
        s"bad location rhs for $p: ${other.render}")
    }.toMap).getOrElse(Map.empty)
    JobSpec(vars, data, Mappings(bindings, vars))
  }

  def fromFile(path: String): JobSpec = parse(new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
