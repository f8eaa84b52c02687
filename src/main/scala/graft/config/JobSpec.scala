package graft.config

import graft.loc.{LocTemplate, MappingRhs, Mappings}
import graft.model.VPath
import graft.serial._

/** The job-spec document: `variables:` / `data:` / `locations:` /
  * `cache:` sections plus CLI overrides — the reference's YAML config
  * surface (PorcupineTree.hs:297-304,330-350; CLI.hs:66-84;
  * FIXTURES.md A.5).
  *
  * ```yaml
  * variables: {folder: experiment1}
  * data:      {Settings: {users: "0..10"}}
  * cache:     /shared/graft-cache   # content-hash memo store root
  * locations:
  *   /: /data/root                 # root mapping, inherited downward
  *   /Inputs/User: "_-{userId}.json"
  *   /Outputs/Analysis: [a.json, b.json]   # layers
  *   /Inputs/Api: {url: "https://api.example.com/u.json", timeoutSeconds: 5}
  *   /debug/out: null              # unmapped
  * ```
  *
  * `cache:` is the reference's funflow store configuration
  * (Run.hs:158-181 `getFunflowOpts`, env `FUNFLOW_STORE`): it points
  * the run's content-hash memo ([[graft.cache.Memo]]) at a directory —
  * local or any Hadoop scheme for cluster-wide reuse
  * (FunflowRemoteCache.hs:32-59). Precedence: `--cache-root` CLI flag
  * > `cache:` spec key > `GRAFT_CACHE` env (resolved in [[CLI]]).
  *
  * An object location rhs is the reference's JSON location form
  * (HTTP.hs:58-153): `url` is the layer, remaining scalar fields become
  * accessor options (readMethod/writeMethod/timeoutSeconds/accept).
  */
final case class JobSpec(
    variables: Map[String, String],
    data: JValue,
    mappings: Mappings,
    cache: Option[String] = None) {

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
      // point the run's content-hash memo at a store root — the CLI
      // arm of the reference's FUNFLOW_STORE config (Run.hs:158-181)
      case "--cache-root" :: root :: tail if !root.startsWith("-") =>
        walk(spec.copy(cache = Some(root)), tail)
      case _ :: tail => walk(spec, tail)
      case Nil => spec
    }
    walk(this, args.toList)
  }

  /** Render back to a JSON document (the `save`/`write-config-template`
    * direction, CLI.hs:203-235). */
  def render: String = {
    def locJson(l: LocTemplate): JValue =
      if (l.options.isEmpty) JStr(l.raw)
      else JObj(("url" -> (JStr(l.raw): JValue)) +:
        l.options.toSeq.sorted.map { case (k, v) => k -> (JStr(v): JValue) })
    val locs = mappings.bindings.toSeq.sortBy(_._1.toString).map {
      case (p, MappingRhs.Layers(Seq(l))) => p.toString -> locJson(l)
      case (p, MappingRhs.Layers(ls)) =>
        p.toString -> JArr(ls.map(locJson))
      case (p, MappingRhs.Unmapped) => p.toString -> (JNull: JValue)
      case (p, MappingRhs.Inherit(suffix)) =>
        p.toString -> (JStr(if (suffix.isEmpty) "_" else "_" + suffix): JValue)
    }
    JObj(Seq(
      "variables" -> JObj(variables.toSeq.sorted.map {
        case (k, v) => k -> JStr(v)
      }),
      "data" -> data) ++
      cache.map(c => "cache" -> (JStr(c): JValue)).toSeq ++ Seq(
      "locations" -> JObj(locs))).render
  }
}

object JobSpec {

  val empty: JobSpec = JobSpec(Map.empty, JObj(Nil), Mappings.empty)

  /** Parse a YAML (or JSON — YAML is a superset here) spec document. */
  def parse(text: String): JobSpec = fromJson(
    if (text.trim.startsWith("{")) JValue.parse(text) else Yaml.parse(text))

  /** An object location (reference JSON location form, HTTP.hs:58-153):
    * `url` (or `path`) is the layer; other scalar fields become
    * accessor options. */
  private def locFromObj(p: String, fields: Seq[(String, JValue)])
      : LocTemplate = {
    val url = fields.collectFirst {
      case ("url", JStr(u))  => u
      case ("path", JStr(u)) => u
    }.getOrElse(throw new IllegalArgumentException(
      s"object location for $p needs a 'url' field"))
    val opts = fields.collect {
      case (k, JStr(s)) if k != "url" && k != "path" => k -> s
      case (k, JNum(n)) => k ->
        (if (n == n.toLong.toDouble) n.toLong.toString else n.toString)
      case (k, JBool(b)) => k -> b.toString
    }.toMap
    LocTemplate(url, opts)
  }

  def fromJson(doc: JValue): JobSpec = {
    val vars = (doc \ "variables").map(_.asObj.flatMap {
      case (k, v) => v.asString.map(k -> _)
    }.toMap).getOrElse(Map.empty)
    val data = (doc \ "data").getOrElse(JObj(Nil))
    val cache = (doc \ "cache").flatMap(_.asString)
    def parseLoc(p: String, v: JValue): LocTemplate = v match {
      case JStr(s)     => LocTemplate(s)
      case JObj(fs)    => locFromObj(p, fs)
      case other => throw new IllegalArgumentException(
        s"bad layer for $p: ${other.render}")
    }
    val bindings = (doc \ "locations").map(_.asObj.map {
      case (p, JNull)    => VPath(p) -> (MappingRhs.Unmapped: MappingRhs)
      case (p, JStr(s))  => VPath(p) -> MappingRhs.parse(s)
      case (p, o @ JObj(_)) => VPath(p) -> (MappingRhs.Layers(
        Seq(parseLoc(p, o))): MappingRhs)
      case (p, JArr(xs)) => VPath(p) -> (MappingRhs.Layers(
        xs.map(parseLoc(p, _))): MappingRhs)
      case (p, other) => throw new IllegalArgumentException(
        s"bad location rhs for $p: ${other.render}")
    }.toMap).getOrElse(Map.empty)
    JobSpec(vars, data, Mappings(bindings, vars), cache)
  }

  def fromFile(path: String): JobSpec = parse(new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
