package graft.config

import graft.serial._

/** Config-migration adapters — the reference's record bijections
  * (`RecBijection`: `bijectField`/`renameField`/`addConstField`/
  * `bijectUnder`, docrecords DocRecord.hs:941-1006): mechanical spec
  * rewrites so an old job spec keeps working against a renamed /
  * restructured option schema. Steps compose left-to-right. */
object SpecMigration {

  sealed trait Step
  /** Rename the key at parent path `at` from `from` to `to`. */
  final case class RenameKey(at: Seq[String], from: String, to: String)
      extends Step
  /** Add `key -> value` under `at` if absent (defaulting migration). */
  final case class AddConst(at: Seq[String], key: String, value: JValue)
      extends Step
  /** Remove the key at parent path `at`. */
  final case class RemoveKey(at: Seq[String], key: String) extends Step
  /** Nest: move `key` under a new object `wrapper` (bijectUnder). */
  final case class NestUnder(at: Seq[String], key: String, wrapper: String)
      extends Step
  /** Apply `f` to the value at `at`/`key` (bijectField). */
  final case class MapValue(at: Seq[String], key: String,
                            f: JValue => JValue) extends Step

  private def update(doc: JValue, at: Seq[String])(
      f: Seq[(String, JValue)] => Seq[(String, JValue)]): JValue =
    at match {
      case Nil => doc match {
        case JObj(fs) => JObj(f(fs))
        case other    => other
      }
      case seg +: rest => doc match {
        case JObj(fs) => JObj(fs.map {
          case (k, v) if k == seg => k -> update(v, rest)(f)
          case kv                 => kv
        })
        case other => other
      }
    }

  def applyStep(doc: JValue, step: Step): JValue = step match {
    case RenameKey(at, from, to) => update(doc, at)(_.map {
      case (k, v) if k == from => to -> v
      case kv                  => kv
    })
    case AddConst(at, key, value) => update(doc, at)(fs =>
      if (fs.exists(_._1 == key)) fs else fs :+ (key -> value))
    case RemoveKey(at, key) => update(doc, at)(_.filterNot(_._1 == key))
    case NestUnder(at, key, wrapper) => update(doc, at)(fs =>
      fs.collectFirst { case (k, v) if k == key => v } match {
        case None => fs
        case Some(v) =>
          fs.filterNot(_._1 == key) :+ (wrapper -> JObj(Seq(key -> v)))
      })
    case MapValue(at, key, f) => update(doc, at)(_.map {
      case (k, v) if k == key => k -> f(v)
      case kv                 => kv
    })
  }

  def migrate(doc: JValue, steps: Seq[Step]): JValue =
    steps.foldLeft(doc)(applyStep)

  /** Migrate a full job spec's `data:` section. */
  def migrate(spec: JobSpec, steps: Seq[Step]): JobSpec =
    spec.copy(data = migrate(spec.data, steps))
}
