package graft.loc

import graft.model.{Catalog, ReadScheme, Usage, VPath}

/** One binding for a virtual path: explicit layers, explicitly unmapped
  * (`null` in the job spec — allowed only for LayeredWithNull reads,
  * reference MAP:123-159), or the inherit-from-parent shortcut `_`
  * (optionally with a suffix, `_-{var}.ext`). */
sealed trait MappingRhs
object MappingRhs {
  final case class Layers(locs: Seq[LocTemplate]) extends MappingRhs
  case object Unmapped extends MappingRhs
  /** `_` = parentDir/entryName.defaultExt; `suffix` replaces the default
    * file name tail, e.g. `_-{userId}.json` (MAP:123-159). */
  final case class Inherit(suffix: String = "") extends MappingRhs

  /** Parse a job-spec rhs string (reference resolveLocShortcut
    * MAP:228-233). */
  def parse(s: String): MappingRhs = s match {
    case null | "null" => Unmapped
    case "_"           => Inherit()
    case s if s.startsWith("_") => Inherit(s.drop(1))
    case s             => Layers(Seq(LocTemplate(s)))
  }
}

/** The `locations:` section of a job spec: virtual path -> physical
  * binding, with downward propagation of folder mappings
  * (reference Mappings.hs:182-224, PorcupineTree.hs:417-428).
  */
final case class Mappings(
    bindings: Map[VPath, MappingRhs],
    variables: Map[String, String] = Map.empty) {

  def withVariable(k: String, v: String): Mappings =
    copy(variables = variables + (k -> v))

  /** `vpath+=loc` — append a read layer (reference `AddLayer`,
    * PorcupineTree.hs:354-404). */
  def addLayer(p: VPath, loc: LocTemplate): Mappings =
    copy(bindings = bindings.updatedWith(p) {
      case Some(MappingRhs.Layers(ls)) => Some(MappingRhs.Layers(ls :+ loc))
      case _                           => Some(MappingRhs.Layers(Seq(loc)))
    })

  /** `vpath=loc` — replace layers (reference `ReplaceLayers`). */
  def set(p: VPath, rhs: MappingRhs): Mappings =
    copy(bindings = bindings + (p -> rhs))

  /** Resolve one catalog entry to its concrete physical layers.
    *
    * Resolution order (reference propagateMappings MAP:182-203 +
    * applyOneVFileMapping PTREE:512-529):
    *  1. exact binding if present;
    *  2. else walk up ancestors: nearest folder binding + relative
    *     segments appended (`parentLoc/seg1/seg2/name.defaultExt`);
    *  3. splice `variables:`, fill default extension.
    */
  def layersFor(path: VPath, defaultExt: String): Resolved = {
    def finish(locs: Seq[LocTemplate]): Resolved =
      Resolved.Bound(locs.map(_.splice(variables).withDefaultExt(defaultExt)))

    def inherited(suffix: String): Option[Seq[LocTemplate]] = {
      // nearest ancestor with a DECISIVE binding: Layers inherits
      // downward; Unmapped STOPS the walk — `null`-ing a folder
      // unmaps its whole subtree (reference null-mapping semantics),
      // it must not be skipped in favor of a higher ancestor. A
      // folder-level Inherit is transparent (it resolves upward
      // itself).
      val anc = Iterator.iterate(path.parent)(_.flatMap(_.parent))
        .takeWhile(_.isDefined).flatten
        .flatMap(a => bindings.get(a) match {
          case Some(MappingRhs.Layers(ls)) => Some((a, Some(ls)))
          case Some(MappingRhs.Unmapped)   => Some((a, None))
          case _                           => None
        }).toSeq.headOption
      anc.flatMap {
        case (_, None) => None // under an explicitly unmapped folder
        case (a, Some(parentLocs)) =>
          val rel = path.relativeTo(a)
          Some(parentLocs.map { pl =>
            val base = rel.foldLeft(pl)(_ / _)
            if (suffix.isEmpty) base else base.copy(raw = base.raw + suffix)
          })
      }
    }

    bindings.get(path) match {
      case Some(MappingRhs.Unmapped)   => Resolved.Unbound
      case Some(MappingRhs.Layers(ls)) => finish(ls)
      case Some(MappingRhs.Inherit(suffix)) =>
        inherited(suffix).map(finish).getOrElse(Resolved.Unbound)
      case None =>
        inherited("").map(finish).getOrElse(Resolved.Unbound)
    }
  }

  /** Bind a whole catalog, running the reference's config-time checks:
    * unbound required input, extension-vs-formats compatibility
    * (PorcupineTree.hs:647-694, 656-665). */
  def bind(catalog: Catalog): Map[VPath, Resolved] =
    catalog.entries.map { case (p, vf) =>
      val r = layersFor(p, vf.defaultExt)
      r match {
        case Resolved.Unbound
            if vf.usage != Usage.Sink &&
              vf.readScheme != ReadScheme.LayeredWithNull &&
              vf.embeddedDefault.isEmpty =>
          throw new IllegalStateException(
            s"required input $p has no bound location (and no default)")
        case Resolved.Bound(locs) =>
          locs.flatMap(_.dataExtension).foreach { ext =>
            if (!vf.formats.contains(ext))
              throw new IllegalStateException(
                s"$p bound to .$ext but declares formats ${vf.formats.mkString(",")}")
          }
        case _ => ()
      }
      p -> r
    }
}

sealed trait Resolved
object Resolved {
  final case class Bound(layers: Seq[LocTemplate]) extends Resolved
  case object Unbound extends Resolved
}

object Mappings {
  val empty: Mappings = Mappings(Map.empty)
  /** Root mapping: everything under `dir` (the common case: a dataset
    * root directory, reference FIXTURES A.5 `/: some/dir`). */
  def root(dir: String): Mappings =
    Mappings(Map(VPath.root -> MappingRhs.Layers(Seq(LocTemplate(dir)))))
}
