package graft.model

/** Virtual path in the catalog namespace, e.g. `/Inputs/User`.
  *
  * Mirrors the reference's `LocationTreePathItem` lists
  * (porcupine-core/src/Data/Locations/LocationTree.hs:74-85) — but as a
  * flat, immutable path value; the tree structure lives in [[Catalog]].
  */
final case class VPath(segments: Vector[String]) {
  def /(s: String): VPath = VPath(segments :+ s)
  def parent: Option[VPath] =
    if (segments.isEmpty) None else Some(VPath(segments.init))
  def name: String = segments.lastOption.getOrElse("")
  def startsWith(p: VPath): Boolean = segments.startsWith(p.segments)
  /** Path relative to `p` (undefined unless `startsWith(p)`). */
  def relativeTo(p: VPath): Vector[String] = segments.drop(p.segments.size)
  def isRoot: Boolean = segments.isEmpty
  override def toString: String = "/" + segments.mkString("/")
}

object VPath {
  val root: VPath = VPath(Vector.empty)
  /** Parse `/a/b/c` (leading slash optional; empty segments dropped). */
  def apply(s: String): VPath =
    VPath(s.split('/').iterator.filter(_.nonEmpty).toVector)
}
