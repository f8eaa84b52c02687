package graft.model

/** The declared catalog: every virtual file a pipeline requires.
  *
  * Spark-native form of the reference's `VirtualTree = LocationTree
  * VirtualFileNode` (porcupine-core/src/System/TaskPipeline/
  * PorcupineTree.hs:246-253). The rose tree + Semigroup merge
  * (LocationTree.hs:90-92) collapses to a map keyed by [[VPath]] with a
  * node-wise merge; hierarchy is recovered from path prefixes (used by
  * mapping inheritance and `show-tree`).
  */
final case class Catalog(entries: Map[VPath, VirtualFile]) {
  /** Monoidal merge; same-path entries merged with type-clash check
    * (PorcupineTree.hs:108-114,188-198). */
  def ++(other: Catalog): Catalog =
    Catalog(other.entries.foldLeft(entries) { case (acc, (p, vf)) =>
      acc.updatedWith(p) {
        case Some(existing) => Some(existing.mergeWith(vf))
        case None           => Some(vf)
      }
    })

  def +(vf: VirtualFile): Catalog = this ++ Catalog.of(vf)

  /** Re-root every entry under `prefix` — the reference's
    * `taskInSubtree` (PTask.hs:214-219). */
  def underPrefix(prefix: VPath): Catalog =
    Catalog(entries.map { case (p, vf) =>
      val p2 = VPath(prefix.segments ++ p.segments)
      p2 -> vf.copy(path = p2)
    })

  def apply(p: VPath): VirtualFile = entries.getOrElse(
    p, throw new NoSuchElementException(s"no virtual file at $p"))
  def get(p: VPath): Option[VirtualFile] = entries.get(p)
  def paths: Seq[VPath] = entries.keys.toSeq.sortBy(_.toString)
  def isEmpty: Boolean = entries.isEmpty

  /** Render the tree for the `show-tree` / describe command
    * (reference CLI.hs:393-427). */
  def describe: String = {
    val sb = new StringBuilder
    paths.foreach { p =>
      val vf = entries(p)
      val mode = vf.usage match {
        case Usage.Source => "r"
        case Usage.Sink   => "w"
        case Usage.Bidir  => "rw"
      }
      sb ++= s"$p [$mode] (${vf.formats.mkString(",")})"
      vf.schema.foreach(s => sb ++= s" :: ${s.simpleString}")
      if (vf.doc.nonEmpty) sb ++= s"  -- ${vf.doc}"
      sb += '\n'
    }
    sb.result()
  }
}

object Catalog {
  val empty: Catalog = Catalog(Map.empty)
  def of(vfs: VirtualFile*): Catalog =
    vfs.foldLeft(empty)((c, vf) =>
      c ++ Catalog(Map(vf.path -> vf)))
}
