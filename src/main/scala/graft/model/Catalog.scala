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
    * (reference CLI.hs:393-427) with the default [[ShowOpts]]. */
  def describe: String = describe(ShowOpts(), _ => None)

  /** Flag-driven render — the reference's `PhysicalFileNodeShowOpts`
    * display (PorcupineTree.hs:206-240): the entry's header line, then
    * one indented section per enabled facet, in the reference's order
    * (mappings, serials, types, extensions, accesses, fields). */
  def describe(opts: ShowOpts, layersOf: VPath => Option[Seq[String]])
      : String = {
    val sb = new StringBuilder
    paths.foreach { p =>
      val vf = entries(p)
      val mode = vf.usage match {
        case Usage.Source => "r"
        case Usage.Sink   => "w"
        case Usage.Bidir  => "rw"
      }
      val sections = Seq.newBuilder[String]
      if (opts.mappings)
        sections += (layersOf(p) match {
          case Some(ls) if ls.nonEmpty => ls.mkString("mapped to: ", "\n   + ", "")
          case _                       => "<no mapping>"
        })
      if (opts.serials)
        sections += (vf.usage match {
          case Usage.Source => "usable as: source"
          case Usage.Sink   => "usable as: sink"
          case Usage.Bidir  => "usable as: source, sink"
        })
      if (opts.types)
        vf.schema.foreach { s =>
          val full = s.simpleString
          sections += "type: " + (if (full.length <= opts.typeNumChars) full
            else full.take(opts.typeNumChars) + "…")
        }
      if (opts.extensions)
        sections += s"extensions: ${vf.formats.mkString(", ")}"
      if (opts.accesses) {
        val verbs = vf.usage match {
          case Usage.Source => Seq("read")
          case Usage.Sink   => Seq("write")
          case Usage.Bidir  => Seq("read", "write")
        }
        sections += s"accessed with: ${verbs.mkString(", ")} " +
          s"(${vf.defaultExt})"
      }
      if (opts.fields && vf.doc.nonEmpty)
        sections += s"-- ${vf.doc}"
      sb ++= (s"$p [$mode]" +: sections.result()).mkString("\n  ")
      sb += '\n'
    }
    sb.result()
  }
}

/** `show-tree` display flags — reference `PhysicalFileNodeShowOpts`
  * (PorcupineTree.hs:206-213) with the CLI defaults of CLI.hs:393-427:
  * `-m/--mappings` and `-t/--types` and `-a/--accesses` opt IN;
  * `-S/--no-serials`, `-E/--no-extensions`, `-F/--no-fields` opt OUT;
  * `-c/--num-chars N` bounds the rendered type width (default 60). */
final case class ShowOpts(
    mappings: Boolean = false,
    serials: Boolean = true,
    fields: Boolean = true,
    types: Boolean = false,
    accesses: Boolean = false,
    extensions: Boolean = true,
    typeNumChars: Int = 60)

object ShowOpts {
  /** Split `args` into show flags and the rest (unknown args pass
    * through to option parsing, as the reference's optparse does). */
  def parse(args: Seq[String]): (ShowOpts, Seq[String]) = {
    var o = ShowOpts()
    val rest = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-m" | "--mappings"      => o = o.copy(mappings = true)
        case "-S" | "--no-serials"    => o = o.copy(serials = false)
        case "-F" | "--no-fields"     => o = o.copy(fields = false)
        case "-t" | "--types"         => o = o.copy(types = true)
        case "-a" | "--accesses"      => o = o.copy(accesses = true)
        case "-E" | "--no-extensions" => o = o.copy(extensions = false)
        case "-c" | "--num-chars" if i + 1 < args.length =>
          i += 1
          o = o.copy(typeNumChars = args(i).toInt)
        case other => rest += other
      }
      i += 1
    }
    (o, rest.result())
  }
}

object Catalog {
  val empty: Catalog = Catalog(Map.empty)
  def of(vfs: VirtualFile*): Catalog =
    vfs.foldLeft(empty)((c, vf) =>
      c ++ Catalog(Map(vf.path -> vf)))
}
