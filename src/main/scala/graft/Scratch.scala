package graft

/** Scratch-directory root for standing layers, bench fixtures, and
  * spec temp dirs — one resolution point instead of absolute paths
  * baked into library code. Defaults to `target/scratch` under the
  * process working directory (the repo root for sbt, Verify and
  * Bench runs); override with `-Dgraft.scratch.dir=/abs/path` when
  * running from another checkout location.
  */
object Scratch {
  val root: String =
    sys.props.get("graft.scratch.dir")
      .map(p => new java.io.File(p).getAbsolutePath)
      .getOrElse(
        new java.io.File("target/scratch").getAbsolutePath)
}
