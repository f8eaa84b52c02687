package graft

/** CLI entry point: `graft.Main <pipeline> <run|show-tree|...>` —
  * see [[graft.config.CLI]]. */
object Main {
  def main(args: Array[String]): Unit = config.CLI.main(args)
}
