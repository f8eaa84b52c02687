package graft.config

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.ConsoleAppender
import org.apache.logging.log4j.core.config.Configurator
import org.apache.logging.log4j.core.layout.PatternLayout

/** Logger severity + format control — the reference's Logger.hs
  * surface (formats pretty/compact/json/bracket + severity/verbosity
  * CLI, Logger.hs:30-74, CLI.hs:240-302) on log4j2.
  *
  * CLI: `--log-level warn` / `--log-format json` on any pipeline
  * command (parsed in [[CLI.run]]).
  */
object Logging {

  /** Root severity: trace|debug|info|notice(->info)|warn|error. */
  def setLevel(level: String): Unit =
    Configurator.setRootLevel(Level.toLevel(
      level.replace("notice", "info"), Level.INFO))

  val formats: Map[String, String] = Map(
    "pretty" -> "%d{yy/MM/dd HH:mm:ss} %highlight{%p} %c{1}: %m%n",
    "compact" -> "%p %c{1}: %m%n",
    "bracket" -> "[%d{HH:mm:ss}][%p][%c{1}] %m%n",
    "json" ->
      """{"ts":"%d{ISO8601}","level":"%p","logger":"%c","msg":"%enc{%m}{JSON}"}%n""")

  /** Swap the root console appender's layout; returns the new
    * appender's name. */
  def setFormat(format: String): String = {
    val pattern = formats.getOrElse(format,
      throw new IllegalArgumentException(
        s"unknown log format: $format (${formats.keys.mkString("|")})"))
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val config = ctx.getConfiguration
    val layout = PatternLayout.newBuilder()
      .withPattern(pattern).withConfiguration(config).build()
    val console = ConsoleAppender.createDefaultAppenderForLayout(layout)
    console.start()
    val root = config.getRootLogger
    root.getAppenders.keySet.toArray.foreach(n =>
      root.removeAppender(n.toString))
    root.addAppender(console, null, null)
    ctx.updateLoggers()
    console.getName
  }

  /** Extract (and strip) logging flags from a CLI arg list; applies
    * them as a side effect. Returns the remaining args. */
  def applyFlags(args: Seq[String]): Seq[String] = {
    var rest = Vector.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--log-level" if i + 1 < args.length =>
          setLevel(args(i + 1)); i += 2
        case "--log-format" if i + 1 < args.length =>
          setFormat(args(i + 1)); i += 2
        case "-q" | "--quiet" => setLevel("error"); i += 1
        case "-v" | "--verbose" => setLevel("debug"); i += 1
        case a => rest :+= a; i += 1
      }
    }
    rest
  }
}
