package graft.tools

/** Dump `.explain("formatted")` for named registered queries into
  * files — the plan evidence the optimization rounds commit under
  * `plans/<round>/<query>_<tag>.txt`. Planning only (no action is
  * executed), but note some query constructors run side-effect jobs
  * (standing-layer builds, inline batch writes) at construction
  * time; those run here exactly as in the bench. Not part of the
  * library surface; run by hand:
  *   graft.tools.PlanDump <outDir> <tag> <q1,q2,...> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r20")
    val tag = args.lift(1).getOrElse("before")
    val names = args.lift(2).map(_.split(',').map(_.trim).toSeq)
      .getOrElse(Seq("llm_takedown_bm25"))
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "plan-dump")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.functions.SketchOps.FamilyKey, "xx")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      SparkEntryLookup(n) match {
        case None => System.err.println(s"[plandump] unknown query: $n")
        case Some(fn) =>
          val df = fn(spark, dir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val p = java.nio.file.Paths.get(outDir, s"${n}_$tag.txt")
          java.nio.file.Files.write(p,
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote $p (${plan.length} chars)")
          graft.cache.Pins.release(spark)
      }
    }
    spark.stop()
  }

  private object SparkEntryLookup {
    def apply(n: String): Option[(org.apache.spark.sql.SparkSession,
        String) => org.apache.spark.sql.DataFrame] =
      graft.SparkEntry.queries.get(n)
  }
}
