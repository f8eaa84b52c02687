package graft.tools

/** Per-Spark-job profiler for any registered query: runs
  * `SparkEntry.queries(name)` with a listener that prints every
  * job's wall time and call site, so a multi-job serve's cost can be
  * attributed to its phases (routing aggregate, persist, slice
  * window, fallback scan, ...) instead of guessed from the total.
  * Not part of the library surface; run by hand:
  * `graft.tools.QueryJobsDiag <queryName> [sfDir] [reps]`.
  */
object QueryJobsDiag {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("llm_bm25_pruned")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.Graft.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      "query-jobs-diag")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.functions.SketchOps.FamilyKey, "xx")
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart)
            : Unit = {
          // the result stage's name carries the action call site
          // (e.g. "parquet at TextAnalysis.scala:331"); stage count
          // shows the job's shuffle depth
          val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
          starts.put(js.jobId,
            (System.nanoTime(), s"${js.stageInfos.size} stages  $site"))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd)
            : Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
            println(f"[diag] job ${je.jobId}%3d " +
              f"${(System.nanoTime() - t0) / 1e9}%7.2f s  $site")
          }
        }
      })
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep: $name ---")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      // listener events are async; a short drain keeps job lines
      // inside their rep block (listenerBus is spark-private)
      Thread.sleep(300)
      println(f"[diag] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.cache.Pins.release(spark)
    }
    spark.stop()
  }
}
