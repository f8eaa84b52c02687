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
    val nStarted = new java.util.concurrent.atomic.AtomicInteger
    val nEnded = new java.util.concurrent.atomic.AtomicInteger
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
          nStarted.incrementAndGet(); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd)
            : Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
            println(f"[diag] job ${je.jobId}%3d " +
              f"${(System.nanoTime() - t0) / 1e9}%7.2f s  $site")
          }
          nEnded.incrementAndGet(); ()
        }
      })
    // listener events are async; drain until every delivered job-start
    // has its matching job-end AND the counts hold still briefly (a
    // start event still queued in the bus would otherwise end the
    // drain early). A rep's `.count()` always runs ≥1 Spark job, so
    // the drain additionally refuses to accept stability until at
    // least one start event BEYOND the pre-rep baseline has been
    // delivered — without that, a bus that hasn't delivered the first
    // event yet looks "drained" at 0==0 and the rep's job lines leak
    // into the next block (the failure the fixed sleep was replaced
    // to avoid). Deadline-bounded so a wedged bus can't hang the tool.
    def drainListener(startedBefore: Int): Unit = {
      val deadline = System.nanoTime() + 5000000000L
      var stableSince = -1L
      while (System.nanoTime() < deadline) {
        if (nStarted.get() > startedBefore &&
            nStarted.get() == nEnded.get()) {
          if (stableSince < 0) stableSince = System.nanoTime()
          else if (System.nanoTime() - stableSince > 50000000L) return
        } else stableSince = -1L
        Thread.sleep(5)
      }
      System.err.println("[diag] WARNING: listener drain hit deadline;" +
        " job lines may be attributed to the wrong rep")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep: $name ---")
      val startedBefore = nStarted.get()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      drainListener(startedBefore)
      println(f"[diag] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.cache.Pins.release(spark)
    }
    spark.stop()
  }
}
