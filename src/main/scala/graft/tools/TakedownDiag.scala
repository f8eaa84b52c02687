package graft.tools

import org.apache.spark.sql.functions._

/** One-off phase profiler for the `llm_takedown_bm25` bench row (the
  * suite's slowest min): replays the query's full
  * delete → build(batch 0) → build(batch 1) → takedown → serve cycle
  * with per-phase wall times, so elevated readings can be attributed
  * to a phase (layer build IO, takedown rewrite, or the serve scan)
  * instead of guessed. Not part of the library surface; run by hand:
  * `graft.tools.TakedownDiag [sfDir] [reps]`.
  */
object TakedownDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Graft.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "takedown-diag")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.functions.SketchOps.FamilyKey, "xx")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[diag] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val corpus = docs.filter(col("doc_id") % 100 =!= 0)
      val idxDir = graft.Scratch.root + "/takedown_diag"
      t("delete")(org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(idxDir)))
      t("batch0")(graft.llm.TextAnalysis.bm25PostingsBatch(
        corpus.filter(col("doc_id") % 2 === 0), idxDir, batchId = 0L))
      t("batch1")(graft.llm.TextAnalysis.bm25PostingsBatch(
        corpus.filter(col("doc_id") % 2 =!= 0), idxDir, batchId = 1L))
      t("takedown")(graft.llm.Takedown.bm25Takedown(spark, idxDir,
        corpus.filter(col("doc_id") % 15 === 7).select("doc_id")))
      t("serve")(graft.llm.TextAnalysis.bm25TopKFromPostings(spark,
          idxDir,
          docs.filter(col("doc_id") % 100 === 0)
            .select(col("doc_id").as("query_id"),
              array_join(slice(graft.llm.TextAnalysis.tokens(
                col("text")), 1, 8), " ").as("text")),
          k = 5)
        .orderBy(col("query_id"), col("rank")).count())
      graft.cache.Pins.release(spark)
    }
    spark.stop()
  }
}
