package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Phase profiler for `llm_reweight_sample` (the r18 verdict's one
  * unattributed drift): mirrors the query's chain —
  * [[graft.llm.TextAnalysis.knLmScore]] (train-side model tables,
  * corpus scoring join) → [[graft.llm.TextAnalysis.domainReweight]]
  * rollup collect → [[graft.llm.Sampling.mixtureSample]] — with each
  * stage materialized and timed SEQUENTIALLY, so the cost splits into
  * train-model / corpus-score / reweight / sample instead of one
  * opaque total. Model-table stages are rebuilt fresh per rep (pins
  * released between reps, like the bench). Not library surface; run
  * by hand: `graft.tools.ReweightDiag [sfDir] [reps]`. */
object ReweightDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Graft.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "reweight-diag")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.functions.SketchOps.FamilyKey, "xx")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val tTot0 = System.nanoTime()
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val train = d.filter(col("doc_id") % 10 =!= 0)
      // knLmScore mirror, stage by stage (TextAnalysis.scala:1066)
      def biInst(df: org.apache.spark.sql.DataFrame, cols: Column*) = {
        val tk = df.withColumn("_tk",
          graft.llm.TextAnalysis.tokens(col("text")))
          .filter(size(col("_tk")) >= 2)
        val n1 = size(col("_tk")) - 1
        tk.select(cols :+ explode(arrays_zip(
            slice(col("_tk"), lit(1), n1).as("w1"),
            slice(col("_tk"), lit(2), n1).as("w2"))).as("z"): _*)
          .select(cols :+ col("z.w1").as("w1") :+ col("z.w2").as("w2"): _*)
      }
      val cb = biInst(train).groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("_cb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("cb (train bigram types)")(cb.count())
      val hist = cb.groupBy(col("w1"))
        .agg(sum(col("_cb")).as("_c1"), count(lit(1)).as("_n1f"))
      t("hist (history totals)")(hist.count())
      val n1b = cb.groupBy(col("w2")).agg(count(lit(1)).as("_n1b"))
      t("n1b (continuations)")(n1b.count())
      val nbb = cb.agg(count(lit(1)).as("_nbb"))
      t("nbb (bigram-type count)")(nbb.count())
      // persisted so the scored join below does not re-pay the full
      // train tokenize inside its broadcast build — each phase line
      // then carries its OWN cost exactly once
      val vDf = train.select(explode(
          graft.llm.TextAnalysis.tokens(col("text"))).as("w"))
        .agg((countDistinct(col("w")) + lit(1L)).as("_v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("vDf (train vocab pass)")(vDf.count())
      val discount = 0.75
      val pc = (coalesce(col("_n1b"), lit(0L)).cast("double") + lit(1.0)) /
        (col("_nbb").cast("double") + col("_v").cast("double"))
      val lp = when(col("_c1").isNull, log(pc))
        .otherwise(log(
          greatest(coalesce(col("_cb"), lit(0L)).cast("double")
              - lit(discount), lit(0.0)) / col("_c1").cast("double") +
            lit(discount) * col("_n1f").cast("double") /
              col("_c1").cast("double") * pc))
      val scored = biInst(d, col("doc_id"))
        .join(cb, Seq("w1", "w2"), "left")
        .join(hist, Seq("w1"), "left")
        .join(n1b, Seq("w2"), "left")
        .crossJoin(broadcast(nbb))
        .crossJoin(broadcast(vDf))
        .select(col("doc_id"), lp.as("_lp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("_lp").cast("decimal(38,18)")).cast("double") /
            count(lit(1)), 6).as("avg_logprob"))
        .withColumn("ppl", round(exp(-col("avg_logprob")), 6))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("scored (corpus KN join)")(scored.count())
      val w = t("domainReweight collect")(
        graft.llm.TextAnalysis.domainReweight(d, scored)
          .select(col("source"), col("weight")).collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap)
      t("mixtureSample")(
        graft.llm.Sampling.mixtureSample(d, w)
          .orderBy(col("doc_id")).count())
      Seq(cb, vDf, scored).foreach(_.unpersist(blocking = false))
      println(f"[diag] MIRROR TOTAL ${(System.nanoTime() - tTot0) / 1e9}%.2f s")
      // the registered query, unsplit, for the overhead delta
      val tQ0 = System.nanoTime()
      graft.SparkEntry.queries("llm_reweight_sample")(spark, dir).count()
      println(f"[diag] QUERY TOTAL  ${(System.nanoTime() - tQ0) / 1e9}%.2f s")
      graft.cache.Pins.release(spark)
    }
    spark.stop()
  }
}
