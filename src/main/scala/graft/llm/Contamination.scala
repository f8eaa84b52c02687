package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find corpus documents sharing word
  * n-grams with an evaluation/benchmark set, so they can be dropped
  * before training.
  *
  * Scale design: shingles are hashed to 60-bit fingerprints scan-side
  * by the native codegen'd [[graft.functions.SketchExprs.ShingleHashes]]
  * kernel (one tokenize+hash pass — the interpreted
  * transform/md5 HOF chain it replaces was ~15x slower), and only
  * `(doc_id, hash)` rides the join. The benchmark side is
  * distinct-collapsed and small by definition (benchmarks are MBs
  * against a 100 TB corpus) — AQE broadcasts it, so the corpus is
  * never shuffled: the plan is scan -> explode ->
  * broadcast-semi-join -> per-doc count.
  */
object Contamination {

  /** 60-bit hashes of the distinct word n-gram shingles of a text
    * column — the fingerprint hash per shingle (family-aware: XXH64 in
    * production, `CAST(('0x' || substring(md5(g),1,15)) AS BIGINT)`
    * under the md5 oracle-verification family). */
  def shingleHashes(text: Column, n: Int): Column =
    graft.functions.SketchExprs.shingleHashes(text, n)

  /** Documents from `docs` sharing at least one n-gram with any
    * `benchmark` document, with the count of distinct shared shingle
    * hashes (the contamination evidence). */
  def contaminatedDocs(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                       textCol: String = "text", idCol: String = "doc_id")
      : DataFrame = {
    val dSh = docs.select(col(idCol),
      explode(shingleHashes(col(textCol), n)).as("h"))
    val bSh = benchmark
      .select(explode(shingleHashes(col(textCol), n)).as("h"))
      .distinct()
    dSh.join(bSh, Seq("h"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("h")).as("n_shared"))
  }

  /** Decontaminate: drop contaminated documents from the corpus. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    textCol: String = "text", idCol: String = "doc_id")
      : DataFrame =
    docs.join(contaminatedDocs(docs, benchmark, n, textCol, idCol)
      .select(col(idCol)), Seq(idCol), "left_anti")
}
