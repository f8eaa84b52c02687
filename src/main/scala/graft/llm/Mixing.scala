package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixture operators: assemble a training mix from a corpus under
  * per-stratum (language/domain/source) token budgets and quality
  * ranks.
  *
  * Determinism: documents are ordered inside each stratum by CONTENT
  * hash (then id), so the selected mix is a pure function of the
  * corpus + budgets — reproducible across runs and re-partitioning,
  * and unbiased w.r.t. ingestion order (hash order is an implicit
  * shuffle).
  *
  * Scale: one window per stratum = a shuffle keyed by the stratum
  * column; strata are few (languages/domains), so each partition's
  * running sum is a single sequential pass. For corpora where one
  * stratum exceeds an executor's partition (billions of docs in one
  * language), pre-aggregate per hash bucket (bucket -> token count),
  * pick the budget-filling bucket prefix on the driver, and filter by
  * bucket — same result shape, no giant window.
  */
object Mixing {

  /** Per-document token count from the one-pass text_stats kernel. */
  private def tokenCount(textCol: String): Column =
    TextAnalysis.textStats(col(textCol)).getField("n_tokens")

  /** Keep documents per stratum, in content-hash order, until the
    * stratum's token budget is reached (inclusive prefix: a document
    * is kept iff the running total THROUGH it fits the budget).
    * Strata absent from `budgets` are dropped. */
  def tokenBudgetSample(docs: DataFrame, budgets: Map[String, Long],
                        strataCol: String = "lang",
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Sampling.hashBucket32(col(textCol)).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_tok", tokenCount(textCol))
      .withColumn("_cum", sum(col("_tok")).over(w))
      .filter(col("_cum") <= element_at(typedLit(budgets), col(strataCol)))
      .drop("_tok", "_cum")
  }

  /** Top-k documents per stratum by a quality key (default: token
    * count, ties to lowest id) — stratified best-of selection. */
  def bestPerStratum(docs: DataFrame, k: Int,
                     strataCol: String = "lang", textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(tokenCount(textCol).desc, col(idCol).asc)
    docs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
