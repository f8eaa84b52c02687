package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling ("ANALYZE" as an operator): per-column row counts
  * and cardinalities in ONE pass over the table — the statistics a
  * catalog keeps to drive join ordering, broadcast decisions and
  * partition sizing.
  *
  * Two cardinality paths:
  *  - `approx_count_distinct` (HyperLogLog++): the 100 TB path — one
  *    scan, fixed sketch state per column, mergeable across
  *    partitions;
  *  - exact `count(DISTINCT c)`: the audit path, used here to grade
  *    the sketch (`ndv_ok` = approx within `band` of exact). Exact
  *    multi-column distinct counting runs via Catalyst's Expand (one
  *    replicated pass per column), so production profiling at scale
  *    keeps the approx column only.
  */
object Profile {

  /** Profile `cols` of `df`: one output row per column —
    * `(col_name, n_nonnull, ndv, ndv_ok)`, where `ndv` is exact and
    * `ndv_ok` verifies the HLL estimate (relative std dev `rsd`)
    * lands within `band` of it. Deterministic: HLL on fixed data is
    * deterministic, so the verdict is stable run-to-run. */
  def profile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05,
              band: Double = 0.1): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"_n_$c"),
      countDistinct(col(c)).as(s"_d_$c"),
      approx_count_distinct(col(c), rsd).as(s"_a_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"_n_$c").as("n_nonnull"),
      col(s"_d_$c").as("ndv"),
      (abs(col(s"_a_$c").cast("double") - col(s"_d_$c").cast("double"))
        <= lit(band) * col(s"_d_$c").cast("double")).as("ndv_ok")))
    one.select(explode(array(entries: _*)).as("_e"))
      .select(col("_e.col_name").as("col_name"),
        col("_e.n_nonnull").as("n_nonnull"),
        col("_e.ndv").as("ndv"), col("_e.ndv_ok").as("ndv_ok"))
  }
}
