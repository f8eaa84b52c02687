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

  /** Reliability (calibration) report for a probabilistic gate — the
    * ECE diagram as a relation: rows with a predicted probability
    * `probCol ∈ [0,1]` and a boolean outcome `labelCol` are bucketed
    * into `bins` equal-width confidence bins
    * (`bin = min(floor(p·bins), bins−1)`), and each bin reports
    * `(bin, n, conf, acc, gap)` — mean predicted confidence, the
    * empirical rate, and `|conf − acc|`. A classifier-based data
    * filter (quality NB, langid gate) is only as good as its
    * calibration: a 0.9-confidence bin that is right 60% of the time
    * means the threshold is lying about how much data it drops.
    * `ECE = Σ (n_b/N)·gap_b` folds from the rows. Rows with NULL
    * prob/label are excluded (unjudged). Confidence sums go through
    * the decimal cast (order-free) and everything rounds to 6 — the
    * replay convention.
    *
    * Scale: one scan, map-side combined into ≤ `bins` groups —
    * corpus-size-independent state, same shape as [[profile]]. */
  def calibrationReport(df: DataFrame, probCol: String,
                        labelCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val confU = sum(col("_p").cast("decimal(38,18)")).cast("double") /
      count(lit(1)).cast("double")
    df.select(col(probCol).cast("double").as("_p"),
        col(labelCol).cast("boolean").as("_y"))
      .filter(col("_p").isNotNull && col("_y").isNotNull)
      .withColumn("bin",
        least(floor(col("_p") * bins), lit((bins - 1).toLong))
          .cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(confU, 6).as("conf"),
        round(sum(when(col("_y"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("acc"),
        round(abs(confU -
          sum(when(col("_y"), 1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double")), 6).as("gap"))
  }

  /** Pairwise Pearson correlations over numeric columns, profiled
    * in ONE pass: every Σx, Σx², Σxy accumulates as an EXACT decimal
    * (map-side combined, order-free), and the correlation assembles
    * row-locally from the final sums —
    * `(n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ᵗ)·(n·Σy² − Σy²ᵗ))` — so
    * the value is a deterministic function of the exact integers
    * and replays bit-for-bit (the built-in `corr` streams running
    * doubles whose rounding depends on partitioning). Inputs cast to
    * DECIMAL(18,6) so products stay WITHIN decimal-128 (a wider cast
    * would hit Spark's precision-loss rounding on the multiply and
    * silently break exactness) — domain |x| < 10^12 at 6 fractional
    * digits, the analytics-column regime. Rows with a NULL in ANY
    * profiled column are dropped first (complete-case Pearson — the
    * count and the sums must describe the same population). Output
    * `(col_a, col_b, corr)` per unordered pair, NULL when a column
    * is constant. One aggregate row feeds every pair through an
    * explode — the scan runs once however many pairs; aliases are
    * positional, so column NAMES never collide. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val idx = cols.indices
    val pairs = for { i <- idx; j <- (i + 1) until cols.size }
      yield (i, j)
    def dec(i: Int) = col(cols(i)).cast("decimal(18,6)")
    val aggs =
      idx.flatMap(i => Seq(
        sum(dec(i)).as(s"_s_$i"),
        sum((dec(i) * dec(i)).cast("decimal(38,12)")).as(s"_q_$i"))) ++
      pairs.map { case (i, j) =>
        sum((dec(i) * dec(j)).cast("decimal(38,12)"))
          .as(s"_p_${i}_$j") } :+
      count(lit(1)).as("_n")
    val one = df.na.drop("any", cols).agg(aggs.head, aggs.tail: _*)
    def corrExpr(i: Int, j: Int) = {
      val n = col("_n").cast("double")
      val sx = col(s"_s_$i").cast("double")
      val sy = col(s"_s_$j").cast("double")
      val sxx = col(s"_q_$i").cast("double")
      val syy = col(s"_q_$j").cast("double")
      val sxy = col(s"_p_${i}_$j").cast("double")
      round((n * sxy - sx * sy) /
        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
    }
    one.select(explode(array(pairs.map { case (i, j) =>
        struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
          corrExpr(i, j).as("corr"))
      }: _*)).as("_r"))
      .select(col("_r.col_a"), col("_r.col_b"), col("_r.corr"))
  }

  /** Physical-layout report: per-FILE row counts for whatever scan
    * backs `df` (`input_file_name` grouped by basename) — the
    * small-files / straggler-file diagnostic that drives compaction
    * and `maxPartitionBytes` tuning at 100 TB (ten thousand 1 MB
    * files cost more in scheduling than one 10 GB file does in
    * reading). One scan, one aggregation keyed by file. Output
    * `(file_name, n_rows)`. */
  def layoutReport(df: DataFrame): DataFrame =
    df.groupBy(regexp_extract(input_file_name(), "([^/]+)$", 1)
        .as("file_name"))
      .agg(count(lit(1)).as("n_rows"))

  /** k-anonymity / l-diversity audit over quasi-identifier columns —
    * the release-gate report for tabular data: each equivalence
    * class (one row per distinct quasi-identifier combination)
    * reports its size `n`, the number of distinct sensitive values
    * `n_sensitive`, and the two verdicts — `k_ok` (`n ≥ k`: an
    * attacker knowing the quasi-identifiers cannot narrow below k
    * candidates) and `l_ok` (`n_sensitive ≥ l`: the class does not
    * give the sensitive value away even when identified). Classes
    * failing either gate are the ones to suppress or generalize
    * before release.
    *
    * Scale: one map-side-combined aggregate keyed by the
    * quasi-identifiers. `n_sensitive` is an exact per-class distinct
    * (the audit path); at corpus scale swap
    * `approx_count_distinct` + a within-band verdict exactly as
    * [[profile]] documents for its ndv column. */
  def privacyAudit(df: DataFrame, quasiCols: Seq[String],
                   sensitiveCol: String, k: Long = 5, l: Long = 2)
      : DataFrame = {
    require(quasiCols.nonEmpty, "privacyAudit needs quasi-identifiers")
    require(k >= 1 && l >= 1, s"bad thresholds k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(col("n"), col("n_sensitive"),
        (col("n") >= k).as("k_ok"),
        (col("n_sensitive") >= l).as("l_ok")): _*)
  }

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
