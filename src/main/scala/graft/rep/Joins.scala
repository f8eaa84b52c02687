package graft.rep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for scale: skew salting and bucketed co-location.
  *
  * (Beyond-reference surface: porcupine has no joins at all — SURVEY
  * §2.E "not present" note — but a 100 TB pipeline engine needs the
  * shuffle discipline around them, so they ship as first-class ops.)
  */
object Joins {

  /** Salted equi-join for skewed keys.
    *
    * The fact side gets a deterministic per-row salt in [0, buckets);
    * the dimension side is exploded `buckets` ways; the join key
    * becomes (key, salt), spreading each hot key's rows over `buckets`
    * reducers instead of one straggler. Result is identical to the
    * plain join (every fact row still meets every matching dim row
    * exactly once — the dim copy with its salt).
    *
    * Use when the fact side's key histogram is heavy-tailed and the
    * dim side is small enough to replicate x buckets. AQE's skew-join
    * handles moderate skew automatically; salting is for the extreme
    * keys AQE can't split (single-key partitions).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // salting replicates the DIM side, so only join types where an
    // unmatched dim row contributes nothing are semantics-preserving;
    // a right/full outer would emit `buckets` null-padded copies of
    // every unmatched dim row
    val ok = Set("inner", "left", "leftouter", "left_outer", "cross",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(ok(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched dim " +
        "rows across salt buckets; use the plain join for right/full outer")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Key-skew report — the measurement half of [[saltedJoin]]: before
    * committing a 100 TB join/aggregation to a key, measure its
    * histogram. Top-`topK` keys by row count, each with its corpus
    * `share` and `skew` factor (count ÷ the mean count per key —
    * `skew ≈ 1` is uniform; a key at `skew = 10⁴` is the straggler
    * partition AQE can't split, i.e. the salting trigger). NULL keys
    * report as the literal `<NULL>` group (a giant null-key cluster
    * is the most common real-world skew). One aggregation keyed by
    * the column + a broadcast of the 1-row total — no global sort
    * (top-k via TakeOrdered). Output
    * `(key_value, n, share, skew)`, ties broken on key_value. */
  def skewReport(df: DataFrame, key: String, topK: Int = 10)
      : DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df
      .groupBy(coalesce(col(key).cast("string"), lit("<NULL>"))
        .as("key_value"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("_total"),
      count(lit(1)).as("_nkeys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key_value"), col("n"),
        round(col("n").cast("double") / col("_total").cast("double"), 6)
          .as("share"),
        round(col("n").cast("double") * col("_nkeys").cast("double") /
          col("_total").cast("double"), 6).as("skew"))
      .orderBy(col("n").desc, col("key_value").asc)
      .limit(topK)
  }

  /** As-of join: for every left row, attach the payload of the LATEST
    * right row with the same key and `right.ts <= left.ts` (backward
    * direction; a right row at exactly left.ts matches). Left rows with
    * no eligible right row get null payloads, as do matches further
    * back than `tolerance` (in `ts` units) when one is given.
    *
    * Among right rows sharing the max eligible ts the LAST in
    * (ts, payload-order) wins; pass a right side unique per (key, ts)
    * — pre-aggregate if needed — for fully deterministic output.
    *
    * Implementation is the union-window plan, not a range join: both
    * sides are tagged and unioned, then `last(payload, ignoreNulls)`
    * over (key ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT)
    * carries the newest right payload forward onto each left row.
    *
    * Scale: ONE shuffle on the key (the window sort), linear scan per
    * partition — no range-condition join (Spark would nested-loop it),
    * no per-row right-side probe. Skewed keys sort within one
    * partition; the usual salting answer does not apply (the carry is
    * order-dependent) — split hot keys by coarse time range instead if
    * a single key's history outgrows a partition.
    *
    * Output: every left column, then `<prefix><payloadCol>` for each
    * payload column and `<prefix>ts` (the matched right timestamp).
    *
    * (Beyond-reference, as with everything in this file: the example
    * custom-operator family from the project brief, expressed as a
    * composition Catalyst can already optimize.) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String], tolerance: Option[Long] = None,
               prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "asofJoin: payload columns required")
    val rFields = right.schema.fields.filter(f => payload.contains(f.name))
    require(rFields.length == payload.length,
      s"asofJoin: payload ${payload.diff(rFields.map(_.name))} missing on right")
    val leftCols = left.columns.toSeq
    val lU = left.select(
      leftCols.map(col) ++
        rFields.map(f => lit(null).cast(f.dataType).as(prefix + f.name)) :+
        lit(null).cast(left.schema(ts).dataType).as(prefix + "ts") :+
        lit(1).as("_side"): _*)
    val rU = right.select(
      leftCols.map { c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++
        payload.map(c => col(c).as(prefix + c)) :+
        col(ts).as(prefix + "ts") :+
        lit(0).as("_side"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val carried = (payload.map(prefix + _) :+ (prefix + "ts"))
      .foldLeft(lU.unionByName(rU)) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    val matched = carried.filter(col("_side") === 1).drop("_side")
    tolerance.fold(matched) { tol =>
      val stale = col(prefix + "ts").isNull ||
        col(ts) - col(prefix + "ts") > tol
      (payload.map(prefix + _) :+ (prefix + "ts"))
        .foldLeft(matched) { (df, c) =>
          df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
        }
    }
  }

  /** Range (interval) join: points `p` in `pointCol` against intervals
    * `[loCol, hiCol)` — inclusive low, exclusive high. Returns the
    * inner join of every point row with every interval row containing
    * its value.
    *
    * Implementation: both sides are keyed to `bucketWidth`-sized grid
    * cells — the point to `floor(p/w)`, the interval to EVERY cell its
    * span overlaps (explode) — then equi-joined on the cell and
    * re-filtered with the exact predicate. A point's cell is unique, so
    * no post-join dedup is needed.
    *
    * Scale: turns the range predicate into a shuffle-partitionable
    * equi-join (Spark plans a bare range condition as a broadcast
    * nested-loop — O(|points| x |intervals|)). Interval replication is
    * span/w rows, so pick `bucketWidth` near the typical interval
    * length: smaller w = more replicas, larger w = more false
    * candidates for the residual filter. Degenerate wide intervals
    * (span >> w) are better handled by splitting them out and
    * broadcast-joining that small side. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
                loCol: String, hiCol: String, bucketWidth: Double)
      : DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val cellOf = (c: Column) => floor(c.cast("double") / bucketWidth)
      .cast("long")
    val p = points.withColumn("_cell", cellOf(col(pointCol)))
    // hi is exclusive: a hi exactly on a cell boundary never reaches
    // into that cell. greatest(.., loCell) keeps the sequence ascending
    // for degenerate spans (Spark's sequence(2, 1) counts DOWN).
    val hiCell = cellOf(when(
      col(hiCol) === floor(col(hiCol) / bucketWidth) * bucketWidth,
      col(hiCol) - lit(bucketWidth) / 2).otherwise(col(hiCol)))
    val iv = intervals.withColumn("_cell",
      explode(sequence(cellOf(col(loCol)),
        greatest(hiCell, cellOf(col(loCol))))))
    p.join(iv, Seq("_cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_cell")
  }

  /** Write both sides bucketed on their join keys so subsequent joins
    * are co-located (no Exchange: each bucket pair joins in place).
    * This is the write-time layout investment that pays off across
    * every downstream join/aggregation on the same key — at 100 TB the
    * difference between an hours-long shuffle and none. Tables land in
    * the session catalog (`saveAsTable`), the unit Spark's bucketing
    * metadata hangs off. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").bucketBy(numBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Ordered conversion funnel: per key, the longest prefix of
    * `stages` reached IN TIMESTAMP ORDER — stage i+1 counts only at
    * an instant STRICTLY after stage i's first instant (a same-
    * microsecond tie does not advance, keeping the definition total
    * and replayable). Emits one row per key:
    * `(keyCol, funnel_stage, t_<stage1>, …)` with each stage's
    * first qualifying instant (null once the funnel stalls).
    *
    * Shape: |stages| chained conditional min-aggregates — each is
    * one map-side-combined agg over the event stream plus a
    * broadcast-back join of a |keys|-sized stage table. No per-key
    * sort, no window over the events, no state machine scan — the
    * standard analytics funnel as pure relational algebra. */
  def funnel(events: DataFrame, stages: Seq[String],
             keyCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "tsu"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val names = stages.map(s => s"t_$s")
    val universe = events.select(col(keyCol)).distinct()
    val acc = stages.zip(names).zipWithIndex
      .foldLeft(universe) { case (prev, ((st, nm), i)) =>
        val cond =
          if (i == 0) col(typeCol) === st
          else col(typeCol) === st &&
            col(names(i - 1)).isNotNull && col(tsCol) > col(names(i - 1))
        val base =
          if (i == 0) events
          else events.join(broadcast(prev), Seq(keyCol))
        prev.join(
          base.filter(cond).groupBy(col(keyCol))
            .agg(min(col(tsCol)).as(nm)),
          Seq(keyCol), "left")
      }
    acc.select(col(keyCol) +:
      names.map(n => col(n).isNotNull.cast("int"))
        .reduce(_ + _).cast("long").as("funnel_stage") +:
      names.map(col): _*)
  }
}
