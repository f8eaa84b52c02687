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
}
