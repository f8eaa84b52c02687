package graft.fold

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** The fold/aggregation algebra — Spark-native `FoldA`
  * (reference Control/Arrow/FoldA.hs:87-189, Repetition/Foldl.hs).
  *
  * Design: a fold is a bundle of Catalyst aggregate `Column`s plus a
  * driver-side `finish`. The Applicative product (`zip`/`map2`) simply
  * concatenates the column bundles, so N composed folds still run as
  * ONE `df.agg(...)` pass — exactly the reference's "several folds in
  * one traversal" (FoldA.hs:118-130) — and stay inside whole-stage
  * codegen (a typed `Aggregator` product would not).
  *
  * `premap`/`prefilter`/`postmap` (FoldA.hs:132-168) rewrite the input
  * expression / wrap it in `when(cond, …)` (aggregates skip nulls) /
  * compose on `finish` — all still one pass, no extra shuffle.
  */
final case class FoldCol[B](cols: Seq[Column], finish: Seq[Any] => B) {

  /** Applicative product — one-pass multi-aggregate. */
  def zip[C](other: FoldCol[C]): FoldCol[(B, C)] =
    FoldCol(cols ++ other.cols, vals =>
      (finish(vals.take(cols.size)), other.finish(vals.drop(cols.size))))

  def map2[C, D](other: FoldCol[C])(f: (B, C) => D): FoldCol[D] = {
    val z = zip(other); FoldCol(z.cols, vals => { val (b, c) = z.finish(vals); f(b, c) })
  }

  /** postmap (FoldA.hs:153-156). */
  def map[C](f: B => C): FoldCol[C] = FoldCol(cols, finish.andThen(f))

  /** Run over a DataFrame: one aggregation job. */
  def run(df: DataFrame): B = {
    val row: Row = df.agg(cols.head, cols.tail: _*).head()
    finish(row.toSeq)
  }

  /** Run grouped: returns the grouped DataFrame (stays distributed). */
  def runGrouped(df: DataFrame, keys: Column*): DataFrame =
    df.groupBy(keys: _*).agg(cols.head, cols.tail: _*)
}

object FoldCol {
  private def single[B](c: Column)(cast: Any => B): FoldCol[B] =
    FoldCol(Seq(c), vals => cast(vals.head))

  /** premap (FoldA.hs:146-149 `lmap`): transform the input column. */
  def premap[B](f: Column => Column, fold: Column => FoldCol[B])
      (in: Column): FoldCol[B] = fold(f(in))

  /** prefilter (FoldA.hs:159-168): aggregate only rows matching `cond`
    * — `when(cond, x)` because Catalyst aggregates ignore nulls; for
    * `count` use `countIf`. Still one pass. */
  def prefiltered(cond: Column, in: Column): Column = when(cond, in)

  // --- the stock folds used across the reference examples
  //     (L.length / L.nub / L.list etc., ExampleRadon.hs:76-79) ---
  def count: FoldCol[Long] = single(org.apache.spark.sql.functions.count(lit(1)))(_.asInstanceOf[Long])
  def countIf(cond: Column): FoldCol[Long] =
    single(org.apache.spark.sql.functions.count(when(cond, 1)))(_.asInstanceOf[Long])
  def sumD(c: Column): FoldCol[Double] =
    single(sum(c).cast("double"))(v => Option(v).fold(0.0)(_.asInstanceOf[Double]))
  def sumL(c: Column): FoldCol[Long] =
    single(sum(c).cast("long"))(v => Option(v).fold(0L)(_.asInstanceOf[Long]))
  def avgD(c: Column): FoldCol[Double] =
    // avg over zero rows is SQL NULL: surface it as NaN (undefined
    // mean), not the silent 0.0 a null unboxing would produce
    single(avg(c))(v => Option(v).fold(Double.NaN)(_.asInstanceOf[Double]))
  def minOf[B](c: Column): FoldCol[B] = single(min(c))(_.asInstanceOf[B])
  def maxOf[B](c: Column): FoldCol[B] = single(max(c))(_.asInstanceOf[B])
  /** distinct-collect (reference `L.nub` — exact, small domains).
    * Row-level arrays come back as mutable.ArraySeq — `.toSeq` them
    * into the immutable Seq the signature promises (a bare cast
    * ClassCastExceptions under Scala 2.13). */
  def collectSet(c: Column): FoldCol[Seq[Any]] =
    single(collect_set(c))(_.asInstanceOf[scala.collection.Seq[Any]].toSeq)
  def collectList(c: Column): FoldCol[Seq[Any]] =
    single(collect_list(c))(_.asInstanceOf[scala.collection.Seq[Any]].toSeq)
  /** distinct count — exact. */
  def countDistinctOf(c: Column): FoldCol[Long] =
    single(count_distinct(c))(_.asInstanceOf[Long])
  /** population stddev — the second moment the radon example's noise
    * params match (ExampleRadon.hs:85-96 ModelParams). */
  def stddevPopD(c: Column): FoldCol[Double] =
    single(stddev_pop(c))(v => Option(v).fold(Double.NaN)(_.asInstanceOf[Double]))
  /** distinct count — approx (HLL): the 100TB-scale variant; exact
    * distinct over a high-cardinality key is a full shuffle, HLL is a
    * map-side sketch merge. */
  def approxCountDistinct(c: Column, rsd: Double = 0.01): FoldCol[Long] =
    single(approx_count_distinct(c, rsd))(_.asInstanceOf[Long])

  /** Effectful driver-side fold — the reference's `generalizeM`
    * (Repetition/Foldl.hs:46-69): a fold whose step performs effects
    * can't be a Catalyst aggregate; stream rows to the driver with
    * `toLocalIterator` (one partition in memory at a time) and fold
    * there. The explicit semantic boundary: this de-parallelizes —
    * use only for genuinely effectful accumulators. */
  def foldLocally[B](df: org.apache.spark.sql.DataFrame)(z: B)(
      step: (B, org.apache.spark.sql.Row) => B): B = {
    val it = df.toLocalIterator()
    var acc = z
    while (it.hasNext) acc = step(acc, it.next())
    acc
  }

  /** Build from a custom typed Aggregator (the reference's `arrowFold`
    * FoldA.hs:172-189 escape hatch for arbitrary step functions):
    * registered as a UDAF column over `in`. */
  def fromAggregator[IN, BUF, OUT](
      agg: org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT],
      in: Column)(implicit enc: org.apache.spark.sql.Encoder[IN])
      : FoldCol[OUT] =
    single(org.apache.spark.sql.functions.udaf(agg, enc).apply(in))(
      _.asInstanceOf[OUT])
}
