package graft.rep

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row, SparkSession}

/** List <-> stream conversions and stream draining — reference
  * `Repetition/Streaming.hs` `listToStreamTask` / `streamToListTask` /
  * `runStreamTask` (REPS:105-127). In Spark the "stream" is a lazy
  * `Dataset`; these are the boundary crossings to/from driver memory.
  */
object Streams {

  /** Driver list -> distributed Dataset (`listToStreamTask`). */
  def listToStream[T: Encoder](spark: SparkSession, xs: Seq[T]): Dataset[T] =
    spark.createDataset(xs)

  /** Dataset -> driver list (`streamToListTask`). Eagerly materializes
    * on the driver — same warning as the reference (REPS:120-123):
    * only for small results; use [[localIterator]] for
    * constant-driver-memory consumption. */
  def streamToList(df: DataFrame): Seq[Row] = df.collect().toSeq

  /** One-partition-at-a-time driver iteration (the constant-memory way
    * to consume a big result on the driver). */
  def localIterator(df: DataFrame): Iterator[Row] = {
    val it = df.toLocalIterator()
    new Iterator[Row] {
      def hasNext: Boolean = it.hasNext
      def next(): Row = it.next()
    }
  }

  /** Drain a stream for its effects, returning the element count
    * (`runStreamTask`). */
  def runStream(df: DataFrame): Long = df.count()

  /** Pair two datasets row-by-row in their current order — the
    * reference's only join-like operator (user-code `zipWith` over two
    * loaded datasets, examples/example2/Example2.hs:59-63). Column
    * sets must be disjoint. Distributed: both sides get a stable
    * index via `zipWithIndex` (one extra count job per side), then an
    * equi-join on it — no single-partition window. One of the few
    * justified RDD touches: ordinal pairing is inherently
    * order-imperative. */
  def zipByIndex(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "zipByIndex: column names must be disjoint")
    def indexed(df: DataFrame): DataFrame = {
      val schema = StructType(
        StructField("_zip_idx", LongType, nullable = false) +: df.schema.fields)
      df.sparkSession.createDataFrame(
        df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(i +: r.toSeq) },
        schema)
    }
    indexed(a).join(indexed(b), "_zip_idx").drop("_zip_idx")
  }
}
