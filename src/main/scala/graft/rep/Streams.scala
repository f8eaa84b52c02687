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
}
