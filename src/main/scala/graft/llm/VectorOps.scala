package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column math, built from codegen'd higher-order
  * functions (`zip_with`/`aggregate`) — no UDFs, so the hot path stays
  * inside whole-stage codegen and columnar parquet reads.
  *
  * All arithmetic is promoted to double BEFORE multiply/accumulate:
  * float math would lose the determinism the correctness oracle needs
  * (and real pipelines want the extra precision for thresholds anyway).
  * Summation is left-to-right (`aggregate` semantics), which matches
  * DuckDB's `list_sum` order, keeping results bit-identical.
  */
object VectorOps {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm (double). */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Euclidean distance (double). */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x))
}
