package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * the whole similarity pipeline stays inside whole-stage codegen and
  * scales out as a narrow projection.
  *
  * All arithmetic is promoted to double *before* summation and folds run
  * sequentially left-to-right, which keeps results bit-identical to a
  * sequential reference implementation (this is what makes the DuckDB
  * oracle comparisons exact rather than merely "close").
  */
object VectorOps {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe only insofar as inputs are non-null. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
