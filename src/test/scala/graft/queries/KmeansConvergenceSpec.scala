package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q66's k-means actually TRAINS: the Lloyd loop must run multiple
  * iterations before assignments stabilize, and the convergence count must
  * stay within the oracle's static unroll budget (the fixed-point
  * equivalence between the converged loop and the unrolled DuckDB oracle
  * only holds when unroll ≥ convergence count).
  */
class KmeansConvergenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Lloyd loop converges on the CORRECTNESS fixture in ≥2, ≤unroll iterations") {
    val (df, iters) = SimilarityQueries.ivfKmeans(spark, "/root/testdata/sf0.01")
    info(s"Lloyd loop converged in $iters iterations " +
      s"(unroll budget ${SimilarityQueries.KmeansOracleUnroll})")
    assert(iters >= 2, s"converged after $iters iteration(s) — not trained")
    assert(iters <= SimilarityQueries.KmeansOracleUnroll,
      s"$iters iterations exceeds the oracle unroll budget " +
        s"${SimilarityQueries.KmeansOracleUnroll}: bump KmeansOracleUnroll")
    assert(df.count() > 0)
  }

  test("trained model is deterministic across runs (integer math, no rand())") {
    import org.apache.spark.sql.functions._
    val (trained, iters) = SimilarityQueries.ivfKmeans(spark, "/root/testdata/sf0.001")
    val trainedInertia = trained.agg(sum("total_d2")).head().getLong(0)
    val (again, itersAgain) = SimilarityQueries.ivfKmeans(spark, "/root/testdata/sf0.001")
    assert(again.agg(sum("total_d2")).head().getLong(0) === trainedInertia)
    assert(itersAgain === iters)
    assert(trainedInertia > 0)
  }
}
