package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The properties that make QuantileSketch trustworthy at scale:
  * partition-layout independence (the whole point of the counting-vector
  * state) and the one-bin error bound versus the exact order statistic.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"$name: $result")
  }

  test("estimate is identical on any partition layout") {
    import spark.implicits._
    val xs = (1 to 5000).map(i => 1.0 + (i * 37 % 997))
    val results = Seq(1, 3, 32).map { parts =>
      xs.toDF("x").repartition(parts)
        .agg(QuantileSketch.sketch(col("x")).as("sk"))
        .select(col("sk.p50"), col("sk.p95"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    }
    assert(results.distinct.size === 1)
  }

  test("estimate is the lower bin edge of the target order statistic") {
    import spark.implicits._
    // range spans sub-1 ratios through large magnitudes — inside the
    // sketch's [e^-8, e^24) bin domain where the bound is guaranteed
    check("bin-edge", Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(1e-3, 1e6))) { xs =>
      val row = xs.toDF("x")
        .agg(QuantileSketch.sketch(col("x")).as("sk"))
        .select(col("sk.p50"), col("sk.p95"))
        .collect().head
      val sorted = xs.sorted
      val n = xs.size.toLong
      // the sketch targets the ceil(q*n)-th order statistic; its estimate
      // is the lower edge of that statistic's log-bin, so the exact
      // statistic sits in [est, est * e^(1/8))
      def stat(thr: Long): Double = sorted((thr - 1).toInt)
      val w = math.exp(1 / 8.0)
      val s50 = stat((n + 1) / 2)
      val s95 = stat((19 * n + 19) / 20)
      row.getDouble(0) <= s50 && s50 < row.getDouble(0) * w &&
        row.getDouble(1) <= s95 && s95 < row.getDouble(1) * w
    })
  }

  test("non-positive values are ignored, empty input yields NaN") {
    import spark.implicits._
    // single positive value e: bin = floor(ln(e)*8) = 8, estimate is the
    // bin's lower edge exp(8/8) = e itself
    val r = Seq(-1.0, 0.0, math.E).toDF("x")
      .agg(QuantileSketch.sketch(col("x")).as("sk"))
      .select(col("sk.p50")).collect().head.getDouble(0)
    assert(r === math.exp(1.0))
    val empty = Seq.empty[Double].toDF("x")
      .agg(QuantileSketch.sketch(col("x")).as("sk"))
      .select(col("sk.p50")).collect().head.getDouble(0)
    assert(empty.isNaN)
  }
}
