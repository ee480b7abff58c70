package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BandJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("binned band join equals the naive non-equi join, incl. boundaries") {
    import spark.implicits._
    // values straddle bin edges: width=1.0 bins at integers; 2.0 vs 3.0
    // is a boundary match (diff == width), 2.0 vs 3.01 is not
    val a = Seq((1L, 2.0), (2L, 3.0), (3L, 5.5), (4L, 10.0))
      .toDF("ka", "va")
    val b = Seq((10L, 3.0), (11L, 3.01), (12L, 4.5), (13L, 6.49), (14L, 20.0))
      .toDF("kb", "vb")
    val naive = a.join(b, abs(col("va") - col("vb")) <= 1.0)
      .select("ka", "kb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = BandJoin.join(a, b, "va", "vb", 1.0)
      .select("ka", "kb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === naive)
    assert(binned.contains((1L, 10L)))   // diff exactly == width kept
    assert(!binned.contains((1L, 11L)))  // just over width dropped
    assert(binned.contains((3L, 13L)))   // cross-bin neighbor found
  }

  test("extra condition dedups self-join pairs; no duplicate candidates") {
    import spark.implicits._
    val v = Seq((1L, 1.0), (2L, 1.2), (3L, 1.4)).toDF("ka", "va")
    val w = v.select(col("ka").as("kb"), col("va").as("vb"))
    val got = BandJoin.join(v, w, "va", "vb", 0.25,
        extraCond = Some(col("ka") < col("kb")))
      .select("ka", "kb").collect().map(r => (r.getLong(0), r.getLong(1)))
    // each qualifying pair appears exactly once despite 3-bin explode
    assert(got.sorted.toSeq === Seq((1L, 2L), (2L, 3L)))
  }

  test("disjoint column names are required") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException](BandJoin.join(df, df, "v", "v", 1.0))
  }
}
