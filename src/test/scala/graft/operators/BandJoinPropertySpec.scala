package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for the rewrite operators against their naive
  * formulations on random inputs — the invariant is EQUALITY, not
  * plausibility: the binned band join must produce exactly the pairs the
  * quadratic predicate does (bin-edge values included), and the sparse
  * CDC delta must rebuild the next snapshot row-for-row.
  */
class BandJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"$name: $result")
  }

  // quarter-step values straddle integer bin edges for widths 0.5/1/2
  private val genVals: Gen[List[Double]] =
    Gen.listOfN(12, Gen.chooseNum(-20, 20).map(_ / 4.0))

  test("binned band join == naive quadratic join on random values") {
    check("bandJoin", Prop.forAll(genVals, genVals,
        Gen.oneOf(0.5, 1.0, 2.0)) { (ls, rs, w) =>
      import spark.implicits._
      val a = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("ka", "va")
      val b = rs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("kb", "vb")
      val naive = a.join(b, abs(col("va") - col("vb")) <= w)
        .select("ka", "kb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val binned = BandJoin.join(a, b, "va", "vb", w)
        .select("ka", "kb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      binned == naive
    })
  }

  private val genSnap: Gen[Map[Long, Option[Double]]] = for {
    keys <- Gen.someOf(0L to 11L)
    vals <- Gen.listOfN(keys.size,
      Gen.frequency(3 -> Gen.chooseNum(0, 9).map(d => Some(d.toDouble)),
        1 -> Gen.const(None)))
  } yield keys.zip(vals).toMap

  test("applyDelta(old, sparse(diff)) rebuilds cur on random snapshots") {
    check("applyDelta", Prop.forAll(genSnap, genSnap) { (o, c) =>
      import spark.implicits._
      val old = o.toSeq.toDF("k", "v")
      val cur = c.toSeq.toDF("k", "v")
      val sparse = SnapshotDiff.diff(old, cur, Seq("k"))
        .filter(col("change_type") =!= "unchanged")
      val rebuilt = SnapshotDiff.applyDelta(old, sparse, Seq("k"))
      rebuilt.exceptAll(cur).isEmpty && cur.exceptAll(rebuilt).isEmpty
    })
  }
}
