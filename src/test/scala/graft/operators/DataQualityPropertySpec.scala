package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.DataQuality._

/** Property test: every DataQuality rule's violation count equals a
  * driver-side brute-force count on random frames with nulls and
  * duplicates. */
class DataQualityPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, s"$name: $result")
  }

  private val genRows: Gen[List[(Option[Long], Option[Double])]] =
    Gen.listOf(for {
      k <- Gen.frequency(4 -> Gen.chooseNum(0L, 5L).map(Some(_)),
        1 -> Gen.const(None))
      v <- Gen.frequency(4 -> Gen.chooseNum(-5, 15).map(d => Some(d.toDouble)),
        1 -> Gen.const(None))
    } yield (k, v))

  test("rule counts equal brute force on random frames") {
    check("rules", Prop.forAll(genRows) { rows =>
      import spark.implicits._
      val df = rows.toDF("k", "v")
      val got = validate(df, Seq(
          NotNull("k"), Unique(Seq("k")), Bounds("v", 0, 10)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val nullK = rows.count(_._1.isEmpty)
      val dupes = rows.groupBy(_._1).values
        .map(g => g.size - 1).sum  // extras per duplicated key (None groups too)
      val oob = rows.count(r => r._2.exists(v => v < 0 || v > 10))
      got("not_null(k)") == nullK &&
        got("unique(k)") == dupes &&
        got("bounds(v,0.0,10.0)") == oob
    })
  }
}
