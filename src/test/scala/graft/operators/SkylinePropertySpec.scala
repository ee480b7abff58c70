package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property test: the linear level-table skyline against the O(n²)
  * dominance DEFINITION on random point multisets — duplicate points,
  * full ties on one axis, and single-point frontiers all emerge from
  * the generator. (The sf-data cross-check in SelectionLayoutSpec sees
  * one distribution; this sees the adversarial ones.)
  */
class SkylinePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val genPts: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      x <- Gen.choose(0L, 8L) // small ranges force ties and duplicates
      y <- Gen.choose(0L, 8L)
    } yield (x, y))

  test("frontier2d equals the brute-force weak-dominance skyline") {
    val prop = Prop.forAll(genPts) { pts =>
      import spark.implicits._
      val df = pts.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val got = Skyline.frontier2d(df, col("x"), col("y"))
        .collect().map(_.getLong(0)).toSet
      val idx = pts.zipWithIndex
      val expected = idx.filter { case ((x, y), _) =>
        !pts.exists { case (x2, y2) =>
          x2 >= x && y2 >= y && (x2 > x || y2 > y)
        }
      }.map(_._2.toLong).toSet
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.toString)
  }
}
