package graft.plans

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property test for the merge-based as-of join: random datasets (few hot
  * keys, colliding timestamps, nulls, empty sides) checked against a plain
  * driver-side reference implementation. Merge joins hide their bugs at
  * key boundaries and tie points — exactly what random small cases hit.
  */
class AsofJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, s"$name: $result")
  }

  // keys drawn from a tiny domain (hot keys guaranteed), timestamps from a
  // small range (ties guaranteed), 10% nulls on both fields
  private val genRow: Gen[(Option[Long], Option[Long])] = for {
    k <- Gen.frequency(9 -> Gen.choose(0L, 3L).map(Some(_)), 1 -> Gen.const(None))
    t <- Gen.frequency(9 -> Gen.choose(0L, 15L).map(Some(_)), 1 -> Gen.const(None))
  } yield (k, t)

  test("left-outer + tolerance equals the driver-side reference on random data") {
    check("asof-left-tol", Prop.forAll(
      Gen.listOfN(25, genRow), Gen.listOfN(25, genRow),
      Gen.choose(0L, 8L)) { (ls, rs, tol) =>
      import spark.implicits._
      val rightRows = rs.distinct
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("lk", "lts", "lid")
      val right = rightRows.map { case (k, t) => (k, t) }.toDF("rk", "rts")

      val got = Asof.leftJoin(left, right, Seq((col("lk"), col("rk"))),
          col("lts"), col("rts"),
          tolerance = Some(org.apache.spark.sql.functions.lit(tol)))
        .select("lid", "rts")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet

      val want = ls.zipWithIndex.map { case ((k, t), i) =>
        val cand = for {
          lk <- k; lt <- t
          rts = rightRows.collect {
            case (Some(`lk`), Some(rt)) if rt <= lt && lt - rt <= tol => rt
          }
          if rts.nonEmpty
        } yield rts.max
        (i.toLong, cand.map(v => v: Any))
      }.toSet

      got == want
    })
  }

  test("native as-of equals the driver-side reference on random data") {
    check("asof", Prop.forAll(
      Gen.listOfN(25, genRow), Gen.listOfN(25, genRow)) { (ls, rs) =>
      import spark.implicits._
      // right side deduped by (key, ts): the matched right row is then
      // unique, so the comparison needs no tie-breaking policy
      val rightRows = rs.distinct
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("lk", "lts", "lid")
      val right = rightRows.map { case (k, t) => (k, t) }.toDF("rk", "rts")

      val got = Asof.join(left, right, Seq((col("lk"), col("rk"))),
          col("lts"), col("rts"))
        .select("lid", "rts")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val want = (for {
        ((Some(lk), Some(lt)), i) <- ls.zipWithIndex
        candidates = rightRows.collect {
          case (Some(`lk`), Some(rt)) if rt <= lt => rt
        }
        if candidates.nonEmpty
      } yield (i.toLong, candidates.max)).toSet

      got == want
    })
  }
}
