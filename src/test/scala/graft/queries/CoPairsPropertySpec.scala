package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The coPairs base now feeds five catalog queries (q113/q115/q124/q132/
  * q133); this pins its semantics to the naive formulation it replaced:
  * the map-side i<j combination explode over per-order sorted distinct
  * part sets must equal the distinct self-join on the order key — with
  * multiplicity (one pair per order containing both parts), including
  * duplicate line items, single-part orders, and empty inputs.
  */
class CoPairsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"$name: $result")
  }

  private val genLineitem: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      ok <- Gen.choose(1L, 12L)
      pk <- Gen.choose(1L, 9L) // small domains force dup line items
    } yield (ok, pk))

  test("pair explode == distinct self-join, with per-order multiplicity") {
    import spark.implicits._
    check("coPairs", Prop.forAll(genLineitem) { rows =>
      val li = rows.toDF("l_orderkey", "l_partkey")
      val got = Relational.coPairs(li)
        .groupBy("pa", "pb").agg(count(lit(1)).as("n"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .toMap
      // reference: per-order distinct part sets, all i<j pairs, counted
      val expected = rows.distinct.groupBy(_._1).values
        .flatMap { order =>
          val pks = order.map(_._2).distinct.sorted
          for (i <- pks.indices; j <- i + 1 until pks.size)
            yield (pks(i), pks(j))
        }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      got === expected
    })
  }
}
