package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property test: SnapshotDiff against a plain driver-side classification
  * on random snapshot pairs (duplicate-free keys, overlapping key ranges,
  * null payloads).
  */
class SnapshotDiffPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(name: String, prop: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, s"$name: $result")
  }

  private val genSnapshot: Gen[Map[Long, Option[String]]] = for {
    keys <- Gen.someOf(0L to 14L)
    vals <- Gen.listOfN(keys.size,
      Gen.frequency(3 -> Gen.oneOf("a", "b", "c").map(Some(_)),
        1 -> Gen.const(None)))
  } yield keys.zip(vals).toMap

  test("diff equals driver-side classification on random snapshots") {
    check("diff", Prop.forAll(genSnapshot, genSnapshot) { (o, c) =>
      import spark.implicits._
      val old = o.toSeq.map { case (k, v) => (k, v) }.toDF("k", "v")
      val cur = c.toSeq.map { case (k, v) => (k, v) }.toDF("k", "v")
      val got = SnapshotDiff.diff(old, cur, Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

      val want = (o.keySet ++ c.keySet).map { k =>
        k -> ((o.get(k), c.get(k)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a == b => "unchanged"
          case _ => "changed"
        })
      }.toMap
      got == want
    })
  }
}
