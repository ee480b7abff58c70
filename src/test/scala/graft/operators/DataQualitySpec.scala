package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.DataQuality._

class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(df: org.apache.spark.sql.DataFrame,
                  rules: Seq[Rule]): Map[String, Long] =
    validate(df, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("each rule counts exactly its violations, nulls per contract") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(5.0), Some("O")),
      (Some(1L), Some(99.0), Some("X")),   // dup key, out of bounds, bad enum
      (None, None, None),                  // null key; null value/status pass
      (Some(3L), Some(1.0), Some("F")))
      .toDF("k", "v", "status")
    val got = run(df, Seq(
      NotNull("k"),
      Unique(Seq("k")),
      Bounds("v", 1, 50),
      InSet("status", Seq("O", "F"))))
    assert(got("not_null(k)") === 1L)
    assert(got("unique(k)") === 1L)        // two rows share k=1 -> 1 extra
    assert(got("bounds(v,1.0,50.0)") === 1L)
    assert(got("in_set(status)") === 1L)
  }

  test("referential integrity counts orphans, null FKs exempt") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val got = run(fact, Seq(RefIntegrity("fk", dim, "id")))
    assert(got("ref_integrity(fk)") === 1L)  // only fk=9 is an orphan
  }

  test("clean data reports zero for every rule (no null sums)") {
    import spark.implicits._
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val got = run(df, Seq(NotNull("k"), Unique(Seq("k")), Bounds("v", 0, 10)))
    assert(got.values.forall(_ == 0L))
  }
}
