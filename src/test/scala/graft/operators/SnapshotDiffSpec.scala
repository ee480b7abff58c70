package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("classifies added/removed/changed/unchanged incl. null payloads") {
    import spark.implicits._
    val old = Seq(
      (1L, Some("a"), Some(1.0)),   // unchanged
      (2L, Some("b"), Some(2.0)),   // changed (price)
      (3L, None, Some(3.0)),        // unchanged with null payload
      (4L, Some("d"), Some(4.0)),   // removed
      (6L, Some("f"), None))        // changed: new value becomes non-null
      .toDF("k", "status", "price")
    val cur = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.5)),
      (3L, None, Some(3.0)),
      (5L, Some("e"), Some(5.0)),   // added
      (6L, Some("f"), Some(6.0)))
      .toDF("k", "status", "price")

    val got = SnapshotDiff.diff(old, cur, Seq("k"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(3), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got(1L) === ("unchanged", Some(1.0)))
    assert(got(2L) === ("changed", Some(2.5)))     // carries NEW payload
    assert(got(3L) === ("unchanged", Some(3.0)))
    assert(got(4L) === ("removed", Some(4.0)))     // carries OLD payload
    assert(got(5L) === ("added", Some(5.0)))
    assert(got(6L) === ("changed", Some(6.0)))
  }

  test("changed row whose new value is null keeps the null") {
    import spark.implicits._
    val old = Seq((1L, Some(9.0))).toDF("k", "price")
    val cur = Seq((1L, Option.empty[Double])).toDF("k", "price")
    val row = SnapshotDiff.diff(old, cur, Seq("k")).collect().head
    assert(row.getString(2) === "changed")
    assert(row.isNullAt(1))
  }

  test("applyDelta on a sparse delta reconstructs the next snapshot") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val old = Seq(
      (1L, Some("a"), Some(1.0)),   // unchanged -> absent from sparse delta
      (2L, Some("b"), Some(2.0)),   // changed
      (4L, Some("d"), Some(4.0)),   // removed
      (6L, Some("f"), Option.empty[Double]))  // changed from null
      .toDF("k", "status", "price")
    val cur = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.5)),
      (5L, Some("e"), Some(5.0)),   // added
      (6L, Some("f"), Some(6.0)))
      .toDF("k", "status", "price")
    val sparse = SnapshotDiff.diff(old, cur, Seq("k"))
      .filter(col("change_type") =!= "unchanged")
    assert(sparse.count() === 4)    // 1 changed-from-null + changed + removed + added
    val rebuilt = SnapshotDiff.applyDelta(old, sparse, Seq("k"))
    assert(rebuilt.exceptAll(cur).count() === 0)
    assert(cur.exceptAll(rebuilt).count() === 0)
  }

  test("the q79 fingerprint witness detects a single corrupted row") {
    // q79's roundtrip proof replaced exceptAll-both-ways with a
    // (count, Σ decimal xxhash64) multiset fingerprint; this pins that
    // the witness is not vacuous — equal multisets agree, and one
    // perturbed value (or one dropped row) flips it
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def fp(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("k"), col("status"), col("price"))
          .cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    val a = Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), None),
      (3L, None, Some(3.0))).toDF("k", "status", "price")
    val same = Seq((3L, None, Some(3.0)), (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), None)).toDF("k", "status", "price")
    val oneOff = Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), None),
      (3L, None, Some(3.000001))).toDF("k", "status", "price")
    val dropped = a.filter(col("k") =!= 2L)
    assert(fp(a) === fp(same), "order must not matter")
    assert(fp(a) !== fp(oneOff), "a perturbed value must change the hash sum")
    assert(fp(a)._1 !== fp(dropped)._1, "a dropped row must change the count")
  }

  test("applyDelta rejects a delta without change_type") {
    import spark.implicits._
    val old = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException](
      SnapshotDiff.applyDelta(old, old, Seq("k")))
  }

  test("mismatched schemas are rejected") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x", 1.0)).toDF("k", "v", "extra")
    intercept[IllegalArgumentException](SnapshotDiff.diff(a, b, Seq("k")))
  }
}
