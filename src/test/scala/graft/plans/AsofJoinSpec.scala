package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("at-or-before semantics with ties, gaps, and no-match rows") {
    import spark.implicits._
    val right = Seq((1L, 5L, "r5"), (1L, 10L, "r10"), (2L, 7L, "r7"))
      .toDF("rk", "rts", "rv")
    val left = Seq((1L, 4L), (1L, 9L), (1L, 10L), (1L, 99L), (2L, 7L),
      (3L, 50L)).toDF("lk", "lts")
    val out = Asof.join(left, right, Seq((col("lk"), col("rk"))),
        col("lts"), col("rts"))
      .select("lk", "lts", "rts", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(out === Set(
      (1L, 9L, 5L, "r5"),     // greatest rts <= 9 is 5
      (1L, 10L, 10L, "r10"),  // tie: at-or-before includes equal ts
      (1L, 99L, 10L, "r10"),  // carries the last candidate forward
      (2L, 7L, 7L, "r7")))    // exact match on another key
    // (1,4): no right at-or-before; (3,50): key absent -> dropped
  }

  test("null keys and null timestamps never match") {
    import spark.implicits._
    val right = Seq((Some(1L), Some(5L), "a"), (Some(1L), None, "nullts"),
      (None, Some(3L), "nullkey")).toDF("rk", "rts", "rv")
    val left = Seq((Some(1L), Some(6L)), (Some(1L), None), (None, Some(9L)))
      .toDF("lk", "lts")
    val out = Asof.join(left, right, Seq((col("lk"), col("rk"))),
        col("lts"), col("rts"))
      .select("lk", "lts", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set((1L, 6L, "a")))
  }

  test("matches the union-and-carry window formulation on real events") {
    val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type").isin("click", "purchase"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))

    val native = Asof.join(purchases, clicks,
        Seq((col("p_user"), col("c_user"))), col("p_ts"), col("c_ts"))
      .select(col("p_id"), unix_micros(col("c_ts")).as("match_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // oracle: the q58-style union + running last_value window, inner form
    val marked = ev
      .withColumn("kind_ord",
        when(col("event_type") === "click", 0).otherwise(1))
      .withColumn("click_us",
        when(col("event_type") === "click", unix_micros(col("ts"))))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("kind_ord"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = marked
      .withColumn("prev_click_us",
        last("click_us", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" &&
        col("prev_click_us").isNotNull)
      .select(col("event_id"), col("prev_click_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(native === expected)
    assert(native.nonEmpty)
  }

  test("left-outer: unmatched, null-key, and null-ts left rows emit nulls") {
    import spark.implicits._
    val right = Seq((1L, 5L, "r5"), (1L, 10L, "r10"), (2L, 7L, "r7"))
      .toDF("rk", "rts", "rv")
    val left = Seq((Some(1L), Some(4L)), (Some(1L), Some(9L)),
      (Some(3L), Some(50L)), (None, Some(9L)), (Some(1L), None))
      .toDF("lk", "lts")
    val out = Asof.leftJoin(left, right, Seq((col("lk"), col("rk"))),
        col("lts"), col("rts"))
      .select("lk", "lts", "rts", "rv")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(out === Set(
      (Some(1L), Some(4L), None, None),          // no right at-or-before
      (Some(1L), Some(9L), Some(5L), Some("r5")),
      (Some(3L), Some(50L), None, None),         // key absent from right
      (None, Some(9L), None, None),              // null key still emits
      (Some(1L), None, None, None)))             // null ts still emits
    // left-outer preserves left cardinality exactly
    assert(Asof.leftJoin(left, right, Seq((col("lk"), col("rk"))),
      col("lts"), col("rts")).count() === left.count())
  }

  test("tolerance bounds the gap; out-of-tolerance rows drop (inner) or null (outer)") {
    import spark.implicits._
    val right = Seq((1L, 5L, "r5"), (1L, 40L, "r40")).toDF("rk", "rts", "rv")
    val left = Seq((1L, 7L), (1L, 42L), (1L, 90L)).toDF("lk", "lts")
    val keys = Seq((col("lk"), col("rk")))
    val inner = Asof.join(left, right, keys, col("lts"), col("rts"),
        tolerance = Some(lit(10L)))
      .select("lts", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // (1,7)->r5 gap 2 ok; (1,42)->r40 gap 2 ok; (1,90)->r40 gap 50 DROPPED
    assert(inner === Set((7L, "r5"), (42L, "r40")))
    val outer = Asof.leftJoin(left, right, keys, col("lts"), col("rts"),
        tolerance = Some(lit(10L)))
      .select("lts", "rv").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(outer === Set((7L, Some("r5")), (42L, Some("r40")), (90L, None)))
  }

  test("mismatched timestamp types fail at analysis, not silently") {
    import spark.implicits._
    val right = Seq(("1", "a")).toDF("rk", "rts")
    val left = Seq((1L, 6L)).toDF("lk", "lts")
    val e = intercept[Exception] {
      Asof.join(left.withColumn("lk", col("lk").cast("string")), right,
        Seq((col("lk"), col("rk"))), col("lts"), col("rts")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("same type") ||
      e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
  }

  test("plans as AsofJoinExec with one exchange per side, no cartesian") {
    import spark.implicits._
    val right = Seq((1L, 5L)).toDF("rk", "rts")
    val left = Seq((1L, 6L)).toDF("lk", "lts")
    val df = Asof.join(left, right, Seq((col("lk"), col("rk"))),
      col("lts"), col("rts"))
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect { case e: AsofJoinExec => e }.size === 1)
    val s = plan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s)
  }
}
