package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D pareto frontier (skyline) under maximize-both weak dominance: a
  * row survives iff no other row is ≥ on both axes and > on at least
  * one. Duplicate points dominate neither, so every copy of a frontier
  * point survives.
  *
  * The naive plan is an all-pairs dominance anti-join — O(n²) and a
  * catalog-banned shape. The 2-D structure admits a linear plan: per x
  * level keep max(y) (one groupBy), prefix-max over the LEVEL table in
  * descending x (a window over ≤ |distinct x| rows — bounded by the
  * axis's value range, not the corpus), broadcast the level verdicts
  * back. A row is on the frontier iff it attains its level's max AND
  * strictly beats every higher level's max. Cost: one narrow pass, one
  * groupBy, one broadcast join. For ≥3 criteria this decomposition does
  * not exist — that needs the block-nested-loop skyline, deliberately
  * out of catalog scope.
  */
object Skyline {

  /** Frontier rows of `df` (all columns preserved) maximizing (x, y).
    * Both axes must be integral (exact comparisons; no float ties).
    */
  def frontier2d(df: DataFrame, x: Column, y: Column): DataFrame = {
    val withAxes = df.withColumn("__sx", x).withColumn("__sy", y)
    val levels = withAxes.groupBy(col("__sx"))
      .agg(max(col("__sy")).as("__gmax"))
    val w = Window.orderBy(col("__sx").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdicts = levels.withColumn("__pmax", max("__gmax").over(w))
    withAxes.join(broadcast(verdicts), "__sx")
      .filter(col("__sy") === col("__gmax") &&
        (col("__pmax").isNull || col("__sy") > col("__pmax")))
      .drop("__sx", "__sy", "__gmax", "__pmax")
  }
}
