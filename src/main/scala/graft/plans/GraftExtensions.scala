package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Session extension installer for the custom whole-plan operators.
  *
  * Install with `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.plans.GraftExtensions` (the config
  * route needs no code change in the launching application). All of this
  * repo's mains (Verify/Bench) and the test session install it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(AsofLE.FunctionName),
      new ExpressionInfo(classOf[AsofLE].getName, AsofLE.FunctionName),
      (exprs: Seq[Expression]) => AsofLE(exprs.head, exprs(1))))
    ext.injectOptimizerRule(RewriteAsofJoin)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}

/** Public DataFrame-level API for the native as-of join. */
object Asof {

  /** Inner as-of join: each `left` row matched to the single `right` row
    * with equal keys and the greatest `rightTs <= leftTs`; unmatched left
    * rows drop. Requires [[GraftExtensions]] on the session — without it
    * the marker function fails at planning with an "unevaluable" error
    * (never a silently different result).
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(Column, Column)],
           leftTs: Column, rightTs: Column): DataFrame = {
    val cond = (keys.map { case (l, r) => l === r } :+
      call_function(AsofLE.FunctionName, leftTs, rightTs)).reduce(_ && _)
    left.join(right, cond, "inner")
  }
}
