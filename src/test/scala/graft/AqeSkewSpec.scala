package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof that AQE's runtime skew-join mitigation ENGAGES under this
  * library's session configuration — the complement to the explicit
  * guards (SkewTools salting, StopShingles document-frequency cuts):
  * explicit salting handles skew we can predict; AQE must catch the skew
  * we cannot, by re-planning from runtime shuffle statistics. A config
  * where skewJoin silently never fires would make every "AQE handles
  * residual skew" claim in PERF.md vacuous — this spec is the tripwire.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      // thresholds scaled down so a local fixture can cross them — the
      // same knobs a 100 TB deployment tunes upward
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // force the sort-merge path: broadcast would sidestep the skew
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // one pathological key (100k rows) among 100 normal keys (100 each)
      val fact = spark.range(0, 100000).select(lit(7L).as("k"),
          col("id").as("payload"))
        .unionAll(spark.range(0, 10000).select((col("id") % 100 + 100).as("k"),
          col("id").as("payload")))
      val dim = spark.range(0, 300).select(col("id").as("k"),
        (col("id") * 2).as("attr"))

      val joined = fact.join(dim, "k")
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("expected an AdaptiveSparkPlanExec root"))
      // execute THIS plan tree — a df.count() would run its own separate
      // execution and leave this AQE plan unfinalized
      assert(adaptive.execute().count() === 110000L)
      // plain collect() stops at QueryStageExec boundaries (stages hold
      // their subtree in `plan`, not `children`) — descend explicitly
      def deepCollect(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[SortMergeJoinExec] = {
        val here = p match {
          case j: SortMergeJoinExec if j.isSkewJoin => Seq(j)
          case _ => Nil
        }
        val nested = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case _ => Nil
        }
        here ++ (p.children ++ nested).flatMap(deepCollect)
      }
      val skewJoins = deepCollect(adaptive.executedPlan)
      assert(skewJoins.nonEmpty,
        s"AQE did not mark the join as skew-handled:\n${adaptive.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
