package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan invariants — the guard that no quadratic
  * plan can silently ship.
  *
  * At 100 TB the only acceptable join shapes are equi-shuffles and
  * broadcasts of provably bounded sides. A CartesianProduct (shuffle ×
  * shuffle) is quadratic in the corpus and banned outright. A
  * BroadcastNestedLoopJoin is linear ONLY when its broadcast side is small;
  * here every BNLJ's build side must be a filtered input (the q44 cap
  * slice, q45's query set, q46's centroid sample) — a BNLJ broadcasting an
  * unfiltered corpus-sized table fails this spec.
  */
class PlanInvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def buildSide(j: BroadcastNestedLoopJoinExec): SparkPlan =
    j.buildSide match {
      case BuildLeft => j.left
      case BuildRight => j.right
    }

  /** collectWithSubqueries that ALSO descends into cached-plan fragments:
    * queries persist intermediates (Materialize), and a quadratic join
    * hidden inside an InMemoryRelation must not escape the invariant.
    */
  private def collectAll[T](plan: SparkPlan)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = plan.collectWithSubqueries(pf)
    val cached = plan.collectWithSubqueries {
      case s: InMemoryTableScanExec => s.relation.cachedPlan
    }
    here ++ cached.flatMap(p => collectAll(p)(pf))
  }

  private def isBounded(build: SparkPlan): Boolean =
    collectAll(build) { case f: FilterExec => f }.nonEmpty ||
      collectAll(build) {
        case s: FileSourceScanExec if s.dataFilters.nonEmpty => s
      }.nonEmpty ||
      // a grouping-free (global) aggregate emits exactly one row — the
      // scalar-broadcast pattern (e.g. q62's min-count join)
      collectAll(build) {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.groupingExpressions.isEmpty => a
      }.nonEmpty ||
      // a driver-side literal relation is bounded by construction — the
      // broadcast-local-state pattern (q66's k centroids live on the
      // driver between Lloyd iterations, MLlib-style)
      collectAll(build) {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      }.nonEmpty ||
      // a LIMIT-k subtree emits at most k rows whatever the corpus — the
      // fixed-cardinality index-sample pattern (hashSample's
      // TakeOrderedAndProject: nlist/codebook entries, never a fraction
      // of N)
      collectAll(build) {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty ||
      collectAll(build) {
        case g: org.apache.spark.sql.execution.GlobalLimitExec => g
      }.nonEmpty

  test("no catalog plan contains a cartesian or an unbounded nested-loop join") {
    SparkEntry.catalog.foreach { case (name, qd) =>
      val plan = qd.fn(spark, sf).queryExecution.sparkPlan
      val carts = collectAll(plan) { case c: CartesianProductExec => c }
      assert(carts.isEmpty,
        s"$name plans a CartesianProduct — quadratic in the corpus:\n$plan")
      collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }
        .foreach { j =>
          assert(isBounded(buildSide(j)),
            s"$name broadcasts an UNFILTERED side in a nested-loop join:\n$plan")
        }
      spark.sqlContext.clearCache()
    }
  }

  test("q44's cap filter pushes down to the parquet scan") {
    val plan = SparkEntry.queries("q44_embed_neardup_cosine")(spark, sf)
      .queryExecution.sparkPlan
    val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.metadata.get("PushedFilters").exists(_.contains("LessThan(vec_id,300")),
        s"cap not pushed: ${s.metadata.get("PushedFilters")}")
    }
  }
}
