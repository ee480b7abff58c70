package graft

import org.scalatest.funsuite.AnyFunSuite

/** Analyzed-logical-plan size tripwire (round-8 verdict #4).
  *
  * The round-8 scale defect class was invisible to every other gate:
  * q208/q219/q223 produced CORRECT results with GOOD physical plans, but
  * each loop round referenced its predecessor 2–4×, so the analyzed
  * logical plan grew as O(k^rounds) and Catalyst analysis itself became
  * the bottleneck (q208: 70 s at sf0.1, >15 min at sf0.01 cold — the
  * cost was plan size, not data). `Materialize.checkpointed` cuts the
  * lineage; THIS spec is the tripwire that fails the build if any query
  * — existing or future — re-grows an exponential plan, because a
  * lineage blowup shows up directly in the analyzed node count long
  * before it shows up in a benchmark.
  *
  * The cap is calibrated ~3× above the catalog's largest legitimate
  * analyzed plan (deep unrolled-loop queries that DO cut lineage per
  * round sit far below it; q208 pre-fix measured in the tens of
  * thousands of nodes).
  */
class PlanSizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // calibrated: the catalog's largest legitimate analyzed plan is
  // q223_kcore_peeling at 275 nodes (per-round lineage CUT); the cap
  // sits ~3.6x above it, still orders of magnitude below what one
  // uncut 3-references-per-round loop produces
  private val MaxNodes = 1000

  test(s"every catalog query's analyzed logical plan stays under " +
      s"$MaxNodes nodes — exponential lineage growth cannot ship") {
    val sizes = SparkEntry.catalog.toSeq.map { case (name, qd) =>
      val df = qd.fn(spark, sf)
      val n = df.queryExecution.analyzed
        .collectWithSubqueries { case p => p }.size
      spark.sqlContext.clearCache()
      name -> n
    }
    val top = sizes.sortBy(-_._2).take(8)
    info("largest analyzed plans: " +
      top.map { case (n, s) => s"$n=$s" }.mkString(", "))
    val over = sizes.filter(_._2 > MaxNodes)
    assert(over.isEmpty,
      s"analyzed-plan blowup (lineage not cut?): ${over.mkString(", ")}")
  }
}
