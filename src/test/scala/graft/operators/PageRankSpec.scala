package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dual-path equality for the PageRank operator: the driver-state
  * treeAggregate path and the distributed rank-join path must produce
  * bit-identical scaled-integer trajectories — same dispatch-pattern
  * guarantee ConnectedComponents gives its union-find / star paths.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic multi-component graph: a triangle, a 6-chain, a star,
    * and a dense clique — symmetrized like the production call site.
    */
  private def fixtureEdges() = {
    import spark.implicits._
    val undirected = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),                   // triangle
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L), // chain
      (20L, 21L), (20L, 22L), (20L, 23L), (20L, 24L), // star
      (30L, 31L), (30L, 32L), (30L, 33L),             // clique K4
      (31L, 32L), (31L, 33L), (32L, 33L))
    val pr = undirected.toDF("pa", "pb")
    pr.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(pr.select(col("pb").as("src"), col("pa").as("dst")))
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("driver-state and rank-join paths are identical across iterations") {
    val edges = fixtureEdges()
    for (iters <- Seq(1, 3, 5)) {
      val driver = ranksOf(PageRank.driverState(edges, iters))
      val joined = ranksOf(PageRank.rankJoin(edges, iters))
      assert(driver == joined, s"paths diverge at iters=$iters")
    }
  }

  test("rank values are exact: uniform degree-2 cycle stays uniform") {
    import spark.implicits._
    // on a regular graph PageRank's fixpoint is uniform; with scaled
    // integers r=1000000: sum of (1000000 DIV 2) over 2 in-edges =
    // 1000000, damped: 150000 + 850000*1000000 DIV 1000000 = 1000000
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("pa", "pb")
    val edges = cycle.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(cycle.select(col("pb").as("src"), col("pa").as("dst")))
    val got = ranksOf(PageRank.rankScaled(edges, iters = 4))
    assert(got.values.toSet == Set(1000000L))
    assert(got.keySet == (0L until 6L).toSet)
  }

  test("public entry dispatches below the gate and matches both paths") {
    val edges = fixtureEdges()
    assert(ranksOf(PageRank.rankScaled(edges)) ==
      ranksOf(PageRank.rankJoin(edges, iters = 3)))
  }

  test("rank-join path is identical with broadcast joins disabled") {
    // the regime the src-partitioned edge cache exists for: once the rank
    // table outgrows the broadcast threshold each iteration is a
    // sort-merge join over the pre-clustered edge side — prove the path
    // is correct there, not only under AQE's small-rank-table broadcast
    val edges = fixtureEdges()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(ranksOf(PageRank.driverState(edges, 3)) ==
        ranksOf(PageRank.rankJoin(edges, 3)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
