package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dual-path equality for the Bfs operator: driver-bitset and
  * distributed-frontier paths must produce the same (level, node) sets.
  */
class BfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def levelsOf(df: org.apache.spark.sql.DataFrame): Set[(Int, Long)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1))).toSet

  /** Two components plus a self-loop: BFS must stay inside the seed's
    * component and never revisit.
    */
  private def fixture() = {
    import spark.implicits._
    Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), // chain from seed 1
      (2L, 7L), (7L, 8L),                               // branch
      (3L, 3L),                                         // self-loop
      (100L, 101L), (101L, 102L)                        // unreachable comp.
    ).toDF("pa", "pb")
  }

  test("driver-bitset and distributed-frontier paths are identical") {
    val pairs = fixture()
    for (hops <- Seq(0, 1, 2, 3, 10)) {
      val bitset = levelsOf(Bfs.driverBitset(
        pairs.selectExpr("cast(pa as long) as a", "cast(pb as long) as b"),
        hops))
      val frontier = levelsOf(Bfs.distributedFrontier(
        pairs.selectExpr("cast(pa as long) as a", "cast(pb as long) as b"),
        hops))
      assert(bitset == frontier, s"paths diverge at hops=$hops")
    }
  }

  test("levels are hop distances from the min-id seed") {
    val got = levelsOf(Bfs.levels(fixture(), hops = 3))
    assert(got == Set(
      (0, 1L), (1, 2L), (2, 3L), (2, 7L), (3, 4L), (3, 8L)))
    // the other component (100..102) and beyond-hop nodes (5, 6) absent
  }

  test("dispatch gate forces the distributed path when lowered") {
    val viaDistributed = levelsOf(
      Bfs.levels(fixture(), hops = 3, driverNodeLimit = 2))
    val viaDriver = levelsOf(Bfs.levels(fixture(), hops = 3))
    assert(viaDistributed == viaDriver)
  }

  test("frontier path is identical with broadcast joins disabled") {
    // the regime the src-partitioned edge checkpoint exists for: once the
    // frontier outgrows the broadcast threshold the per-hop join is a
    // sort-merge join over the pre-clustered edge side — prove the path
    // is correct there, not only under AQE's small-frontier broadcast
    val pairs = fixture()
      .selectExpr("cast(pa as long) as a", "cast(pb as long) as b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(levelsOf(Bfs.distributedFrontier(pairs, 3)) ==
        levelsOf(Bfs.driverBitset(pairs, 3)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("empty edge list yields an empty result on both paths") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(levelsOf(Bfs.driverBitset(empty, 3)).isEmpty)
    assert(levelsOf(Bfs.distributedFrontier(empty, 3)).isEmpty)
  }
}
