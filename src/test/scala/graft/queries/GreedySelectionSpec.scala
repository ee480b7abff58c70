package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural properties of the greedy driver-round selectors (q172 MMR,
  * q174 k-center) that the hash oracle pins only for one dataset: both
  * must select k DISTINCT ids, the k-center coverage radius is weakly
  * non-increasing (round t+1's max-min is taken over a shrunken feasible
  * set against a grown selected set), and the MMR objective of successive
  * picks is weakly non-increasing for the same reason (every remaining
  * candidate's redundancy penalty only grows as the set grows). A scoring
  * or tie-break regression that stays deterministic — and so could still
  * hash-match a stale oracle during an edit — breaks these invariants.
  */
class GreedySelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("k-center picks k distinct ids with a non-increasing radius") {
    val rows = SimilarityQueries.defs.toMap
      .apply("q174_kcenter_coreset").fn(spark, sf)
      .collect().sortBy(_.getAs[Int]("rnk"))
    assert(rows.length == SimilarityQueries.MmrK)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length, s"duplicate pick in ${ids.toSeq}")
    // rnk 1 is the seed (radius 0 by convention); monotone from rnk 2 on
    val radii = rows.drop(1).map(_.getAs[Long]("radius_s"))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"coverage radius must be non-increasing: ${radii.mkString(", ")}")
    assert(radii.head > 0, "first farthest point must be at distance > 0")
  }

  test("MMR picks k distinct ids with a non-increasing objective") {
    val rows = SimilarityQueries.defs.toMap
      .apply("q172_mmr_diversified_topk").fn(spark, sf)
      .collect().sortBy(_.getAs[Int]("rnk"))
    assert(rows.length == SimilarityQueries.MmrK)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length, s"duplicate pick in ${ids.toSeq}")
    val scores = rows.map(_.getAs[Long]("score_s"))
    assert(scores.zip(scores.tail).forall { case (a, b) => b <= a },
      s"MMR objective must be non-increasing: ${scores.mkString(", ")}")
  }
}
