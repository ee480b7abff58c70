package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural invariants of the ranking-evaluation pair (q177 RRF fusion,
  * q178 nDCG) that the hash oracle pins only for one dataset.
  *
  * The q178 discount LUT is the one place the catalog commits to
  * pre-computed transcendental constants: a typo'd entry would stay
  * deterministic (and so could hash-match a stale oracle during an edit),
  * so the spec re-derives every entry from math.log at test time.
  */
class RankingEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("the nDCG discount LUT equals floor(1e9 / log2(rank + 1))") {
    SimilarityQueries.NdcgDiscounts.foreach { case (r, d) =>
      val expected =
        math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong
      assert(d == expected, s"rank $r: LUT $d != derived $expected")
    }
    assert(SimilarityQueries.NdcgDiscounts.map(_._1) == (1L to 10L),
      "LUT must cover ranks 1..10 exactly")
  }

  test("q178 nDCG is bounded by 1000 per-mille and ideal dominates actual") {
    val rows = SimilarityQueries.defs.toMap
      .apply("q178_ndcg_eval").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val dcg = row.getAs[Long]("dcg_s")
      val idcg = row.getAs[Long]("idcg_s")
      val pm = row.getAs[Long]("ndcg_pm")
      assert(dcg >= 0 && idcg >= dcg,
        s"ideal must dominate the actual ranking: dcg=$dcg idcg=$idcg")
      assert(pm >= 0 && pm <= 1000, s"ndcg_pm out of range: $pm")
    }
    spark.sqlContext.clearCache()
  }

  test("q177 fuses distinct ids and every fused row appeared in a leg") {
    val rows = SimilarityQueries.defs.toMap
      .apply("q177_rrf_hybrid_fusion").fn(spark, sf).collect()
    assert(rows.length == 10)
    val ids = rows.map(_.getAs[Long]("id"))
    assert(ids.distinct.length == ids.length, s"duplicate id in ${ids.toSeq}")
    rows.foreach { row =>
      val rd = Option(row.get(row.fieldIndex("r_dense")))
      val rs = Option(row.get(row.fieldIndex("r_sparse")))
      assert(rd.nonEmpty || rs.nonEmpty,
        "a fused row must carry at least one leg rank")
      // RRF score must equal the sum of its legs' exact contributions
      val expected =
        rd.map(r => 1000000000L / (60L + r.asInstanceOf[Long])).getOrElse(0L) +
          rs.map(r => 1000000000L / (60L + r.asInstanceOf[Long])).getOrElse(0L)
      assert(row.getAs[Long]("rrf_s") == expected)
    }
    spark.sqlContext.clearCache()
  }
}
