package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the probe/waste/centrality wave (q217
  * multi-probe LSH, q218 truncation sweep, q219 HITS): the multi-probe
  * recall trade is pinned structurally (supersets can only help, and the
  * fixture witnesses a strict win at half the index), the truncation
  * sweep is replayed brute-force from collected rows, and the HITS
  * trajectory is replayed as the literal sequential recursion. The DuckDB
  * oracle proves the ENGINES agree; these prove the operators compute the
  * definitions they claim to.
  */
class ProbeTradeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q217 multi-probe: ground truth shared, recall identity holds, and " +
      "probing 2 bands strictly beats single-probe on the same 2 bands") {
    val rows = run("q217_multiprobe_lsh_recall").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(rows.keySet ==
      Set("a_single_4band", "b_single_2band", "c_multi_2band"))
    val (t4, c4, x4, h4, r4) = rows("a_single_4band")
    val (t2, c2, x2, h2, r2) = rows("b_single_2band")
    val (tm, cm, xm, hm, rm) = rows("c_multi_2band")
    // one shared exact ground truth, nonempty
    assert(x4 == x2 && x2 == xm && x4 > 0)
    assert(t4 == 4 && t2 == 2 && tm == 2)
    // recall_bp is exactly the integer identity
    for ((h, x, r) <- Seq((h4, x4, r4), (h2, x2, r2), (hm, xm, rm)))
      assert(r == h * 10000 / x)
    // Hamming-1 probes generate a candidate SUPERSET of the exact-probe
    // candidates at equal bands (bkey itself is in the probe list), so
    // candidates and hits can only grow; the fixture witnesses a strict
    // recall win — the Lv et al. trade actually fires here, it is not
    // vacuous
    assert(cm > c2, "multi-probe must enumerate more candidates")
    assert(hm > h2, "multi-probe must strictly improve recall on fixture")
    // and fewer candidates than probing would cost at 4 bands: the
    // halved index stays halved
    assert(h4 <= hm, "fixture: 2-band multi-probe matches/beats 4 bands")
  }

  test("q218 truncation sweep equals the naive per-doc replay, and " +
      "tokens_lost is non-increasing in context length per source") {
    val docs = table(spark, sf, "documents")
      .selectExpr("source",
        "CAST(size(split(lower(trim(text)), '\\\\s+')) AS BIGINT) AS n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = (for {
      l <- Seq(32L, 64L, 96L)
      (src, ds) <- docs.groupBy(_._1)
    } yield {
      val ns = ds.map(_._2)
      val lost = ns.map(n => math.max(0L, n - l)).sum
      (l, src) -> (ns.length.toLong, ns.count(_ > l).toLong, ns.sum, lost,
        lost * 10000 / ns.sum)
    }).toMap
    val got = run("q218_truncation_waste_audit").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got.nonEmpty)
    assert(got == expected)
    // loss monotonicity: a longer window can only discard less
    got.keys.map(_._2).toSeq.distinct.foreach { src =>
      val byLen = Seq(32L, 64L, 96L).map(l => got((l, src))._4)
      assert(byLen == byLen.sorted.reverse, s"loss not monotone for $src")
    }
  }

  test("q219 HITS top-10 equals the sequential max-normalized recursion") {
    val o = table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = table(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => o.get(r.getLong(0)).map(c => (c, r.getLong(1))))
      .distinct
    def normalized(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> v * 1000000L / mx }
    }
    var h = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      a = normalized(edges.groupBy(_._2).view
        .mapValues(_.map(e => h(e._1)).sum).toMap)
      h = normalized(edges.groupBy(_._1).view
        .mapValues(_.map(e => a(e._2)).sum).toMap)
    }
    def top10(m: Map[Long, Long]): Seq[(Long, Long)] =
      m.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
    val expected =
      top10(a).map { case (id, sc) => ("authority", id, sc) } ++
        top10(h).map { case (id, sc) => ("hub", id, sc) }
    val got = run("q219_hits_hub_authority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size == expected.size)
    assert(got.toSet == expected.toSet)
    // scores are max-normalized: each side's top score is exactly 10^6
    assert(got.filter(_._1 == "authority").map(_._3).max == 1000000L)
    assert(got.filter(_._1 == "hub").map(_._3).max == 1000000L)
  }
}
