package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the collocation/concentration/rank-test
  * wave (q238 PMI collocations, q239 Lorenz/Gini/HHI concentration, q240
  * Mann–Whitney U): PMI micro-nats are recomputed from scratch counts in
  * pure Scala, the Gini identity is replayed against a brute-force
  * mean-absolute-difference Gini, and the distinct-value 2U formulation is
  * checked against the O(n·m) pairwise definition it exists to avoid.
  */
class ConcentrationRankSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq

  private lazy val docs: Seq[(Long, String, String)] =
    table(spark, sf, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q238: PMI micro-nats replay from scratch bigram/unigram counts " +
      "and the min-count cut holds") {
    val rows = run("q238_pmi_collocations").collect()
    assert(rows.nonEmpty)
    val words = docs.flatMap(d => toks(d._2))
    val uni = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = docs.flatMap { d =>
      val ws = toks(d._2); if (ws.size >= 2) ws.zip(ws.tail) else Nil
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nb = bi.values.sum; val nu = words.size.toLong
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val c12 = r.getAs[Long]("c12")
      assert(c12 >= 5L, "min-count cut violated")
      assert(bi((w1, w2)) == c12)
      assert(uni(w1) == r.getAs[Long]("c1"))
      assert(uni(w2) == r.getAs[Long]("c2"))
      val expect = math.floor(math.log(
        c12.toDouble * nu * nu / (nb.toDouble * uni(w1) * uni(w2)))
        * 1e6).toLong
      assert(r.getAs[Long]("pmi_m") == expect)
    }
    // the 25 reported rows are the true top-25 under the total order
    val all = bi.collect { case ((w1, w2), c) if c >= 5 =>
      val p = math.floor(math.log(
        c.toDouble * nu * nu / (nb.toDouble * uni(w1) * uni(w2)))
        * 1e6).toLong
      (p, w1, w2)
    }.toSeq.sortBy { case (p, w1, w2) => (-p, w1, w2) }
    val expectTop = all.take(math.min(25, all.size))
    val gotTop = rows.map(r => (r.getAs[Long]("pmi_m"),
      r.getAs[String]("w1"), r.getAs[String]("w2"))).toSeq
    assert(gotTop == expectTop)
  }

  test("q239: the rank-formula Gini equals the brute-force " +
      "mean-absolute-difference Gini and the Lorenz curve is monotone") {
    val rows = run("q239_source_concentration").collect()
    assert(rows.nonEmpty)
    val masses = rows.map(_.getAs[Long]("mass"))
    val n = masses.length.toLong
    val t = masses.sum
    assert(rows.head.getAs[Long]("n_src") == n)
    assert(rows.head.getAs[Long]("total") == t)
    // brute force: G = Σ_i Σ_j |x_i − x_j| / (2 n Σx), in bp with the
    // same truncation: numerator·10000 DIV (2nT) — algebraically equal
    // to the rank formula (2Σ rk·x − (n+1)T) · 10000 DIV (nT) for
    // ascending-sorted x
    val mad = (for (a <- masses; b <- masses) yield math.abs(a - b)).sum
    val giniBrute = mad * 10000L / (2L * n * t)
    assert(rows.head.getAs[Long]("gini_bp") == giniBrute)
    // HHI replay
    val hhi = masses.map(m => (m * 10000L / t) * (m * 10000L / t)).sum /
      10000L
    assert(rows.head.getAs[Long]("hhi_bp") == hhi)
    // Lorenz: cumulative shares are non-decreasing in rank and end near
    // 10000 (floor truncation can only undershoot)
    val byRk = rows.sortBy(_.getAs[Long]("rk"))
    val cums = byRk.map(_.getAs[Long]("cum_share_bp"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last == 10000L)
  }

  test("q240: the distinct-value 2U equals the O(n·m) pairwise " +
      "definition and the verdict replays in BigInt") {
    val rows = run("q240_mannwhitney_quality").collect()
    assert(rows.nonEmpty)
    // recompute every doc's score through the engine's own scorer (the
    // scorer itself is cross-checked in the quality-filter specs)
    val scored = TextQueries
      .qualityScored(table(spark, sf, "documents"))
      .select("source", "score").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val nt = scored.size.toLong
    val tieS = scored.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * t * t - t }).sum
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val xs = scored.collect { case (s, v) if s == src => v }
      val ys = scored.collect { case (s, v) if s != src => v }
      assert(r.getAs[Long]("n") == xs.size.toLong)
      assert(r.getAs[Long]("m") == ys.size.toLong)
      val u2 = (for (a <- xs; b <- ys) yield {
        if (a > b) 2L else if (a == b) 1L else 0L
      }).sum
      assert(r.getAs[Long]("u2") == u2)
      val n = xs.size.toLong; val m = ys.size.toLong
      assert(r.getAs[Long]("rb_bp") == u2 * 10000L / (n * m) - 10000L)
      val lhs = BigInt(3) * BigInt(u2 - n * m).pow(2) * nt * (nt - 1) *
        10000
      val rhs = BigInt(38416) * n * m *
        (BigInt(nt + 1) * nt * (nt - 1) - tieS)
      assert(r.getAs[Long]("sig") == (if (lhs > rhs) 1L else 0L))
    }
  }
}
