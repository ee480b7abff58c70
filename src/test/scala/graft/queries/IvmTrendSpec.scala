package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the trend/IVM wave (q220 Theil–Sen,
  * q221 incremental aggregate maintenance): the order-statistic median
  * machinery is replayed by literal sort-and-pick from collected rows, the
  * robustness claim is tested against the spike-free ground truth the
  * fixture was built from, and the IVM merge is replayed group-by-group.
  */
class IvmTrendSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def medianTrunc(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val m = s.length
    // mean of the two middle order statistics, truncating like DIV
    val picks = Seq(s((m + 1) / 2 - 1), s(m / 2)).distinct
    picks.sum / picks.length
  }

  test("q220 equals the literal sort-and-pick replay, and Theil-Sen's " +
      "contamination response is smaller than OLS's") {
    val dailyRaw = table(spark, sf, "events")
      .selectExpr("unix_micros(ts) DIV 86400000000 AS d")
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dmin = dailyRaw.keys.min
    val dmax = dailyRaw.keys.max
    val pts = dailyRaw.toSeq.sortBy(_._1).map { case (d, n) =>
      (d - dmin, if (d > dmax - 5) n * 5 else n)
    }
    val slopes = for {
      i <- pts.indices; j <- i + 1 until pts.length
    } yield (pts(j)._2 - pts(i)._2) * 1000 / (pts(j)._1 - pts(i)._1)
    val tsSlope = medianTrunc(slopes)
    val icpt = medianTrunc(pts.map { case (x, y) => y * 1000 - tsSlope * x })
    def olsOf(ps: Seq[(Long, Long)]): Long = {
      val m = ps.length.toLong
      val sx = ps.map(_._1).sum; val sy = ps.map(_._2).sum
      val sxy = ps.map(p => p._1 * p._2).sum
      val sxx = ps.map(p => p._1 * p._1).sum
      (m * sxy - sx * sy) * 1000 / (m * sxx - sx * sx)
    }
    val r = run("q220_theilsen_trend").collect().head
    assert(r.getLong(0) == pts.length.toLong)
    assert(r.getLong(1) == slopes.length.toLong)
    assert(r.getLong(2) == tsSlope, "theil-sen slope")
    assert(r.getLong(3) == olsOf(pts), "ols slope")
    assert(r.getLong(4) == icpt, "intercept")
    // robustness as contamination RESPONSE: spiking the trailing days
    // moves the robust estimator by a fraction of what it does to OLS
    // (trailing contamination has maximal OLS leverage; TS's median
    // absorbs it while contaminated pairs stay a minority)
    val clean = dailyRaw.toSeq.sortBy(_._1)
      .map { case (d, n) => (d - dmin, n) }
    val cleanSlopes = for {
      i <- clean.indices; j <- i + 1 until clean.length
    } yield (clean(j)._2 - clean(i)._2) * 1000 /
      (clean(j)._1 - clean(i)._1)
    val tsResp = (tsSlope - medianTrunc(cleanSlopes)).abs
    val olsResp = (r.getLong(3) - olsOf(clean)).abs
    assert(tsResp * 2 < olsResp,
      s"ts response $tsResp not << ols response $olsResp")
  }

  test("q221 IVM merge equals the group-by-group replay and every group " +
      "matches its recompute, including a cross-group move") {
    val base = table(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_orderstatus",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val old = base.filter(_._1 % 3 != 0)
      .map { case (k, g, c) => (k, g, if (k % 5 == 0) c + 100 else c) }
    val cur = base.filter(_._1 % 11 != 0)
      .map { case (k, g, c) => (k, if (k % 7 == 0) "X" else g, c) }
    def agg(rows: Seq[(Long, String, Long)]): Map[String, (Long, Long)] =
      rows.groupBy(_._2).view
        .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toMap
    val aggOld = agg(old)
    val aggCur = agg(cur)
    val rows = run("q221_incremental_agg_maintenance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getString(0)
      val (nOld, cOld) = aggOld.getOrElse(g, (0L, 0L))
      val (nCur, cCur) = aggCur.getOrElse(g, (0L, 0L))
      assert(r.getLong(1) == nOld, s"n_old for $g")
      assert(r.getLong(3) == nCur && r.getLong(4) == nCur, s"n for $g")
      assert(r.getLong(5) == cCur && r.getLong(6) == cCur, s"cents for $g")
      assert(r.getLong(3) == nOld + r.getLong(2), s"ivm identity for $g")
      assert(r.getBoolean(7), s"ivm_matches for $g")
      val _ = cOld
    }
    // the fixture's cross-group move materialized: a group born entirely
    // from the delta
    val x = rows.find(_.getString(0) == "X")
    assert(x.exists(r => r.getLong(1) == 0 && r.getLong(3) > 0))
    assert(rows.map(_.getString(0)).toSet == (aggOld.keySet ++ aggCur.keySet))
  }

  test("q222 Benford shares equal the naive digit replay, partition the " +
      "corpus, and the synthetic prices deviate hard from Benford") {
    val cents = table(spark, sf, "orders")
      .selectExpr("CAST(floor(o_totalprice * 100) AS BIGINT) AS c")
      .collect().map(_.getLong(0))
    val expected = cents.groupBy(_.toString.head.asDigit.toLong).view
      .mapValues(_.length.toLong).toMap
    val rows = run("q222_benford_digit_audit").collect()
    assert(rows.map(_.getLong(1)).sum == cents.length.toLong)
    val benford = Map(1L -> 301030L, 2L -> 176091L, 3L -> 124939L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66947L, 7L -> 57992L,
      8L -> 51153L, 9L -> 45757L)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == expected.getOrElse(d, 0L), s"count digit $d")
      assert(r.getLong(2) == r.getLong(1) * 1000000L / cents.length)
      assert(r.getLong(3) == benford(d))
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
    // teeth: uniform-ish synthetic prices are NOT Benford — the audit
    // must measure a large L1 gap, not vacuously pass everything
    assert(rows.map(_.getLong(4).abs).sum > 100000L)
  }
}
