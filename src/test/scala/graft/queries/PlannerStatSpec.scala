package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the planner-audit / reweighting wave:
  * q258 selectivity independence, q259 equi-depth histogram estimate,
  * q260 IPF raking, q261 Wasserstein drift, q262 blocking quality,
  * q263 conformal coverage. Each query's output relation is replayed
  * from the raw parquet in pure Scala (same md5 hashing, same
  * truncating integer division) — the third implementation that
  * catches semantic drift shared by the Spark program and its DuckDB
  * twin.
  */
class PlannerStatSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def hash32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private lazy val li = table(spark, sf, "lineitem")
    .select("l_quantity", "l_discount", "l_extendedprice").collect()
    .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))

  private lazy val docs = table(spark, sf, "documents")
    .select("doc_id", "text", "lang", "source", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4)))

  test("q258: marginal/joint counts and the independence estimate " +
      "replay from a scratch scan") {
    val rows = run("q258_selectivity_independence_audit").collect()
    assert(rows.length === 2)
    val n = li.length.toLong
    val cq = li.count(_._1 < 25).toLong
    val cd = li.count(_._2 >= 0.05).toLong
    val cp = li.count(_._3 > 30000).toLong
    val cqd = li.count(t => t._1 < 25 && t._2 >= 0.05).toLong
    val cqp = li.count(t => t._1 < 25 && t._3 > 30000).toLong
    val expect = Map(
      "qty_disc" -> (cq, cd, cqd),
      "qty_price" -> (cq, cp, cqp))
    rows.foreach { r =>
      val (c1, c2, exact) = expect(r.getAs[String]("pred_pair"))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("c1") === c1)
      assert(r.getAs[Long]("c2") === c2)
      assert(r.getAs[Long]("exact_rows") === exact)
      val est = c1 * c2 / n
      assert(r.getAs[Long]("est_rows") === est)
      assert(r.getAs[Long]("err_bp") ===
        math.abs(est - exact) * 10000 / exact)
    }
  }

  test("q259: compressed equi-depth histogram estimates replay from a " +
      "scratch value-frequency map") {
    val rows = run("q259_histogram_selectivity_audit").collect()
    assert(rows.length === 3)
    val freq = li.groupBy(t => math.round(t._3 * 100))
      .view.mapValues(_.length.toLong).toMap
    val n = li.length.toLong
    val sorted = freq.toSeq.sortBy(_._1)
    var cum = 0L
    val hist = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)] // bucket -> (bmin, bmax, bcnt)
    sorted.foreach { case (v, c) =>
      val b = cum * 16 / n
      val (mn, mx, ct) = hist.getOrElse(b, (Long.MaxValue, Long.MinValue, 0L))
      hist(b) = (math.min(mn, v), math.max(mx, v), ct + c)
      cum += c
    }
    val ranges = Map("r1_low" -> (500000L, 2000000L),
      "r2_mid" -> (2000000L, 4000000L),
      "r3_high" -> (7000000L, 10500000L))
    rows.foreach { r =>
      val (lo, hi) = ranges(r.getAs[String]("range_name"))
      val exact = sorted.collect {
        case (v, c) if v >= lo && v < hi => c }.sum
      val est = hist.values.map { case (bmin, bmax, bcnt) =>
        val covered = math.max(0L,
          math.min(hi - 1, bmax) - math.max(lo, bmin) + 1)
        bcnt * covered / (bmax - bmin + 1)
      }.sum
      assert(r.getAs[Long]("exact_rows") === exact,
        s"exact ${r.getAs[String]("range_name")}")
      assert(r.getAs[Long]("est_rows") === est,
        s"est ${r.getAs[String]("range_name")}")
      assert(r.getAs[Long]("err_bp") ===
        math.abs(est - exact) * 10000 / exact)
    }
  }

  test("q260: the four-step IPF weight trajectory replays in BigInt " +
      "and the final language margins hit their targets") {
    val rows = run("q260_ipf_raking").collect()
    val cells = docs.groupBy(d => (d._4, d._3))
      .view.mapValues(_.length.toLong).toMap
    assert(rows.length === cells.size)
    val n = docs.length.toLong
    val nsrc = cells.keys.map(_._1).toSet.size.toLong
    val nlang = cells.keys.map(_._2).toSet.size.toLong
    val ts = n / nsrc; val tl = n / nlang
    var w: Map[(String, String), BigInt] =
      cells.map { case (k, _) => k -> BigInt(1000000L) }
    // NOTE: w.keys is a Set — always .iterator before mapping to
    // term values, or equal terms collapse and the sum is wrong
    def scale(bySrc: Boolean, tgt: Long): Unit = {
      val margins = w.keys.groupBy(k => if (bySrc) k._1 else k._2)
        .map { case (g, ks) =>
          g -> ks.iterator.map(k => BigInt(cells(k)) * w(k)).sum }
      w = w.map { case (k, wk) =>
        k -> (wk * tgt * 1000000L / margins(if (bySrc) k._1 else k._2))
      }
    }
    scale(bySrc = true, ts); scale(bySrc = false, tl)
    scale(bySrc = true, ts); scale(bySrc = false, tl)
    val rowMargin = w.keys.groupBy(_._1).map { case (src, ks) =>
      src -> ks.iterator.map(k => BigInt(cells(k)) * w(k)).sum }
    rows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
      assert(r.getAs[Long]("c") === cells(k))
      assert(BigInt(r.getAs[Long]("w_micro")) === w(k), s"w $k")
      val gap = (rowMargin(k._1) - BigInt(ts) * 1000000L).abs *
        10000L / (BigInt(ts) * 1000000L)
      assert(BigInt(r.getAs[Long]("row_gap_bp")) === gap)
    }
    // after the final language scaling every language margin matches
    // its target to within the truncation slack of its cell count
    val langMargin = w.keys.groupBy(_._2).map { case (lg, ks) =>
      lg -> ks.iterator.map(k => BigInt(cells(k)) * w(k)).sum }
    langMargin.foreach { case (lg, m) =>
      val slack = cells.keys.count(_._2 == lg).toLong *
        cells.filter(_._1._2 == lg).values.max
      assert((BigInt(tl) * 1000000L - m) >= 0 &&
        (BigInt(tl) * 1000000L - m) <= slack, s"margin $lg")
    }
  }

  test("q261: per-source W1 replays from scratch CDF integration") {
    val rows = run("q261_wasserstein_drift").collect()
    val n = docs.length.toLong
    val bySrc = docs.groupBy(_._4)
    assert(rows.length === bySrc.size)
    val grid = docs.map(_._5).distinct.sorted
    val gaps = grid.zip(grid.drop(1).map(identity) :+ grid.last)
      .map { case (v, nx) => v -> (nx - v) }.toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ns = bySrc(src).length.toLong
      val nr = n - ns
      val sCounts = bySrc(src).groupBy(_._5)
        .view.mapValues(_.length.toLong).toMap
      val aCounts = docs.groupBy(_._5)
        .view.mapValues(_.length.toLong).toMap
      var cumS = 0L; var cumA = 0L; var emd = BigInt(0)
      grid.foreach { v =>
        cumS += sCounts.getOrElse(v, 0L); cumA += aCounts(v)
        emd += BigInt(math.abs(cumS * nr - (cumA - cumS) * ns)) *
          gaps(v)
      }
      assert(r.getAs[Long]("n_s") === ns)
      assert(r.getAs[Long]("n_rest") === nr)
      assert(BigInt(r.getAs[Long]("w1_chars")) ===
        emd / (BigInt(ns) * nr), s"w1 $src")
      assert(BigInt(r.getAs[Long]("w1_centichars")) ===
        emd * 100 / (BigInt(ns) * nr))
    }
  }

  test("q262: blocking metrics replay from scratch shingle-jaccard " +
      "truth and per-scheme key maps") {
    val rows = run("q262_blocking_quality_audit").collect()
    assert(rows.length === 3)
    val raw: Map[Long, Set[Long]] = docs.map { d =>
      val toks = d._2.trim.toLowerCase.split("\\s+")
      val sh =
        if (toks.length >= 3)
          (0 until toks.length - 2)
            .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
            .distinct.map(hash32).toSet
        else Set.empty[Long]
      d._1 -> sh
    }.toMap
    // production stop-shingle df cut (q145 setting), replayed
    val dfCut = graft.operators.CorpusPipeline.DefaultStopShingleDf
    val hot = raw.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).collect {
        case (h, occ) if occ.size > dfCut => h }.toSet
    val sets = raw.view.mapValues(_ -- hot).toMap
    val ids = docs.map(_._1).sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      if a.nonEmpty && b.nonEmpty
      inter = (a & b).size
      if inter * 1.0 / (a.size + b.size - inter) >= 0.8
    } yield (ids(i), ids(j))).toSet
    val keyFns: Map[String, ((Long, String, String, String, Long)) => String] =
      Map(
        "len50" -> (d => (d._5 / 50).toString),
        "prefix16" -> (d => d._2.trim.toLowerCase.take(16)),
        "token1" -> (d => d._2.trim.toLowerCase.split("\\s+")(0)))
    val nTotal = ids.length.toLong
    rows.foreach { r =>
      val scheme = r.getAs[String]("scheme")
      val keyOf = docs.map(d => d._1 -> keyFns(scheme)(d)).toMap
      val blocks = keyOf.values.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val cand = blocks.values.map(b => b * (b - 1) / 2).sum
      val caught = truth.count { case (a, b) => keyOf(a) == keyOf(b) }
      assert(r.getAs[Long]("n_blocks") === blocks.size.toLong)
      assert(r.getAs[Long]("cand_pairs") === cand, s"cand $scheme")
      assert(r.getAs[Long]("true_pairs") === truth.size.toLong)
      assert(r.getAs[Long]("caught_pairs") === caught.toLong,
        s"caught $scheme")
      assert(r.getAs[Long]("pc_bp") ===
        caught.toLong * 10000 / truth.size)
      assert(r.getAs[Long]("rr_bp") ===
        10000 - cand * 10000 / (nTotal * (nTotal - 1) / 2))
    }
  }

  test("q263: the conformal threshold is the exact order statistic and " +
      "held-out coverage replays") {
    val rows = run("q263_conformal_coverage").collect()
    assert(rows.nonEmpty)
    val withCal = docs.map(d =>
      (d._1, d._4, d._5, hash32(s"conf_${d._1}") % 2 == 0))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val cal = withCal.filter(d => d._2 == src && d._4)
      val tst = withCal.filter(d => d._2 == src && !d._4)
      val mu = cal.map(_._3).sum / cal.length
      val calScores = cal.map(d => math.abs(d._3 - mu)).sorted
      val k = (9 * (cal.length + 1) + 9) / 10
      val qhat = calScores(k - 1)
      val covered = tst.count(d => math.abs(d._3 - mu) <= qhat)
      assert(r.getAs[Long]("n_calib") === cal.length.toLong)
      assert(r.getAs[Long]("n_test") === tst.length.toLong)
      assert(r.getAs[Long]("k") === k.toLong)
      assert(r.getAs[Long]("qhat") === qhat)
      assert(r.getAs[Long]("coverage_bp") ===
        covered.toLong * 10000 / tst.length)
    }
  }

  test("q270: Neyman allocation replays from scratch moments and " +
      "largest-remainder apportionment; the budget is exactly spent") {
    val rows = run("q270_neyman_allocation").collect()
    assert(rows.nonEmpty)
    val bySrc = docs.groupBy(_._4).view.mapValues(_.map(_._5)).toMap
    val nAll = docs.length.toLong
    val stats = bySrc.map { case (src, xs) =>
      val nh = xs.length.toLong
      val sx = BigInt(xs.sum); val sxx = xs.map(x => BigInt(x) * x).sum
      val s2 = if (nh < 2) 0L
        else ((BigInt(nh) * sxx - sx * sx) / (BigInt(nh) * (nh - 1)))
          .toLong
      val sh = math.floor(math.sqrt(s2.toDouble)).toLong
      src -> (nh, s2, sh, nh * sh)
    }
    val tw = stats.values.map(_._4).sum
    val n0 = stats.view.mapValues { case (_, _, _, w) =>
      1000 * w / tw }.toMap
    val rem = stats.map { case (src, (_, _, _, w)) =>
      src -> 1000 * w % tw }
    val leftover = 1000 - n0.values.sum
    val ranked = rem.toSeq.sortBy { case (src, r) => (-r, src) }
      .map(_._1).zipWithIndex.toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (nh, s2, sh, _) = stats(src)
      assert(r.getAs[Long]("nh") === nh)
      assert(r.getAs[Long]("s2") === s2, s"s2 $src")
      assert(r.getAs[Long]("sh") === sh)
      val expectN = n0(src) +
        (if (ranked(src) < leftover) 1L else 0L)
      assert(r.getAs[Long]("n_neyman") === expectN, s"alloc $src")
      assert(r.getAs[Long]("n_prop") === 1000 * nh / nAll)
      assert(r.getAs[Long]("shift") === expectN - 1000 * nh / nAll)
    }
    assert(rows.map(_.getAs[Long]("n_neyman")).sum === 1000L)
  }
}
