package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the layout/surface wave: q294 Hilbert
  * layout audit (the curve itself is verified MATHEMATICALLY — bijection
  * over the full 256×256 grid and unit grid-adjacency of consecutive
  * indices, properties no wrong unrolling can fake — plus a scratch
  * replay of the full audit ledger with real bit operations, a different
  * spelling than the SQL arithmetic), and q295 LATERAL top-k (scratch
  * per-nation top-2 replay + a plan check that the correlated subquery
  * decorrelated rather than degenerating into a cartesian).
  */
class CurveLayoutSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Canonical Wikipedia xy2d with genuine bit operations. */
  private def hilbert(x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 255 - x; y = 255 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private def morton(x: Long, y: Long): Long =
    (0 until 8).map { k =>
      (((x >> k) & 1) << (2 * k)) | (((y >> k) & 1) << (2 * k + 1))
    }.sum

  test("q294: the Hilbert index is a bijection with unit-step " +
      "grid adjacency, and the audit ledger replays from scratch") {
    // mathematical properties over the FULL grid
    val cells = for (x <- 0L until 256L; y <- 0L until 256L)
      yield (x, y, hilbert(x, y))
    assert(cells.map(_._3).distinct.size === 65536)
    assert(cells.map(_._3).min === 0L)
    assert(cells.map(_._3).max === 65535L)
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Seq(a, b) =>
      assert((a._1 - b._1).abs + (a._2 - b._2).abs === 1,
        s"curve jump at d=${a._3}")
    }
    // scratch audit replay
    val rows = run("q294_hilbert_layout_audit").collect()
      .sortBy(_.getAs[String]("layout"))
    assert(rows.length === 3)
    val li = table(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (mnp, mxp) = (li.map(_._1).min, li.map(_._1).max)
    val (mns, mxs) = (li.map(_._2).min, li.map(_._2).max)
    val pts = li.map { case (pk, sk) =>
      ((pk - mnp) * 255 / math.max(mxp - mnp, 1),
        (sk - mns) * 255 / math.max(mxs - mns, 1))
    }
    def audit(key: ((Long, Long)) => Long)
        : (Long, Long, Long, Long, Long) = {
      val sorted = pts.sortBy(p => (key(p), p._1, p._2))
      val files = sorted.grouped(256).toSeq
      val hitF = files.filter(f =>
        f.map(_._1).min <= 159 && f.map(_._1).max >= 64 &&
          f.map(_._2).min <= 159 && f.map(_._2).max >= 64)
      def tc(f: Seq[(Long, Long)]) = f.count(p =>
        p._1 >= 64 && p._1 <= 159 && p._2 >= 64 && p._2 <= 159)
      (files.length.toLong, hitF.length.toLong,
        hitF.count(f => tc(f) == 0).toLong,
        hitF.map(_.length.toLong).sum,
        files.map(f => tc(f).toLong).sum)
    }
    val expected = Seq(
      "a_linear" -> audit(p => p._1 * 256 + p._2),
      "b_zorder" -> audit(p => morton(p._1, p._2)),
      "c_hilbert" -> audit(p => hilbert(p._1, p._2)))
    rows.zip(expected).foreach {
      case (r, (layout, (ft, fs, ffp, rs, rm))) =>
        assert(r.getAs[String]("layout") === layout)
        assert(r.getAs[Long]("files_total") === ft, s"ft $layout")
        assert(r.getAs[Long]("files_scanned") === fs, s"fs $layout")
        assert(r.getAs[Long]("files_false_pos") === ffp, s"ffp $layout")
        assert(r.getAs[Long]("rows_scanned") === rs, s"rs $layout")
        assert(r.getAs[Long]("rows_matching") === rm, s"rm $layout")
        assert(r.getAs[Long]("pruned_bp") === (ft - fs) * 10000 / ft)
    }
    // teeth: all layouts agree on ground truth, scans sandwich between
    // matching rows and the corpus, and zone pruning is real somewhere.
    // (The hilbert-beats-linear ordering holds at sf0.01+ — at this
    // spec's sf0.001 the grid is too sparsely covered for the curve to
    // win, which is itself a finding the audit surfaces — so the
    // ordering is deliberately NOT asserted here.)
    assert(rows.map(_.getAs[Long]("rows_matching")).distinct.length === 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >=
        r.getAs[Long]("rows_matching"))
      assert(r.getAs[Long]("files_scanned") <=
        r.getAs[Long]("files_total"))
    }
    assert(rows.exists(_.getAs[Long]("pruned_bp") >= 3000L))
  }

  test("q295: LATERAL top-k replays per nation and decorrelates " +
      "(no cartesian product)") {
    val df = run("q295_lateral_topk")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nations = table(spark, sf, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val cust = table(spark, sf, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue,
        math.round(r.getDouble(2) * 100)))
    val expected = cust.groupBy(_._2).toSeq.flatMap { case (nk, cs) =>
      cs.sortBy(c => (-c._3, c._1)).take(2)
        .map(c => (nations(nk), c._1, c._3))
    }.sortBy { case (n, ck, bal) => (n, -bal, ck) }
    assert(rows.length === expected.length)
    rows.zip(expected).foreach { case (r, (n, ck, bal)) =>
      assert(r.getAs[String]("n_name") === n)
      assert(r.getAs[Number]("c_custkey").longValue === ck,
        s"custkey in $n")
      assert(r.getAs[Long]("acctbal_c") === bal, s"acctbal in $n")
    }
    // per-nation cardinality: exactly 2 where the nation has ≥2 custs
    val perNation = rows.groupBy(_.getAs[String]("n_name"))
    assert(perNation.values.forall(_.length <= 2))
    assert(perNation.values.exists(_.length == 2))
    // the correlated LATERAL must decorrelate into a join, not a
    // nested/cartesian per-row scan
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), phys.take(2000))
  }
}
