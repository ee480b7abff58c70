package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the density/layout wave: q280 Huber IRLS
  * (scratch weighted-round replay), q281 grid-density clustering
  * (replayed with FULL union-find connected components — if the query's
  * bounded 6-round doubling closure ever failed to converge on the data,
  * this equality breaks), q282 zone-map pruning audit (scratch per-file
  * zone replay + the layout lesson itself).
  */
class DensityLayoutSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q280: Huber IRLS replays from scratch weighted rounds and " +
      "downweights real mass") {
    val rows = run("q280_huber_irls").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val xs = docs.filter(_._1 == src).map(_._2).sorted
      val n = xs.length
      val m0 = xs((n + 1) / 2 - 1)
      val devs = xs.map(x => (x - m0).abs).sorted
      val k = math.max(devs((n + 1) / 2 - 1), 1L)
      def round(m: Long): (Long, Long) = {
        val ws = xs.map(x =>
          math.min(1000000L, k * 1000000L / math.max((x - m).abs, 1L)))
        val swx = ws.zip(xs).map { case (w, x) => w * x }.sum
        val sw = ws.sum
        (swx / sw, ws.count(_ < 1000000L).toLong)
      }
      val (m1, _) = round(m0)
      val (m2, nDown) = round(m1)
      assert(r.getAs[Long]("n") === n.toLong)
      assert(r.getAs[Long]("m0") === m0)
      assert(r.getAs[Long]("m1") === m1)
      assert(r.getAs[Long]("m2") === m2)
      assert(r.getAs[Long]("n_down") === nDown)
    }
    // teeth: somewhere the estimator actually downweights points
    assert(rows.map(_.getAs[Long]("n_down")).sum > 0)
  }

  test("q281: bounded doubling closure equals full union-find CC") {
    val rows = run("q281_grid_density_clusters").collect()
    assert(rows.nonEmpty)
    val pts = table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val cx = (math.floor(v(0) * 1000.0).toLong + 1000L) / 60
        val cy = (math.floor(v(1) * 1000.0).toLong + 1000L) / 60
        (r.getLong(0), cx, cy, cx * 1000 + cy)
      }
    val cellCnt = pts.groupBy(_._4).view.mapValues(_.length).toMap
    val core = cellCnt.filter(_._2 >= 4).keySet
    // full union-find over 8-neighbor core adjacency
    val parent = scala.collection.mutable.Map(core.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    for (c <- core; dx <- -1 to 1; dy <- -1 to 1) {
      val nb = c + dx * 1000 + dy
      if (core.contains(nb)) {
        val (ra, rb) = (find(c), find(nb))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val lbl = core.map(c => c -> find(c)).toMap
    val clusters = pts.filter(p => core.contains(p._4))
      .groupBy(p => lbl(p._4))
    val noisePts = pts.filterNot(p => core.contains(p._4))
    val expect =
      clusters.map { case (l, g) =>
        (l, g.map(_._4).distinct.length.toLong, g.length.toLong)
      }.toSeq.sortBy(_._1) :+
        ((-1L, noisePts.map(_._4).distinct.length.toLong,
          noisePts.length.toLong))
    val got = rows.map(r => (r.getAs[Long]("lbl"),
      r.getAs[Long]("n_cells"), r.getAs[Long]("n_points"))).toSeq
      .sortBy(_._1)
    assert(got === expect.sortBy(_._1))
    // teeth: every point is either clustered or noise, none dropped
    assert(got.map(_._3).sum === pts.length.toLong)
  }

  test("q282: zone-map audit replays from scratch file zones and " +
      "clustering beats natural layout") {
    val rows = run("q282_zonemap_pruning_audit").collect()
    assert(rows.length === 2)
    import java.time.LocalDateTime
    val lo = LocalDateTime.parse("1996-03-01T00:00:00")
    val hi = LocalDateTime.parse("1996-04-01T00:00:00")
    val o = table(spark, sf, "orders")
      .select("o_orderkey", "o_orderdate").collect()
      .map { r =>
        val d = r.get(1) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case t: LocalDateTime => t
        }
        (r.getLong(0), d)
      }
    def audit(fid: Seq[(Long, LocalDateTime)] => Seq[Long]) = {
      val fids = fid(o)
      val files = o.zip(fids).groupBy(_._2).map { case (_, g) =>
        val ds = g.map(_._1._2)
        val mn = ds.minBy(_.toString); val mx = ds.maxBy(_.toString)
        val hit = mn.isBefore(hi) && !mx.isBefore(lo)
        val tc = ds.count(d => !d.isBefore(lo) && d.isBefore(hi))
        (hit, tc, g.length)
      }
      (files.size.toLong, files.count(_._1).toLong,
        files.count(_._2 > 0).toLong,
        files.count(f => f._1 && f._2 == 0).toLong,
        files.filter(_._1).map(_._3.toLong).sum,
        files.map(_._2.toLong).sum)
    }
    val nat = audit(os => os.map(_._1 / 1000))
    val clu = audit { os =>
      val order = os.zipWithIndex
        .sortBy { case ((k, d), _) => (d.toString, k) }
        .map(_._2).zipWithIndex.sortBy(_._1).map(_._2.toLong / 1000)
      order
    }
    val byLayout = rows.map(r => r.getAs[String]("layout") -> r).toMap
    Seq("natural" -> nat, "clustered" -> clu).foreach { case (name, e) =>
      val r = byLayout(name)
      assert(r.getAs[Long]("files_total") === e._1, s"$name total")
      assert(r.getAs[Long]("files_scanned") === e._2, s"$name scanned")
      assert(r.getAs[Long]("files_true") === e._3, s"$name true")
      assert(r.getAs[Long]("files_false_pos") === e._4, s"$name fp")
      assert(r.getAs[Long]("rows_scanned") === e._5, s"$name rows")
      assert(r.getAs[Long]("rows_matching") === e._6, s"$name match")
      assert(r.getAs[Long]("pruned_bp") === (e._1 - e._2) * 10000 / e._1)
    }
    // the layout lesson: sort-on-write prunes strictly more
    assert(byLayout("clustered").getAs[Long]("pruned_bp") >
      byLayout("natural").getAs[Long]("pruned_bp"))
  }
}
