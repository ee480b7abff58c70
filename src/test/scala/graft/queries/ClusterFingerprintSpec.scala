package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the cluster-quality/fingerprint wave:
  * q241 Davies–Bouldin, q243 winnowing fingerprints, q244 silhouette.
  * Each query's full output relation is replayed from the raw tables in
  * pure Scala (same quantization, same truncating integer divisions) —
  * the class of analysis-time failure that shipped q241 broken in round
  * 8 cannot pass this suite, and neither can a semantic drift the
  * DuckDB twin happens to share.
  */
class ClusterFingerprintSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private lazy val vecs: Seq[(Long, Array[Float], Long)] =
    table(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getInt(2).toLong)).toSeq

  /** The shared micro quantization: floor((x+1)·1000)·1000 as Long. */
  private def quant(x: Float): Long =
    (math.floor((x.toDouble + 1.0) * 1000) * 1000).toLong

  test("q241: Davies–Bouldin replays exactly from the raw vectors") {
    val rows = run("q241_davies_bouldin_audit").collect()
    assert(rows.nonEmpty)
    val byLabel = vecs.groupBy(_._3)
    val dims = vecs.head._2.length
    // centroids in micro units, floor division (non-negative operands)
    val cent: Map[Long, Array[Long]] = byLabel.view.mapValues { vs =>
      Array.tabulate(dims) { i =>
        vs.map(v => quant(v._2(i))).sum / vs.size
      }
    }.toMap
    val s2: Map[Long, (Long, Long)] = byLabel.view.mapValues { vs =>
      val c = cent(vs.head._3)
      val ss = vs.map(v =>
        (0 until dims).map { i =>
          val d = quant(v._2(i)) - c(i); d * d
        }.sum).sum
      (ss / vs.size, vs.size.toLong)
    }.toMap
    val labels = byLabel.keys.toSeq.sorted
    val expect = labels.map { la =>
      val cands = labels.filter(_ != la).map { lb =>
        val d2c = (0 until dims).map { i =>
          val d = cent(la)(i) - cent(lb)(i); d * d
        }.sum
        val rbp = (s2(la)._1 + s2(lb)._1) * 10000L / math.max(d2c, 1L)
        (rbp, lb)
      }
      val (rbp, lb) = cands.maxBy { case (r, l) => (r, -l) }
      (la, s2(la)._2, s2(la)._1, lb, rbp)
    }
    val dbMean = expect.map(_._5).sum / expect.size
    val got = rows.map(r => (r.getAs[Long]("label"), r.getAs[Long]("n"),
      r.getAs[Long]("s2q"), r.getAs[Long]("worst_label"),
      r.getAs[Long]("r_bp"), r.getAs[Long]("db_mean_bp"))).toSeq
    assert(got == expect.map(e => (e._1, e._2, e._3, e._4, e._5, dbMean)))
  }

  test("q243: winnowing fingerprints replay exactly (min-of-window, " +
      "rightmost tie, pos-encoded dedup)") {
    val rows = run("q243_winnowing_fingerprints").collect()
    assert(rows.nonEmpty)
    val k = 5; val w = 4
    val docs = table(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    case class D(src: String, nw: Long, fps: Set[Long])
    val perDoc = docs.flatMap { case (_, src, text) =>
      // Spark's trim strips SPACES only — replicate exactly, not .trim
      val lt = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse.toLowerCase
      if (lt.length < k + w - 1) None else {
        val hs = Array.tabulate(lt.length - k + 1)(i =>
          hash32(lt.substring(i, i + k)))
        val fps = (0 until hs.length - w + 1).map { i0 =>
          val win = hs.slice(i0, i0 + w)
          val minv = win.min
          // rightmost 1-based gram position carrying the min
          val j = (i0 until i0 + w).filter(hs(_) == minv).max + 1
          j * 4294967296L + minv
        }.toSet
        Some(D(src, (hs.length - w + 1).toLong, fps))
      }
    }
    val expect = perDoc.groupBy(_.src).map { case (src, ds) =>
      val hcounts = ds.zipWithIndex
        .flatMap { case (d, di) => d.fps.map(f => (f % 4294967296L, di)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val nDistinct = hcounts.size.toLong
      val nShared = hcounts.values.count(_ >= 2).toLong
      val nW = ds.map(_.nw).sum
      val nF = ds.map(_.fps.size.toLong).sum
      src -> (ds.size.toLong, nW, nF, nF * 10000 / nW, nDistinct,
        nShared, nShared * 10000 / nDistinct)
    }
    val got = rows.map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_windows"),
        r.getAs[Long]("n_fps"), r.getAs[Long]("density_bp"),
        r.getAs[Long]("n_distinct_h"), r.getAs[Long]("n_shared_h"),
        r.getAs[Long]("shared_bp"))).toMap
    assert(got == expect)
    // winnowing's density guarantee: selected positions are a strict
    // subset of windows, and at least one per window exists
    rows.foreach { r =>
      assert(r.getAs[Long]("n_fps") <= r.getAs[Long]("n_windows"))
      assert(r.getAs[Long]("density_bp") <= 10000L)
    }
  }

  test("q244: silhouette replays exactly from the sliced vectors " +
      "(sign-split division, singleton exclusion)") {
    val rows = run("q244_silhouette_audit").collect()
    assert(rows.nonEmpty)
    val slice = vecs.filter(_._1 < 200)
    val dims = slice.head._2.length
    val q = slice.map(v => (v._1, v._2.map(quant), v._3))
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until dims).map { i => val d = a(i) - b(i); d * d }.sum
    val perPoint = q.flatMap { case (va, xa, la) =>
      val others = q.filter(_._1 != va)
      val byL = others.groupBy(_._3).view.mapValues { vs =>
        vs.map(v => d2(xa, v._2)).sum / vs.size
      }.toMap
      (byL.get(la), byL.view.filterKeys(_ != la).values.minOption) match {
        case (Some(ai), Some(bi)) =>
          val sbp = if (bi >= ai) (bi - ai) * 10000 / math.max(bi, 1L)
          else -((ai - bi) * 10000 / math.max(ai, 1L))
          Some((la, sbp))
        case _ => None
      }
    }
    val expect = perPoint.groupBy(_._1).view.mapValues { ss =>
      val vals = ss.map(_._2)
      val sum = vals.sum
      val mean = if (sum >= 0) sum / vals.size
      else -((-sum) / vals.size)
      (vals.size.toLong, mean, vals.min, vals.max)
    }.toMap
    val got = rows.map(r => r.getAs[Long]("label") ->
      (r.getAs[Long]("n"), r.getAs[Long]("mean_s_bp"),
        r.getAs[Long]("min_s_bp"), r.getAs[Long]("max_s_bp"))).toMap
    assert(got == expect)
    // silhouette values live in [-10000, 10000] by construction
    rows.foreach { r =>
      assert(r.getAs[Long]("min_s_bp") >= -10000L)
      assert(r.getAs[Long]("max_s_bp") <= 10000L)
    }
  }
}
