package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the smoothing/span/quantization wave
  * (q229 Good–Turing, q230 cross-doc duplicated spans, q231 int8
  * quantization): the GT identity Σ r·N_r = N and the full estimator
  * table are replayed from collected tokens; the duplicated-span audit
  * is recomputed with a literal rolling-window scan; the quantizer is
  * replayed per component and its level-envelope and step-bound
  * guarantees are asserted row by row.
  */
class GtSpanQuantSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private def toks(t: String): Array[String] =
    t.trim.toLowerCase.split("\\s+")

  test("q229: the GT identity holds and the estimator table equals a " +
      "from-scratch replay over collected tokens") {
    val rows = run("q229_good_turing").collect()
    assert(rows.nonEmpty)
    val allToks = table(spark, sf, "documents")
      .select("text").collect().flatMap { r =>
        val ws = toks(r.getString(0))
        if (ws.length < 2) Seq.empty
        else (0 to ws.length - 2).map(i => s"${ws(i)} ${ws(i + 1)}")
      }
    val counts = allToks.groupBy(identity).view.mapValues(_.size.toLong)
    val ff = counts.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val nTok = allToks.length.toLong
    val nTypes = counts.size.toLong
    // the GT identity: Σ r·N_r = corpus token count
    assert(ff.map { case (r, n) => r * n }.sum == nTok)
    rows.foreach { row =>
      val r = row.getAs[Long]("r")
      assert(row.getAs[Long]("n_r") == ff(r))
      assert(row.getAs[Long]("n_tok") == nTok)
      assert(row.getAs[Long]("n_types") == nTypes)
      ff.get(r + 1) match {
        case Some(n1) =>
          assert(row.getAs[Long]("n_r1") == n1)
          assert(row.getAs[Long]("rstar_micro") ==
            (r + 1) * n1 * 1000000L / ff(r))
        case None =>
          assert(row.isNullAt(row.fieldIndex("n_r1")))
      }
      assert(row.getAs[Long]("mass_ppm") == r * ff(r) * 1000000L / nTok)
    }
    // the unseen-mass estimate is the r=1 raw mass share — present and
    // nonzero on natural text
    val r1 = rows.find(_.getAs[Long]("r") == 1L).get
    assert(r1.getAs[Long]("mass_ppm") > 0L)
  }

  test("q230: the per-source duplicated-span audit equals a literal " +
      "rolling-window replay") {
    val rows = run("q230_dup_span_share").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val wins = docs.flatMap { case (id, src, t) =>
      val ws = toks(t)
      if (ws.length < 5) Seq.empty
      else (0 to ws.length - 5).map(i =>
        (id, src, h32(ws.slice(i, i + 5).mkString(" "))))
    }
    val dup = wins.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.size).filter(_._2 >= 2).keySet.toSet
    val perDoc = wins.groupBy(w => (w._1, w._2)).map { case ((id, src), g) =>
      val nWin = g.length.toLong
      val nDup = g.count(w => dup(w._3)).toLong
      (id, src, nWin, nDup)
    }
    val expected = perDoc.groupBy(_._2).map { case (src, g) =>
      val nW = g.map(_._3).sum; val nD = g.map(_._4).sum
      src -> (g.size.toLong, nW, nD,
        g.count(d => d._4 * 10000L / d._3 >= 5000L).toLong,
        nD * 10000L / nW)
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val e = expected(r.getAs[String]("source"))
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_windows"),
        r.getAs[Long]("n_dup_windows"),
        r.getAs[Long]("n_docs_majority_dup"),
        r.getAs[Long]("dup_share_bp")) == e)
    }
    // teeth: cross-doc duplicated spans exist in this corpus
    assert(rows.map(_.getAs[Long]("n_dup_windows")).sum > 0L)
  }

  test("q231: per-dimension replay, int8 level envelope, and the step " +
      "bound hold on every row") {
    val rows = run("q231_affine_quant_audit").collect()
    assert(rows.length == 64)
    val comps = table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .flatMap { r =>
        val v = r.getSeq[Float](1)
        v.indices.map(i =>
          (i, math.floor(v(i).toDouble * 1000).toLong))
      }
    val byDim = comps.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val i = r.getAs[Int]("i")
      val xs = byDim(i)
      val mn = xs.min; val mx = xs.max
      val rg = math.max(mx - mn, 1L)
      val qs = xs.map(x => (x - mn) * 254L / rg - 127L)
      val errs = xs.map { x =>
        val q = (x - mn) * 254L / rg - 127L
        math.abs(x - ((q + 127L) * rg / 254L + mn))
      }
      assert(r.getAs[Long]("mn") == mn && r.getAs[Long]("mx") == mx)
      assert(r.getAs[Long]("min_q") == qs.min)
      assert(r.getAs[Long]("max_q") == qs.max)
      assert(r.getAs[Long]("sum_err_milli") == errs.sum)
      assert(r.getAs[Long]("max_err_milli") == errs.max)
      // the int8 envelope: every level in [-127, 127]
      assert(r.getAs[Long]("min_q") >= -127L)
      assert(r.getAs[Long]("max_q") <= 127L)
      // the quantization-step bound: max error never exceeds
      // range DIV 254 + 1
      assert(r.getAs[Long]("max_err_milli") <= r.getAs[Long]("step_milli"))
    }
  }
}
