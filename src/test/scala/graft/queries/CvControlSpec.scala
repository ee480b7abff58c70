package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the CV/control wave: q283 k-fold CV by
  * moment subtraction (BigInt replay of the whole fold→subtract→Cramer→
  * score pipeline), q284 EWMA control chart (replayed with the
  * SEQUENTIAL recursion N_t = 7·N_{t-1} + 8^{t-2}·x_t — a different
  * evaluation order than the query's closed-form weighted sum, so
  * agreement is an algebraic identity check).
  */
class CvControlSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  private def sdiv(v: BigInt, d: BigInt): BigInt =
    if (v.signum >= 0) v / d else -((-v) / d)

  test("q283: out-of-fold coefficients and SSE replay from BigInt " +
      "moment subtraction") {
    val rows = run("q283_kfold_cv_moments").collect()
    assert(rows.length === 4)
    val data = table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        val fold = java.lang.Long.parseLong(
          md5hex(r.getLong(0).toString).substring(0, 8), 16) % 4
        (fold,
          BigInt(math.floor(v(0) * 1000.0).toLong),
          BigInt(math.floor(v(1) * 1000.0).toLong),
          BigInt(math.floor(v(2) * 1000.0).toLong))
      }
    def mom(g: Seq[(Long, BigInt, BigInt, BigInt)]) = Seq(
      BigInt(g.length), g.map(_._2).sum, g.map(_._3).sum,
      g.map(_._4).sum, g.map(t => t._2 * t._2).sum,
      g.map(t => t._3 * t._3).sum, g.map(t => t._2 * t._3).sum,
      g.map(t => t._2 * t._4).sum, g.map(t => t._3 * t._4).sum)
    val total = mom(data.toSeq)
    def det3(m: Seq[BigInt]): BigInt =
      m(0) * (m(4) * m(8) - m(5) * m(7)) -
        m(1) * (m(3) * m(8) - m(5) * m(6)) +
        m(2) * (m(3) * m(7) - m(4) * m(6))
    rows.foreach { r =>
      val f = r.getAs[Long]("fold")
      val g = data.filter(_._1 == f).toSeq
      val t = total.zip(mom(g)).map { case (a, b) => a - b }
      val Seq(n, s1, s2, sy, s11, s22, s12, s1y, s2y) = t
      val det = det3(Seq(n, s1, s2, s1, s11, s12, s2, s12, s22))
      val d0 = det3(Seq(sy, s1, s2, s1y, s11, s12, s2y, s12, s22))
      val d1 = det3(Seq(n, sy, s2, s1, s1y, s12, s2, s2y, s22))
      val d2 = det3(Seq(n, s1, sy, s1, s11, s1y, s2, s12, s2y))
      val b0 = sdiv(d0 * 1000000, det)
      val b1 = sdiv(d1 * 1000000, det)
      val b2 = sdiv(d2 * 1000000, det)
      assert(r.getAs[Long]("n_test") === g.length.toLong)
      assert(r.getAs[Long]("b0_micro") === b0.toLong, s"b0 fold $f")
      assert(r.getAs[Long]("b1_micro") === b1.toLong, s"b1 fold $f")
      assert(r.getAs[Long]("b2_micro") === b2.toLong, s"b2 fold $f")
      val sse = g.map { case (_, x1, x2, y) =>
        val yhat = b0 + sdiv(b1 * x1 + b2 * x2, BigInt(1000))
        val resid = y * 1000 - yhat
        resid * resid
      }.sum
      assert(r.getAs[Long]("sse_micro2") === sse.toLong, s"sse fold $f")
      assert(r.getAs[Long]("mse_micro2") ===
        (sse / g.length).toLong)
    }
    // teeth: folds see different training sets, so coefficients differ
    assert(rows.map(_.getAs[Long]("b1_micro")).distinct.length > 1)
  }

  test("q284: closed-form EWMA equals the sequential recursion and " +
      "flags replay") {
    val rows = run("q284_ewma_control_chart").collect()
      .sortBy(_.getAs[Long]("t"))
    assert(rows.nonEmpty)
    val days = rows.map(r => (r.getAs[Long]("t"), r.getAs[Long]("x")))
    // independent daily counts from raw events
    val fromRaw = table(spark, sf, "events").collect()
      .map { r =>
        val ts = r.get(r.fieldIndex("ts")) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case t: java.time.LocalDateTime => t
        }
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse("2024-01-01"), ts.toLocalDate) + 1
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(days.toMap === fromRaw)
    // sequential recursion N_t = 7 N_{t-1} + 8^{t-2} x_t (N_1 = x_1),
    // run over the FULL day range with x = 0 on gap days — algebraically
    // identical to the query's closed-form weighted sum over existing
    // days (missing days contribute nothing to either)
    val byT = days.toMap
    val maxT = days.map(_._1).max.toInt
    var nPrev = BigInt(0)
    val ewmaAll = (1 to maxT).map { t =>
      val x = byT.getOrElse(t.toLong, 0L)
      nPrev =
        if (t == 1) BigInt(x)
        else BigInt(7) * nPrev + BigInt(8).pow(t - 2) * BigInt(x)
      (nPrev / BigInt(8).pow(t - 1)).toLong
    }
    val ewmaSeq = days.map(d => ewmaAll(d._1.toInt - 1))
    val xs = days.map(_._2).sorted
    val n = xs.length
    val med = xs((n + 1) / 2 - 1)
    val devs = days.map(d => (d._2 - med).abs).sorted
    val mad = math.max(devs((n + 1) / 2 - 1), 1L)
    rows.zipWithIndex.foreach { case (r, i) =>
      val t = r.getAs[Long]("t")
      assert(r.getAs[Long]("ewma") === ewmaSeq(i), s"ewma at t=$t")
      assert(r.getAs[Long]("mad") === mad)
      // prev is defined only when day t-1 EXISTS (the query's equi-join)
      val expPrev =
        if (byT.contains(t - 1)) ewmaAll(t.toInt - 2) else -1L
      assert(r.getAs[Long]("ewma_prev") === expPrev)
      val expFlag =
        if (expPrev >= 0 &&
          (r.getAs[Long]("x") - expPrev).abs > 3 * mad) 1L
        else 0L
      assert(r.getAs[Long]("flag") === expFlag, s"flag at t=$t")
    }
    // smoothing sanity: every EWMA value lies within the observed range
    val (mn, mx) = (days.map(_._2).min, days.map(_._2).max)
    assert(ewmaSeq.forall(e => e >= mn - 1 && e <= mx + 1))
  }
}
