package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the valuation/correlation/survival wave:
  * q285 Shapley data valuation (full BigInt replay of the subset→Cramer→
  * closed-form-SSE→Shapley pipeline, PLUS a per-row residual SSE check —
  * the closed form agreeing with the direct per-document sum is the
  * algebraic identity the query rests on), q286 Spearman (doubled average
  * ranks assigned per document, a different construction than the query's
  * value-compressed frame), q287 Nelson–Aalen (sequential risk-set scan).
  */
class ValuationSurvivalSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  private def sdiv(v: BigInt, d: BigInt): BigInt =
    if (v.signum >= 0) v / d else -((-v) / d)

  private def tsMicros(r: org.apache.spark.sql.Row, field: String): Long =
    r.get(r.fieldIndex(field)) match {
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      case t: java.time.LocalDateTime =>
        java.time.temporal.ChronoUnit.MICROS.between(
          java.time.LocalDateTime.of(1970, 1, 1, 0, 0), t)
    }

  test("q285: Shapley values replay from BigInt subset moments and the " +
      "closed-form SSE equals the direct per-row sum") {
    val rows = run("q285_shapley_data_value").collect()
    assert(rows.length === 4)
    val docs = table(spark, sf, "documents")
      .select("source", "n_chars", "text").collect()
      .map { r =>
        val ts = toks(r.getString(2))
        (r.getString(0), BigInt(r.getLong(1)),
          BigInt(ts.length), BigInt(ts.distinct.length))
      }
    // group assignment: top-3 sources by doc count (count desc, name asc)
    val bySrc = docs.groupBy(_._1).view.mapValues(_.length).toMap
    val top3 = bySrc.toSeq.sortBy { case (s0, n) => (-n, s0) }
      .take(3).map(_._1)
    def gid(src: String): Int = {
      val i = top3.indexOf(src); if (i >= 0) i else 3
    }
    def mom(g: Seq[(String, BigInt, BigInt, BigInt)]) = Seq(
      BigInt(g.length), g.map(_._2).sum, g.map(_._3).sum,
      g.map(_._4).sum, g.map(t => t._2 * t._2).sum,
      g.map(t => t._3 * t._3).sum, g.map(t => t._2 * t._3).sum,
      g.map(t => t._2 * t._4).sum, g.map(t => t._3 * t._4).sum,
      g.map(t => t._4 * t._4).sum)
    val gmom = (0 to 3).map(g => mom(docs.filter(d => gid(d._1) == g)))
    val fullM = mom(docs.toSeq)
    def det3(m: Seq[BigInt]): BigInt =
      m(0) * (m(4) * m(8) - m(5) * m(7)) -
        m(1) * (m(3) * m(8) - m(5) * m(6)) +
        m(2) * (m(3) * m(7) - m(4) * m(6))
    // per-subset coefficients and full-corpus SSE (closed form)
    val M = BigInt(1000000)
    def coefs(m: Int): (BigInt, BigInt, BigInt) = {
      val t = (0 to 9).map(j =>
        (0 to 3).filter(g => ((m >> g) & 1) == 1).map(gmom(_)(j)).sum)
      val Seq(n, s1, s2, sy, s11, s22, s12, s1y, s2y, _) = t
      val det = det3(Seq(n, s1, s2, s1, s11, s12, s2, s12, s22))
      if (det == 0) (BigInt(0), BigInt(0), BigInt(0))
      else (
        sdiv(det3(Seq(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)) * M, det),
        sdiv(det3(Seq(n, sy, s2, s1, s1y, s12, s2, s2y, s22)) * M, det),
        sdiv(det3(Seq(n, s1, sy, s1, s11, s1y, s2, s12, s2y)) * M, det))
    }
    def sseClosed(b: (BigInt, BigInt, BigInt)): BigInt = {
      val Seq(n, s1, s2, sy, s11, s22, s12, s1y, s2y, syy) = fullM
      syy * M * M - 2 * M * (b._1 * sy + b._2 * s1y + b._3 * s2y) +
        b._1 * b._1 * n + b._2 * b._2 * s11 + b._3 * b._3 * s22 +
        2 * (b._1 * b._2 * s1 + b._1 * b._3 * s2 + b._2 * b._3 * s12)
    }
    val v = (0 to 15).map(m => sseClosed(coefs(m)))
    // identity check: closed form == direct per-row residual sum, on the
    // full model and on one singleton model
    for (m <- Seq(15, 1)) {
      val b = coefs(m)
      val direct = docs.map { case (_, x1, x2, y) =>
        val r = y * M - (b._1 + b._2 * x1 + b._3 * x2)
        r * r
      }.sum
      assert(direct === v(m), s"closed-form SSE identity, subset $m")
    }
    val weight = Seq(6, 2, 2, 6)
    val phi24 = (0 to 3).map { g =>
      (0 to 15).filter(m => ((m >> g) & 1) == 0).map { m =>
        val s0 = Integer.bitCount(m)
        BigInt(weight(s0)) * (v(m) - v(m | (1 << g)))
      }.sum
    }
    // efficiency axiom, exact: Σ 24φ = 24(v(∅) − v(full))
    assert(phi24.sum === 24 * (v(0) - v(15)))
    val T = BigInt("1000000000000")
    rows.foreach { r =>
      val g = r.getAs[Long]("gid").toInt
      val nd = docs.count(d => gid(d._1) == g)
      assert(r.getAs[Long]("n_docs") === nd.toLong)
      assert(r.getAs[String]("grp") ===
        (if (g < 3) top3(g) else "(other)"))
      assert(r.getAs[Long]("sse_own_u2") ===
        sdiv(v(1 << g), T).toLong, s"sse_own gid $g")
      assert(r.getAs[Long]("phi24_u2") ===
        sdiv(phi24(g), T).toLong, s"phi24 gid $g")
      assert(r.getAs[Long]("eff_gap") === 0L)
    }
    // teeth: the groups are not interchangeable
    assert(rows.map(_.getAs[Long]("phi24_u2")).distinct.length > 1)
  }

  test("q286: Spearman rho² replays from per-document doubled ranks") {
    val rows = run("q286_spearman_rank").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("source", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        toks(r.getString(2)).length.toLong))
    val bySrc = docs.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySrc(src)
      assert(r.getAs[Long]("n") === g.length.toLong)
      def u2ranks(xs: Seq[Long]): Seq[BigInt] = xs.map { x =>
        val below = xs.count(_ < x)
        val ties = xs.count(_ == x)
        BigInt(2 * below + ties + 1)
      }
      val ua = u2ranks(g.map(_._2).toSeq)
      val ub = u2ranks(g.map(_._3).toSeq)
      val n = BigInt(g.length)
      val (su, sv) = (ua.sum, ub.sum)
      val num = n * ua.zip(ub).map { case (a, b) => a * b }.sum - su * sv
      val du = n * ua.map(a => a * a).sum - su * su
      val dv = n * ub.map(b => b * b).sum - sv * sv
      assert(r.getAs[Long]("sgn") === num.signum.toLong, s"sgn $src")
      val exp = num * num / du.max(1) * 10000 / dv.max(1)
      assert(r.getAs[Long]("rho2_bp") === exp.toLong, s"rho2 $src")
    }
    // teeth: n_chars and token count are genuinely positively associated
    assert(rows.count(_.getAs[Long]("sgn") == 1L) >= rows.length / 2)
    assert(rows.exists(_.getAs[Long]("rho2_bp") > 5000L))
  }

  test("q287: Nelson–Aalen hazard replays from a sequential risk-set " +
      "scan with censoring") {
    val rows = run("q287_nelson_aalen").collect()
      .sortBy(_.getAs[Long]("t_days"))
    assert(rows.nonEmpty)
    val ev = table(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), tsMicros(r, "ts")))
    // .values (not a Map.flatMap) — tuple results would collapse users
    // sharing the same (td, conv) into one Map entry
    val users = ev.groupBy(_._1).values.toSeq.flatMap { es =>
      val v = es.filter(_._2 == "view").map(_._3).minOption
      val p = es.filter(_._2 == "purchase").map(_._3).minOption
      val last = es.map(_._3).max
      v.map { vv =>
        val conv = p.exists(_ >= vv)
        val td = if (conv) (p.get - vv) / 86400000000L
        else (last - vv) / 86400000000L
        (td, conv)
      }
    }.toSeq
    val n0 = users.length.toLong
    val byT = users.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = n0
    var hcum = 0L
    val expected = byT.map { case (td, g) =>
      val d = g.count(_._2).toLong
      val c = g.size - d
      val step = d * 1000000L / atRisk
      hcum += step
      val row = (td, d, c, atRisk, step, hcum)
      atRisk -= g.size
      row
    }
    assert(rows.length === expected.length)
    rows.zip(expected).foreach { case (r, (td, d, c, nr, step, hc)) =>
      assert(r.getAs[Long]("t_days") === td)
      assert(r.getAs[Long]("d") === d, s"d at t=$td")
      assert(r.getAs[Long]("c") === c, s"c at t=$td")
      assert(r.getAs[Long]("n_risk") === nr, s"n_risk at t=$td")
      assert(r.getAs[Long]("h_step_ppm") === step)
      assert(r.getAs[Long]("h_cum_ppm") === hc)
    }
    // teeth: the cohort contains BOTH conversions and censored users,
    // and the hazard accumulates monotonically
    assert(expected.map(_._2).sum > 0L)
    assert(expected.map(_._3).sum > 0L)
    val hs = rows.map(_.getAs[Long]("h_cum_ppm"))
    assert(hs.zip(hs.tail).forall { case (a, b) => b >= a })
  }
}
