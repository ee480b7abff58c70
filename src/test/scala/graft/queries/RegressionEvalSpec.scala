package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the regression/eval wave: q274 ridge by
  * normal equations (BigInt Cramer replay + the ridge-shrinkage theorem),
  * q275 exact ROC-AUC (replayed with the O(n1·n0) PAIRWISE definition —
  * a genuinely different algorithm than the rank-sum identity the query
  * uses, so agreement is a mathematical identity check), q276 CUPED
  * (scratch covariance replay).
  */
class RegressionEvalSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def sdiv(v: BigInt, d: BigInt): BigInt =
    if (v.signum >= 0) v / d else -((-v) / d)

  test("q274: ridge coefficients replay from BigInt Cramer and the " +
      "penalized slope norm never grows with lambda") {
    val rows = run("q274_ridge_normal_eq").collect()
    assert(rows.length === 2)
    val fs = table(spark, sf, "embeddings")
      .select("embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](0)
        (BigInt(math.floor(v(0) * 1000.0).toLong),
          BigInt(math.floor(v(1) * 1000.0).toLong),
          BigInt(math.floor(v(2) * 1000.0).toLong))
      }
    val n = BigInt(fs.length)
    val s1 = fs.map(_._1).sum; val s2 = fs.map(_._2).sum
    val sy = fs.map(_._3).sum
    val s11 = fs.map(t => t._1 * t._1).sum
    val s22 = fs.map(t => t._2 * t._2).sum
    val s12 = fs.map(t => t._1 * t._2).sum
    val s1y = fs.map(t => t._1 * t._3).sum
    val s2y = fs.map(t => t._2 * t._3).sum
    def det3(m: Seq[BigInt]): BigInt =
      m(0) * (m(4) * m(8) - m(5) * m(7)) -
        m(1) * (m(3) * m(8) - m(5) * m(6)) +
        m(2) * (m(3) * m(7) - m(4) * m(6))
    val byLam = rows.map { r =>
      val lam = BigInt(r.getAs[Long]("lam"))
      val a11 = s11 + lam; val a22 = s22 + lam
      val det = det3(Seq(n, s1, s2, s1, a11, s12, s2, s12, a22))
      val d0 = det3(Seq(sy, s1, s2, s1y, a11, s12, s2y, s12, a22))
      val d1 = det3(Seq(n, sy, s2, s1, s1y, s12, s2, s2y, a22))
      val d2 = det3(Seq(n, s1, sy, s1, a11, s1y, s2, s12, s2y))
      assert(r.getAs[Long]("n") === fs.length.toLong)
      assert(r.getAs[Long]("b0_micro") ===
        sdiv(d0 * 1000000, det).toLong, s"b0 at lam $lam")
      assert(r.getAs[Long]("b1_micro") ===
        sdiv(d1 * 1000000, det).toLong, s"b1 at lam $lam")
      assert(r.getAs[Long]("b2_micro") ===
        sdiv(d2 * 1000000, det).toLong, s"b2 at lam $lam")
      lam -> r
    }.toMap
    // ridge-shrinkage theorem: with the intercept unpenalized, the
    // l2 norm of the slope vector is non-increasing in lambda (allow
    // 1 micro of truncation slack per coordinate)
    def norm2(r: org.apache.spark.sql.Row) = {
      val b1 = BigInt(r.getAs[Long]("b1_micro"))
      val b2 = BigInt(r.getAs[Long]("b2_micro"))
      b1 * b1 + b2 * b2
    }
    val n0 = norm2(byLam(BigInt(0)))
    val nL = norm2(byLam(BigInt(5000000)))
    assert(nL <= n0 + BigInt(4) * 1000000, s"norm grew: $n0 -> $nL")
  }

  test("q275: rank-sum AUC equals the brute-force pairwise definition") {
    val rows = run("q275_roc_auc").collect()
    assert(rows.length === 3)
    val docs = table(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map { r =>
        val ws = r.getString(3).trim.toLowerCase.split("\\s+").toSeq
        val lbl = r.getString(1) == "en"
        Map(
          "len" -> (lbl, r.getLong(2)),
          "toks" -> (lbl, ws.length.toLong),
          "lexdiv" -> (lbl, ws.distinct.length.toLong * 10000 / ws.length))
      }
    rows.foreach { r =>
      val sc = r.getAs[String]("scorer")
      val vals = docs.map(_(sc))
      val pos = vals.filter(_._1).map(_._2)
      val neg = vals.filterNot(_._1).map(_._2)
      // brute force: 2U = 2·#(pos>neg) + #(pos==neg)
      val u2 = pos.map(p =>
        2L * neg.count(p > _) + neg.count(p == _)).sum
      assert(r.getAs[Long]("n1") === pos.length.toLong)
      assert(r.getAs[Long]("n0") === neg.length.toLong)
      assert(r.getAs[Long]("u2") === u2, s"2U for $sc")
      assert(r.getAs[Long]("auc_bp") ===
        u2 * 10000 / (2L * pos.length * neg.length))
      assert(r.getAs[Long]("auc_bp") >= 0 &&
        r.getAs[Long]("auc_bp") <= 10000)
    }
  }

  test("q276: CUPED theta and rho^2 replay from scratch moments") {
    val rows = run("q276_cuped").collect()
    assert(rows.length === 1)
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val ev = table(spark, sf, "events")
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        r.getDouble(3)))
    val users = ev.groupBy(_._1).view.mapValues { g =>
      val x = g.count(_._2.before(cut)).toLong
      val y = g.filter(e => !e._2.before(cut) && e._3 == "purchase")
        .map(e => math.floor(e._4 * 100).toLong).sum
      (BigInt(x), BigInt(y))
    }.toMap
    val n = BigInt(users.size)
    val xs = users.values.map(_._1); val ys = users.values.map(_._2)
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val sxy = users.values.map(t => t._1 * t._2).sum
    val covN = n * sxy - sx * sy
    val varxN = n * sxx - sx * sx
    val varyN = n * syy - sy * sy
    val r = rows.head
    assert(r.getAs[Long]("n_users") === users.size.toLong)
    assert(r.getAs[Long]("mean_x") === (sx / n).toLong)
    assert(r.getAs[Long]("mean_y_cents") === (sy / n).toLong)
    assert(r.getAs[Long]("cov_n") === covN.toLong)
    assert(r.getAs[Long]("varx_n") === varxN.toLong)
    assert(r.getAs[Long]("theta_micro") ===
      sdiv(covN * 1000000, varxN).toLong)
    assert(r.getAs[Long]("rho2_bp") ===
      (covN * covN * 10000 / (varxN * varyN)).toLong)
    // Cauchy-Schwarz: rho^2 in [0, 1]
    assert(r.getAs[Long]("rho2_bp") >= 0 &&
      r.getAs[Long]("rho2_bp") <= 10000)
  }
}
