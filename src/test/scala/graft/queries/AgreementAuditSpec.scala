package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the wave-7 agreement/audit operators:
  * q327 Fleiss kappa, q328 Krippendorff alpha, q329 Dawid-Skene EM,
  * q330 PSI, q332 isotropy, q334 multiplicative weights — each replayed
  * in plain driver-side Scala (BigInt / Map folds, no DataFrames in the
  * replay path) from the raw parquet rows, so a shared Spark-side bug
  * cannot agree with itself through the oracle.
  */
class AgreementAuditSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  private def hash32(x: String): Long =
    java.lang.Long.parseLong(md5hex(x).take(8), 16)

  /** The raterLabels fixture replayed in Scala. */
  private def raters(): Seq[(Long, Array[Long])] = {
    val docs = table(spark, sf, "documents")
      .selectExpr("doc_id", "n_chars", "lower(trim(text)) AS lt")
      .collect()
      .filter(r => r.getAs[String]("lt").nonEmpty)
    docs.map { r =>
      val id = r.getAs[Long]("doc_id")
      val nc = r.getAs[Long]("n_chars")
      def grade(u: Long, lo: Long, hi: Long): Long =
        if (u >= hi) 2L else if (u >= lo) 1L else 0L
      val pert = nc + hash32(s"r3|$id") % 81 - 40
      (id, Array(
        grade(nc, 215, 370),
        grade(nc, 200, 390),
        grade(pert, 215, 370),
        hash32(s"fk|$id") % 3))
    }.toSeq
  }

  test("q327: Fleiss kappa replays from BigInt rational algebra") {
    val labs = raters()
    val n = BigInt(labs.size)
    val counts = labs.map { case (_, g) =>
      (0 to 2).map(c => g.count(_ == c).toLong).toArray
    }
    val sumsq = counts.iterator
      .map(nc => nc.map(x => BigInt(x) * x).sum).sum
    val t = (0 to 2).map(c => counts.iterator.map(_(c)).map(BigInt(_)).sum)
    val a = sumsq - 4 * n
    val b = t.map(x => x * x).sum
    def sd(v: BigInt, d: BigInt) =
      if (v.signum >= 0) v / d else -((-v) / d)
    val kappa = sd((4 * n * a - 3 * b) * 10000, 48 * n * n - 3 * b)
    val rows = run("q327_fleiss_kappa").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(BigInt(r.getAs[Long]("kappa_bp")) === kappa)
      assert(r.getAs[Long]("n_docs") === labs.size.toLong)
      val grade = r.getAs[Long]("grade").toInt
      assert(BigInt(r.getAs[Long]("t_c")) === t(grade))
    }
    // the fixture has real agreement signal, not chance-level noise
    assert(kappa > 3000, s"kappa_bp $kappa — fixture degenerated")
  }

  test("q328: Krippendorff alpha replays and sits near kappa") {
    val labs = raters()
    val n = BigInt(labs.size)
    val counts = labs.map { case (_, g) =>
      (0 to 2).map(c => g.count(_ == c).toLong).toArray
    }
    val dis = counts.iterator
      .map(nc => 16 - nc.map(x => BigInt(x) * x).sum).sum
    val t = (0 to 2).map(c => counts.iterator.map(_(c)).map(BigInt(_)).sum)
    val u = (4 * n - 1) * dis
    val v = 3 * (16 * n * n - t.map(x => x * x).sum)
    def sd(x: BigInt, d: BigInt) =
      if (x.signum >= 0) x / d else -((-x) / d)
    val alpha = sd((v - u) * 10000, v)
    val rows = run("q328_krippendorff_alpha").collect()
    assert(rows.length === 3)
    rows.foreach(r =>
      assert(BigInt(r.getAs[Long]("alpha_bp")) === alpha))
    assert(alpha > 3000)
  }

  test("q329: Dawid-Skene confusion matrices replay from a pure Scala " +
      "EM fold, and the noise rater is learned to be near-uniform") {
    val labs = raters()
    // T: doc -> milli posterior per class; init = vote proportions
    var t = labs.map { case (id, g) =>
      id -> (0 to 2).map(c => 250L * g.count(_ == c)).toArray
    }.toMap
    def mStep(): (Array[Array[Array[Long]]], Array[Long], Long) = {
      val num = Array.fill(4, 3, 3)(0L) // rater, k, c
      val sc = Array.fill(3)(0L)
      labs.foreach { case (id, g) =>
        val ti = t(id)
        (0 until 4).foreach { r =>
          (0 to 2).foreach(c => num(r)(g(r).toInt)(c) += ti(c))
        }
        (0 to 2).foreach(c => sc(c) += ti(c))
      }
      val nd = labs.size.toLong
      val pi = Array.tabulate(4, 3, 3)((r, k, c) =>
        (num(r)(k)(c) + 1) * 1000 / (sc(c) + 3))
      (pi, sc.map(_ / nd), nd)
    }
    def eStep(pi: Array[Array[Array[Long]]], prior: Array[Long]): Unit =
      t = labs.map { case (id, g) =>
        val score = (0 to 2).map(c =>
          (0 until 4).foldLeft(prior(c))((acc, r) =>
            acc * pi(r)(g(r).toInt)(c)))
        val tot = score.sum
        id -> score.map(x => x * 1000 / tot).toArray
      }.toMap
    val (pi0, pr0, _) = mStep(); eStep(pi0, pr0)
    val (pi1, pr1, _) = mStep(); eStep(pi1, pr1)
    val (piF, prF, nd) = mStep()
    val rows = run("q329_dawid_skene").collect()
    assert(rows.length === 36)
    rows.foreach { r =>
      val (rt, k, c) = (r.getAs[Long]("rater").toInt - 1,
        r.getAs[Long]("obs_k").toInt, r.getAs[Long]("true_c").toInt)
      assert(r.getAs[Long]("pi_milli") === piF(rt)(k)(c),
        s"pi($rt,$k,$c)")
      assert(r.getAs[Long]("prior_milli") === prF(c))
      assert(r.getAs[Long]("n_docs") === nd)
    }
    // teeth: the reference rater's diagonal must dominate the noise
    // rater's (DS separates informative from random annotators)
    def diag(r: Int) = (0 to 2).map(c => piF(r)(c)(c)).sum
    assert(diag(0) > diag(3) + 300,
      s"rater1 diag ${diag(0)} vs noise diag ${diag(3)}")
  }

  test("q330: PSI replays from exact counts + scalar ln fold") {
    val ev = table(spark, sf, "events")
      .selectExpr("CAST(date_format(ts, 'd') AS INT) AS dom",
        "CAST(floor(value * 100) AS BIGINT) AS vc")
      .collect()
    val bounds = Seq(200L, 500L, 1000L, 2000L, 5000L, 10000L, 20000L)
    def bucket(vc: Long): Int = bounds.indexWhere(vc < _) match {
      case -1 => 7; case i => i
    }
    val ce = Array.fill(8)(0L); val cl = Array.fill(8)(0L)
    ev.foreach { r =>
      val b = bucket(r.getLong(1))
      if (r.getInt(0) <= 15) ce(b) += 1 else cl(b) += 1
    }
    val te = ce.map(_ + 1).sum.toDouble
    val tl = cl.map(_ + 1).sum.toDouble
    val terms = (0 to 7).map { b =>
      val p = (ce(b) + 1) / te; val q = (cl(b) + 1) / tl
      (p - q) * math.log(p / q)
    }
    val psi = BigDecimal(terms.sum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = run("q330_psi_drift").collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket").toInt
      assert(r.getAs[Long]("c_early") === ce(b))
      assert(r.getAs[Long]("c_late") === cl(b))
      assert(math.abs(r.getAs[Double]("psi_r4") - psi) < 1e-9)
    }
  }

  test("q332: isotropy traces replay from a BigInt Gram fold") {
    val vecs = table(spark, sf, "embeddings")
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).toArray
        .map(x => math.floor(x.toDouble * 1000).toLong))
    val d = 64
    val c = Array.fill(d, d)(BigInt(0))
    vecs.foreach { x =>
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { c(i)(j) += BigInt(x(i)) * x(j); j += 1 }
        i += 1
      }
    }
    val trC = (0 until d).map(i => c(i)(i)).sum
    val trC2 = (for { i <- 0 until d; j <- i until d } yield
      if (i == j) c(i)(j) * c(i)(j) else 2 * c(i)(j) * c(i)(j)).sum
    val row = run("q332_isotropy_audit").collect()
    assert(row.length === 1)
    assert(BigInt(row(0).getAs[Long]("tr_c")) === trC)
    assert(BigInt(row(0).getAs[Long]("tr_c2_millionths")) ===
      trC2 / 1000000)
    assert(BigInt(row(0).getAs[Long]("pr_milli")) ===
      trC * trC * 1000 / trC2)
    // a 64-dim near-isotropic synthetic must land PR well above 1
    assert(row(0).getAs[Long]("pr_milli") > 10000L)
  }

  test("q334: multiplicative weights replay from a Map fold and " +
      "separate the loss extremes") {
    val docs = table(spark, sf, "documents")
      .selectExpr("source", "n_chars").collect()
    val bySrc = docs.groupBy(_.getString(0)).toSeq.sortBy(_._1)
    val loss = bySrc.map { case (src, rows) =>
      val n = rows.length.toLong
      val low = rows.count(_.getLong(1) < 215).toLong
      src -> (n, low * 10000 / n)
    }
    val k = loss.size.toLong
    var w = loss.map { case (src, _) => src -> 1000L }.toMap
    val tracked = (1 to 3).map { _ =>
      val raw = loss.map { case (src, (_, lbp)) =>
        src -> w(src) * (1000 + lbp / 20) / 1000
      }
      val tot = raw.map(_._2).sum
      w = raw.map { case (src, v) => src -> v * k * 1000 / tot }.toMap
      w
    }
    val rows = run("q334_multiplicative_weights").collect()
    assert(rows.length === loss.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("w1") === tracked(0)(src), s"w1 $src")
      assert(r.getAs[Long]("w2") === tracked(1)(src), s"w2 $src")
      assert(r.getAs[Long]("w3") === tracked(2)(src), s"w3 $src")
    }
    // teeth: weights actually separate across sources by round 3
    val w3s = rows.map(_.getAs[Long]("w3"))
    assert(w3s.max - w3s.min > 50, s"w3 spread ${w3s.max - w3s.min}")
  }
}
