package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the late-interaction/SRM wave: q305
  * MaxSim (brute-force scratch scoring of every (query, doc) pair —
  * slices, dots, max, sum, ranking) and q306 SRM (scratch assignment +
  * first-event loss replay with the exact χ² cross-multiplication).
  */
class MaxsimSrmSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("q305: MaxSim top-3 replays from brute-force slice scoring") {
    val rows = run("q305_maxsim_late_interaction").collect()
    val vecs = table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000).toLong).toArray).toMap
    def maxsim(q: Array[Long], d: Array[Long]): Long =
      (0 until 8).map { qi =>
        (0 until 8).map { dj =>
          (0 until 8).map(k => q(qi * 8 + k) * d(dj * 8 + k)).sum
        }.max
      }.sum
    val queries = vecs.keys.filter(_ < 5).toSeq.sorted
    val expected = queries.flatMap { qid =>
      val scored = vecs.toSeq.filter(_._1 != qid)
        .map { case (did, d) => (did, maxsim(vecs(qid), d)) }
        .sortBy { case (did, s0) => (-s0, did) }
        .take(3)
      scored.zipWithIndex.map { case ((did, s0), i) =>
        (qid, (i + 1).toLong, did, s0)
      }
    }
    assert(rows.length === expected.length)
    rows.sortBy(r => (r.getAs[Long]("qid"), r.getAs[Long]("rnk")))
      .zip(expected).foreach { case (r, (qid, rnk, did, s0)) =>
        assert(r.getAs[Long]("qid") === qid)
        assert(r.getAs[Long]("rnk") === rnk)
        assert(r.getAs[Long]("hit_id") === did, s"hit q=$qid r=$rnk")
        assert(r.getAs[Long]("maxsim_milli2") === s0)
      }
    // teeth: MaxSim genuinely differs from the plain full dot product
    // for at least one query's top hit (the slice-max matters)
    def fulldot(q: Array[Long], d: Array[Long]): Long =
      (0 until 64).map(k => q(k) * d(k)).sum
    val differs = queries.exists { qid =>
      val bfDot = vecs.toSeq.filter(_._1 != qid)
        .maxBy { case (did, d) => (fulldot(vecs(qid), d), -did) }._1
      val bfMax = expected.find(e => e._1 == qid && e._2 == 1L).get._3
      bfDot != bfMax
    }
    assert(differs, "MaxSim ranking identical to full-dot on every query")
  }

  test("q306: both SRM schemes replay and only the lossy one flags " +
      "at decision scale") {
    val rows = run("q306_srm_check").collect()
      .sortBy(_.getAs[String]("scheme"))
    assert(rows.length === 2)
    val ev = table(spark, sf, "events")
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map { r =>
        val us = r.get(3) match {
          case t: java.sql.Timestamp =>
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          case t: java.time.LocalDateTime =>
            java.time.temporal.ChronoUnit.MICROS.between(
              java.time.LocalDateTime.of(1970, 1, 1, 0, 0), t)
        }
        (r.getLong(0), r.getLong(1), r.getString(2), us)
      }
    val users = ev.groupBy(_._1).map { case (uid, es) =>
      val first = es.minBy(e => (e._4, e._2))
      val variant = java.lang.Long.parseLong(
        md5hex(uid.toString).substring(0, 8), 16) % 2
      (uid, variant,
        if (first._3 == "error" || first._3 == "signup") 1L else 0L)
    }.toSeq
    def counts(f: ((Long, Long, Long)) => Boolean): (Long, Long) = {
      val g = users.filter(f)
      (g.count(_._2 == 0L).toLong, g.count(_._2 == 1L).toLong)
    }
    val (ca, cb) = counts(_ => true)
    val (la, lb) = counts(u => !(u._2 == 1L && u._3 == 1L))
    Seq(("a_clean", ca, cb), ("b_lossy", la, lb))
      .zip(rows).foreach { case ((scheme, na, nb), r) =>
        assert(r.getAs[String]("scheme") === scheme)
        assert(r.getAs[Long]("na") === na, s"na $scheme")
        assert(r.getAs[Long]("nb") === nb, s"nb $scheme")
        val d = BigInt(na - nb)
        assert(r.getAs[Long]("chi2_e4") ===
          (d * d * 10000 / (na + nb)).toLong)
        assert(r.getAs[Long]("srm_flag") ===
          (if (d * d * 100000 > BigInt(384146) * (na + nb)) 1L else 0L))
      }
    // teeth: the loss is real (lossy nb strictly smaller) and the lossy
    // χ² strictly dominates the clean one
    assert(lb < cb)
    assert(rows(1).getAs[Long]("chi2_e4") >
      rows(0).getAs[Long]("chi2_e4"))
  }

  test("q307: ε-ball transitivity replays from brute-force wedge " +
      "counting with exact order-statistic radii") {
    val rows = SparkEntry.queries("q307_epsball_transitivity")(
      spark, sf).collect().sortBy(_.getAs[Long]("pct"))
    assert(rows.map(_.getAs[Long]("pct")).toSeq === Seq(5L, 10L, 20L))
    val vecs = table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .filter(_.getLong(0) < 200)
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000).toLong).toArray)
      .sortBy(_._1)
    val ids = vecs.map(_._1)
    val d2 = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
    } yield ((ids(i), ids(j)),
      (0 until 64).map(k =>
        (vecs(i)._2(k) - vecs(j)._2(k)) * (vecs(i)._2(k) - vecs(j)._2(k)))
        .sum)).toMap
    val np = d2.size.toLong
    val sorted = d2.toSeq.sortBy { case ((a, b), v) => (v, a, b) }
    rows.foreach { r =>
      val pct = r.getAs[Long]("pct")
      val r2 = sorted((np * pct / 100).toInt - 1)._2
      assert(r.getAs[Long]("r2_milli2") === r2, s"r2 at p$pct")
      val edges = d2.filter(_._2 <= r2).keySet
      assert(r.getAs[Long]("n_edges") === edges.size.toLong)
      val adj = edges.toSeq.flatMap { case (a, b) =>
        Seq(a -> b, b -> a) }.groupBy(_._1).view
        .mapValues(_.map(_._2).sorted).toMap
      var (wedges, closed) = (0L, 0L)
      adj.foreach { case (_, ns) =>
        for (i <- ns.indices; j <- (i + 1) until ns.length) {
          wedges += 1
          if (edges.contains((ns(i), ns(j)))) closed += 1
        }
      }
      assert(r.getAs[Long]("n_wedges") === wedges, s"wedges p$pct")
      assert(r.getAs[Long]("n_closed") === closed, s"closed p$pct")
      assert(r.getAs[Long]("transitivity_bp") ===
        closed * 10000 / wedges)
    }
    // teeth: the ε-ball graph is genuinely non-transitive (the
    // union-find over-merge exposure is real), and closure grows with
    // the radius
    assert(rows.forall(_.getAs[Long]("transitivity_bp") < 9000L))
    val tr = rows.map(_.getAs[Long]("transitivity_bp"))
    assert(tr(0) <= tr(2))
  }
}
