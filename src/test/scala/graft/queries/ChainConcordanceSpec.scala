package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the chain/concordance/power-law wave:
  * q291 stationary distribution (sequential scalar power iteration from
  * raw events), q292 Kendall tau-b (BRUTE-FORCE per-document pair
  * counting — O(n²) over each source, a genuinely different algorithm
  * than the query's cell-frame join), q293 Zipf doubling (scratch token
  * counts and sort-based ranks).
  */
class ChainConcordanceSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def tsMicros(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i) match {
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      case t: java.time.LocalDateTime =>
        java.time.temporal.ChronoUnit.MICROS.between(
          java.time.LocalDateTime.of(1970, 1, 1, 0, 0), t)
    }

  test("q291: stationary distribution replays from a sequential " +
      "power iteration") {
    val rows = run("q291_markov_stationary").collect()
      .sortBy(_.getAs[String]("state"))
    assert(rows.nonEmpty)
    val ev = table(spark, sf, "events")
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), tsMicros(r, 2),
        r.getLong(3)))
    val trans = ev.groupBy(_._1).values.toSeq.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._4)).map(_._2)
      sorted.zip(sorted.tail)
    }
    val counts = trans.groupBy(identity).view.mapValues(_.length).toMap
    val outTot = trans.groupBy(_._1).view.mapValues(_.length).toMap
    val states = outTot.keys.toSeq.sorted
    val p = counts.map { case ((a, b), n) =>
      (a, b) -> BigInt(n) * 1000000 / outTot(a)
    }
    var pi = states.map(_ -> BigInt(1000000) / states.length).toMap
    var piPrev = pi
    for (_ <- 1 to 4) {
      piPrev = pi
      val raw = states.map { j =>
        j -> states.map(i =>
          pi.getOrElse(i, BigInt(0)) * p.getOrElse((i, j), BigInt(0)))
          .sum / 1000000
      }.toMap
      val z = raw.values.sum
      pi = raw.view.mapValues(_ * 1000000 / z).toMap
    }
    assert(rows.length === states.length)
    rows.foreach { r =>
      val st = r.getAs[String]("state")
      assert(r.getAs[Long]("pi_ppm") === pi(st).toLong, s"pi $st")
      assert(r.getAs[Long]("pi_prev_ppm") === piPrev(st).toLong)
      assert(r.getAs[Long]("delta_ppm") ===
        (pi(st) - piPrev(st)).abs.toLong)
    }
    // teeth: the chain mixes — total mass stays ≈ 1e6 and the states
    // are not all identical
    assert(math.abs(rows.map(_.getAs[Long]("pi_ppm")).sum - 1000000L)
      <= states.length.toLong)
    assert(rows.map(_.getAs[Long]("pi_ppm")).distinct.length > 1)
  }

  test("q292: Kendall tau-b replays from brute-force per-document " +
      "pair counting") {
    val rows = run("q292_kendall_cells").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("source", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).trim.toLowerCase.split("\\s+").length.toLong))
    val bySrc = docs.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySrc(src)
      val (mna, mxa) = (g.map(_._2).min, g.map(_._2).max)
      val (mnb, mxb) = (g.map(_._3).min, g.map(_._3).max)
      val q = g.map { case (_, va, vb) =>
        ((va - mna) * 15 / math.max(mxa - mna, 1),
          (vb - mnb) * 15 / math.max(mxb - mnb, 1))
      }
      var (conc, disc, tieA, tieB) = (0L, 0L, 0L, 0L)
      for (i <- q.indices; j <- (i + 1) until q.length) {
        val (a, b) = (q(i), q(j))
        if (a._1 == b._1) tieA += 1
        if (a._2 == b._2) tieB += 1
        if (a._1 != b._1 && a._2 != b._2) {
          if ((a._1 < b._1) == (a._2 < b._2)) conc += 1 else disc += 1
        }
      }
      val n = q.length.toLong
      val n0 = n * (n - 1) / 2
      val num = BigInt(conc - disc)
      assert(r.getAs[Long]("n") === n, s"n $src")
      assert(r.getAs[Long]("conc") === conc, s"conc $src")
      assert(r.getAs[Long]("disc") === disc, s"disc $src")
      assert(r.getAs[Long]("tie_a") === tieA, s"tie_a $src")
      assert(r.getAs[Long]("tie_b") === tieB, s"tie_b $src")
      assert(r.getAs[Long]("sgn") === num.signum.toLong)
      val exp = num * num / BigInt(n0 - tieA).max(1) * 10000 /
        BigInt(n0 - tieB).max(1)
      assert(r.getAs[Long]("taub2_bp") === exp.toLong, s"taub2 $src")
    }
    // teeth: length and token count are genuinely concordant
    assert(rows.count(_.getAs[Long]("sgn") == 1L) >= rows.length / 2)
    assert(rows.exists(_.getAs[Long]("taub2_bp") > 5000L))
  }

  test("q293: Zipf doubling ratios replay from scratch token ranks") {
    val rows = run("q293_zipf_doubling").collect()
      .sortBy(_.getAs[Long]("r"))
    val counts = table(spark, sf, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (tok, c) => (-c, tok) }
    val byRank = counts.take(2048).zipWithIndex
      .map { case ((_, c), i) => (i + 1).toLong -> c }.toMap
    val expected = Seq(1L, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
      .filter(r => byRank.contains(r) && byRank.contains(2 * r))
      .map(r => (r, byRank(r), byRank(2 * r),
        byRank(r) * 10000 / byRank(2 * r)))
    assert(rows.length === expected.length)
    rows.zip(expected).foreach { case (r, (rk, fr, f2r, ratio)) =>
      assert(r.getAs[Long]("r") === rk)
      assert(r.getAs[Long]("f_r") === fr, s"f_r at r=$rk")
      assert(r.getAs[Long]("f_2r") === f2r, s"f_2r at r=$rk")
      assert(r.getAs[Long]("ratio_bp") === ratio, s"ratio at r=$rk")
    }
    // teeth: frequencies are non-increasing in rank and ratios ≥ par
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("f_r") >= r.getAs[Long]("f_2r")))
    assert(rows.forall(_.getAs[Long]("ratio_bp") >= 10000L))
  }
}
