package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the reweighting/projection/fairness wave:
  * q288 importance-ESS (scratch BigInt Kish ESS + clipping ledger from raw
  * cell counts), q289 JL distortion (scratch ±1 projection and pairwise
  * ratios from raw embeddings — including the sign table, rebuilt from
  * md5 directly), q290 fairness rates (scratch scorer + reference rule
  * confusion counts per lang).
  */
class ProjectionFairnessSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("q288: Kish ESS and clipping ledger replay from BigInt cell " +
      "counts") {
    val rows = run("q288_importance_ess").collect()
      .sortBy(_.getAs[Long]("cap_micro"))
    assert(rows.length === 3)
    val cells = table(spark, sf, "documents")
      .select("source", "lang").collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.length.toLong).toMap
    val nt = BigInt(cells.values.sum)
    val nc = BigInt(cells.size)
    // .toSeq FIRST: mapping the Map to (n, w) tuples would collapse
    // cells that share a count into one Map entry
    val w = cells.toSeq.map { case (_, n) =>
      (BigInt(n), nt * 1000000 / (nc * n)) }
    rows.zip(Seq(2000000L, 5000000L, 1000000000000L)).foreach {
      case (r, cap) =>
        assert(r.getAs[Long]("cap_micro") === cap)
        val wc = w.map { case (n, x) => (n, x.min(BigInt(cap))) }
        val sw = wc.map { case (n, x) => n * x }.sum
        val swRaw = w.map { case (n, x) => n * x }.sum
        val sw2 = wc.map { case (n, x) => n * x * x }.sum
        assert(r.getAs[Long]("ess_bp") ===
          (sw * sw * 10000 / (nt * sw2)).toLong, s"ess cap=$cap")
        assert(r.getAs[Long]("clipped_docs") ===
          w.collect { case (n, x) if x > cap => n }.sum.toLong)
        assert(r.getAs[Long]("clipped_mass_bp") ===
          ((swRaw - sw) * 10000 / swRaw).toLong)
        assert(r.getAs[Long]("max_share_bp") ===
          (wc.map { case (n, x) => n * x }.max * 10000 / sw).toLong)
    }
    // teeth: the cell grid is genuinely skewed — the uncapped ESS is
    // below par and the tightest cap actually clips
    assert(rows.last.getAs[Long]("ess_bp") < 9500L)
    assert(rows.head.getAs[Long]("clipped_docs") > 0L)
    // clipping can only raise the Kish ESS
    assert(rows.head.getAs[Long]("ess_bp") >=
      rows.last.getAs[Long]("ess_bp"))
  }

  test("q289: JL projection distortion replays from a scratch ±1 " +
      "projection") {
    val rows = run("q289_jl_distortion").collect()
    assert(rows.nonEmpty)
    val vecs = table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000).toLong).toArray)
      .toMap
    val probe = vecs.keys.filter(_ < 100).toSeq.sorted
    val sgn = Array.tabulate(64, 8) { (i, j) =>
      val h = java.lang.Long.parseLong(
        md5hex(s"${i}_$j").substring(0, 8), 16)
      1L - 2L * (h % 2)
    }
    def proj(v: Array[Long]): Array[Long] =
      Array.tabulate(8)(j => (0 until 64).map(i => sgn(i)(j) * v(i)).sum)
    val ratios = for {
      a <- probe; b <- probe if a < b
    } yield {
      val (va, vb) = (vecs(a), vecs(b))
      val d2o = (0 until 64).map(i =>
        (va(i) - vb(i)) * (va(i) - vb(i))).sum
      val (pa, pb) = (proj(va), proj(vb))
      val d2p = (0 until 8).map(j =>
        (pa(j) - pb(j)) * (pa(j) - pb(j))).sum
      (d2p / 8) * 10000 / d2o.max(1)
    }
    val byBucket = ratios.groupBy(r => (r / 1000).min(19)).toSeq
      .sortBy(_._1)
    assert(rows.length === byBucket.length)
    rows.sortBy(_.getAs[Long]("bucket")).zip(byBucket).foreach {
      case (r, (b, rs)) =>
        assert(r.getAs[Long]("bucket") === b)
        assert(r.getAs[Long]("n_pairs") === rs.length.toLong)
        assert(r.getAs[Long]("min_bp") === rs.min)
        assert(r.getAs[Long]("max_bp") === rs.max)
        assert(r.getAs[Long]("mean_bp") === rs.sum / rs.length)
    }
    // teeth: the distribution centers on parity (10⁴ bp) — the overall
    // mean ratio is within 25% of exact, and the sign table is balanced
    val mean = ratios.sum / ratios.length
    assert(mean > 7500L && mean < 12500L, s"mean ratio $mean")
    val nPos = sgn.flatten.count(_ == 1L)
    assert(nPos > 200 && nPos < 312, s"sign balance $nPos")
  }

  test("q290: fairness rates replay from scratch confusion counts") {
    val rows = run("q290_fairness_rates").collect()
    assert(rows.nonEmpty)
    val stop = Set("the", "a", "an", "and", "of", "to", "in", "is",
      "that", "it")
    val docs = table(spark, sf, "documents")
      .select("lang", "text").collect()
      .flatMap { r =>
        val lt = r.getString(1).trim.toLowerCase
        if (lt.isEmpty) None
        else {
          val ws = lt.split("\\s+")
          val toks = ws.length.toLong
          val uniq = ws.distinct.length.toLong
          val stopc = ws.count(stop).toLong
          val longw = ws.count(_.length > 12).toLong
          val wlen = ws.map(_.length.toLong).sum
          val score = 2 * math.min(toks, 400) + (uniq * 10000 / toks) / 4 +
            math.min(stopc * 10000 / toks, 2000) / 2 - 100 * longw -
            math.abs(wlen * 100 / toks - 500) / 2
          val pass = if (score >= 2000) 1L else 0L
          val alpha = lt.count(c => c >= 'a' && c <= 'z').toLong
          val gold = if (alpha * 10000 / lt.length >= 7000 &&
            lt.length >= 200) 1L else 0L
          Some((r.getString(0), pass, gold))
        }
      }
    val n = docs.length.toLong
    val keepAll = docs.map(_._2).sum * 10000 / n
    val g1All = docs.map(_._3).sum
    val tprAll = docs.count(d => d._2 == 1 && d._3 == 1) * 10000L /
      math.max(g1All, 1)
    val fprAll = docs.count(d => d._2 == 1 && d._3 == 0) * 10000L /
      math.max(n - g1All, 1)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val g = docs.filter(_._1 == lang)
      val gn = g.length.toLong
      val g1 = g.map(_._3).sum
      val keep = g.map(_._2).sum * 10000 / gn
      val tpr = g.count(d => d._2 == 1 && d._3 == 1) * 10000L /
        math.max(g1, 1)
      val fpr = g.count(d => d._2 == 1 && d._3 == 0) * 10000L /
        math.max(gn - g1, 1)
      assert(r.getAs[Long]("n") === gn, s"n $lang")
      assert(r.getAs[Long]("keep_bp") === keep, s"keep $lang")
      assert(r.getAs[Long]("parity_gap_bp") === keep - keepAll)
      assert(r.getAs[Long]("tpr_bp") === tpr, s"tpr $lang")
      assert(r.getAs[Long]("tpr_gap_bp") === tpr - tprAll)
      assert(r.getAs[Long]("fpr_bp") === fpr, s"fpr $lang")
      assert(r.getAs[Long]("fpr_gap_bp") === fpr - fprAll)
    }
    // teeth: the audit must see real signal — some lang keeps documents,
    // and at least one lang's parity gap is nonzero
    assert(rows.exists(_.getAs[Long]("keep_bp") > 0L))
    assert(rows.exists(_.getAs[Long]("parity_gap_bp") != 0L))
  }
}
