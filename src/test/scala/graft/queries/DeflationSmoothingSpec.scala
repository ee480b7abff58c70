package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the deflation/smoothing wave: q296
  * second-PC deflation (full BigInt replay of both power chains, the
  * exact major/minor swap, and the orthogonality/ordering witnesses) and
  * q297 Kneser–Ney (scratch bigram counts and the exact ×4 rational
  * arithmetic, plus the smoothing theorem teeth: novel bigrams get
  * positive KN mass where MLE is zero).
  */
class DeflationSmoothingSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def sdiv(v: BigInt, d: BigInt): BigInt =
    if (v.signum >= 0) v / d else -((-v) / d)

  test("q296: both eigen-directions replay from BigInt power chains " +
      "with exact deflation, swap, and witnesses") {
    val rows = run("q296_pc2_deflation").collect()
      .sortBy(_.getAs[Long]("i"))
    assert(rows.length === 64)
    val vecs = table(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        BigInt(math.floor(x.toDouble * 1000).toLong)).toArray)
    val n = vecs.length
    val mean = Array.tabulate(64)(i =>
      sdiv(vecs.map(_(i)).sum, BigInt(n)))
    val cent = vecs.map(v => Array.tabulate(64)(i => v(i) - mean(i)))
    def mult(w: Array[BigInt]): Array[BigInt] = {
      val s = cent.map(c =>
        sdiv((0 until 64).map(i => c(i) * w(i)).sum, BigInt(1000)))
      Array.tabulate(64)(i =>
        cent.indices.map(r => cent(r)(i) * s(r)).sum)
    }
    def normalize(y: Array[BigInt]): Array[BigInt] = {
      val m = y.map(_.abs).max.max(BigInt(1))
      y.map(v => sdiv(v * 1000, m))
    }
    var w = Array.fill(64)(BigInt(1000))
    for (_ <- 1 to 3) w = normalize(mult(w))
    var v = Array.tabulate(64)(i =>
      if (i % 2 == 0) BigInt(1000) else BigInt(-1000))
    for (_ <- 1 to 3) {
      val y = mult(v)
      val dn = (0 until 64).map(i => y(i) * w(i)).sum
      val dd = (0 until 64).map(i => w(i) * w(i)).sum
      v = normalize(Array.tabulate(64)(i => y(i) - sdiv(dn * w(i), dd)))
    }
    def rayleigh(u: Array[BigInt]): (BigInt, BigInt) = {
      val s = cent.map(c =>
        sdiv((0 until 64).map(i => c(i) * u(i)).sum, BigInt(1000)))
      (s.map(x => x * x).sum, u.map(x => x * x).sum)
    }
    val (r1n, r1d) = rayleigh(w)
    val (r2n, r2d) = rayleigh(v)
    val swap = r1n * r2d < r2n * r1d
    val (maj, min_) = if (swap) (v, w) else (w, v)
    val (rMajN, rMajD) = if (swap) (r2n, r2d) else (r1n, r1d)
    val (rMinN, rMinD) = if (swap) (r1n, r1d) else (r2n, r2d)
    val ortho = (0 until 64).map(i => v(i) * w(i)).sum
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("w_major_milli") === maj(i).toLong, s"maj $i")
      assert(r.getAs[Long]("w_minor_milli") === min_(i).toLong)
      assert(r.getAs[Long]("ray_major_num") === rMajN.toLong)
      assert(r.getAs[Long]("ray_major_den") === rMajD.toLong)
      assert(r.getAs[Long]("ray_minor_num") === rMinN.toLong)
      assert(r.getAs[Long]("ray_minor_den") === rMinD.toLong)
      assert(r.getAs[Long]("ortho_dot") === ortho.toLong)
    }
    // witnesses: major really dominates (exact cross-multiply), the two
    // directions are orthogonal up to fixed-point truncation (the exact
    // dot of two ±1000-scale 64-vectors is ~64e6; residual must be tiny)
    assert(rMajN * rMinD >= rMinN * rMajD)
    assert(ortho.abs < BigInt(64000), s"ortho residual $ortho")
    // and they are genuinely different directions
    assert((0 until 64).exists(i => maj(i) != min_(i)))
  }

  test("q297: Kneser–Ney held-out categories replay from scratch " +
      "bigram counts, and smoothing pays novel bigrams") {
    val rows = run("q297_kneser_ney_audit").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").toSeq))
    def bigrams(ds: Seq[Seq[String]]): Seq[(String, String)] =
      ds.filter(_.length >= 2).flatMap(ws => ws.zip(ws.tail))
    val train = bigrams(docs.filter(_._1 % 4 != 0).map(_._2).toSeq)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val held = bigrams(docs.filter(_._1 % 4 == 0).map(_._2).toSeq)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = train.toSeq.groupBy(_._1._1).view
      .mapValues(g => (g.map(_._2).sum, g.length.toLong)).toMap
    val nTypes = train.size.toLong
    val n1w2 = train.toSeq.groupBy(_._1._2).view
      .mapValues(_.length.toLong).toMap
    case class Acc(var nT: Long = 0, var nTok: Long = 0,
      var kn: BigInt = 0, var mle: BigInt = 0)
    val accs = scala.collection.mutable.Map[String, Acc]()
    held.foreach { case ((w1, w2), h) =>
      val pc = BigInt(n1w2.getOrElse(w2, 0L)) * 1000000 / nTypes
      val (cat, kn, mle) = c1.get(w1) match {
        case None => ("c_hist_unseen", pc, BigInt(0))
        case Some((cw1, nFollow)) =>
          val c12 = train.getOrElse((w1, w2), 0L)
          val kn = (BigInt(4 * c12 - 3).max(0) * 1000000) / (4 * cw1) +
            (BigInt(3) * nFollow * pc) / (4 * cw1)
          if (c12 > 0) ("a_seen", kn, BigInt(c12) * 1000000 / cw1)
          else ("b_novel_hist_seen", kn, BigInt(0))
      }
      val a = accs.getOrElseUpdate(cat, Acc())
      a.nT += 1; a.nTok += h; a.kn += h * kn; a.mle += h * mle
    }
    assert(rows.length === accs.size)
    rows.foreach { r =>
      val cat = r.getAs[String]("cat")
      val a = accs(cat)
      assert(r.getAs[Long]("n_types") === a.nT, s"n_types $cat")
      assert(r.getAs[Long]("n_tokens") === a.nTok, s"n_tokens $cat")
      assert(r.getAs[Long]("avg_kn_micro") === (a.kn / a.nTok).toLong,
        s"kn $cat")
      assert(r.getAs[Long]("avg_mle_micro") === (a.mle / a.nTok).toLong,
        s"mle $cat")
    }
    // teeth: the smoothing theorem — novel bigrams under a seen history
    // exist in the held-out set, get ZERO from MLE and POSITIVE KN mass
    val novel = rows.find(
      _.getAs[String]("cat") == "b_novel_hist_seen")
    assert(novel.isDefined, "held-out set contains no novel bigrams")
    assert(novel.get.getAs[Long]("avg_mle_micro") === 0L)
    assert(novel.get.getAs[Long]("avg_kn_micro") > 0L)
  }
}
