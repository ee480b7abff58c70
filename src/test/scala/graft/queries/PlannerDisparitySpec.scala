package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table
import graft.functions.TextOps.{minhashA, minhashB, MinhashP}

/** Independent cross-checks for the planning/disparity/delta wave (q235
  * token-budget planner, q236 acceptance disparity, q237 incremental
  * delta dedup): the waterfill arithmetic and its budget/cap guarantees
  * are replayed row by row, the chi-square cross-multiplication verdict
  * is recomputed in BigInt, and the delta-dedup decisions are rebuilt
  * from scratch through the same minhash space in pure Scala.
  */
class PlannerDisparitySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  test("q235: the waterfill replays row by row and the budget and " +
      "repetition-cap guarantees hold") {
    val rows = run("q235_token_budget_plan").collect()
    assert(rows.nonEmpty)
    val B = 200000L; val Cap = 4000000L
    // replay the apportionment from the per-source inputs the engine
    // reports (mass, accept_bp are themselves cross-checked against the
    // scorer specs elsewhere)
    val inputs = rows.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("mass"), r.getAs[Long]("accept_bp")))
    val ws = inputs.map { case (_, m, a) => m * a }
    val wTot = ws.sum
    val targets = ws.map(w => B * w / wTot)
    val epochs = inputs.zip(targets).map { case ((_, m, _), t) =>
      math.min(Cap, t * 1000000L / m) }
    val planned = inputs.zip(epochs).map { case ((_, m, _), e) =>
      e * m / 1000000L }
    val cappedFlags = inputs.zip(targets).map { case ((_, m, _), t) =>
      if (t * 1000000L / m > Cap) 1L else 0L }
    val leftover = B - planned.sum
    val wUnc = ws.zip(cappedFlags).collect { case (w, 0L) => w }.sum
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("target") == targets(i))
      assert(r.getAs[Long]("epochs_micro") == epochs(i))
      assert(r.getAs[Long]("capped") == cappedFlags(i))
      val bonus =
        if (cappedFlags(i) == 0L && wUnc > 0) leftover * ws(i) / wUnc
        else 0L
      assert(r.getAs[Long]("bonus") == bonus)
      val e2 = math.min(Cap,
        (planned(i) + bonus) * 1000000L / inputs(i)._2)
      assert(r.getAs[Long]("epochs2_micro") == e2)
      assert(r.getAs[Long]("tokens_final") == e2 * inputs(i)._2 / 1000000L)
      // the repetition cap is never exceeded
      assert(r.getAs[Long]("epochs2_micro") <= Cap)
      // capped sources receive no bonus
      if (r.getAs[Long]("capped") == 1L)
        assert(r.getAs[Long]("bonus") == 0L)
    }
    // the budget is never overspent — provable, and here witnessed
    assert(rows.map(_.getAs[Long]("tokens_final")).sum <= B)
  }

  test("q236: the chi-square cross-multiplication verdict replays in " +
      "BigInt and the marginals are consistent") {
    val rows = run("q236_accept_disparity").collect()
    assert(rows.nonEmpty)
    val nt = rows.map(_.getAs[Long]("n")).sum
    val at = rows.map(_.getAs[Long]("n_acc")).sum
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val a = r.getAs[Long]("n_acc")
      assert(r.getAs[Long]("rest_n") == nt - n)
      assert(r.getAs[Long]("rest_acc") == at - a)
      assert(r.getAs[Long]("rate_bp") == a * 10000L / n)
      assert(r.getAs[Long]("rest_rate_bp") ==
        (at - a) * 10000L / (nt - n))
      val diff = BigInt(a) * (nt - n - (at - a)) - BigInt(n - a) * (at - a)
      val lhs = BigInt(nt) * diff * diff * 1000
      val rhs = BigInt(3841) * BigInt(n) * BigInt(nt - n) *
        BigInt(at) * BigInt(nt - at)
      assert(r.getAs[Long]("sig") == (if (lhs > rhs) 1L else 0L))
    }
    // teeth: the filter's rates genuinely vary across languages, so the
    // disparate-impact column discriminates (some language below the
    // best rate)
    assert(rows.map(_.getAs[Long]("rate_bp")).distinct.length > 1)
    assert(rows.exists(_.getAs[Long]("rate_vs_max_bp") < 10000L))
    assert(rows.exists(_.getAs[Long]("rate_vs_max_bp") == 10000L))
  }

  test("q237: the delta-dedup decisions replay from scratch through " +
      "the same minhash space") {
    val rows = run("q237_delta_dedup").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val sigs = docs.flatMap { case (id, src, t) =>
      val ws = t.trim.toLowerCase.split("\\s+")
      val hs =
        if (ws.length >= 3)
          (0 to ws.length - 3)
            .map(i => h32(s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")).toSet
        else Set.empty[Long]
      if (hs.isEmpty) None
      else {
        val m = (0 until 8).map(i =>
          hs.map(h => (minhashA(i) * h + minhashB(i)) % MinhashP).min)
        val keys = (0 until 4).map(b => (b, s"${m(2 * b)},${m(2 * b + 1)}"))
        Some((id, src, h32(s"delta_$id") % 5 == 0, keys))
      }
    }
    val baseKeys = sigs.filter(!_._3)
      .flatMap(s => s._4.map(k => k)).toSet
    val deltaByKey = sigs.filter(_._3)
      .flatMap(s => s._4.map(k => k -> s._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val decisions = sigs.filter(_._3).map { case (id, src, _, keys) =>
      val vsBase = keys.exists(baseKeys)
      val intra = keys.exists(k => deltaByKey(k) < id)
      (id, src,
        if (vsBase) "drop_vs_base"
        else if (intra) "drop_intra" else "keep")
    }
    val expected = decisions.groupBy(_._2).map { case (src, g) =>
      src -> (g.length.toLong,
        g.count(_._3 == "drop_vs_base").toLong,
        g.count(_._3 == "drop_intra").toLong,
        g.count(_._3 == "keep").toLong,
        g.collect { case (id, _, d) if d != "keep" => id }.sum)
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val e = expected(r.getAs[String]("source"))
      assert((r.getAs[Long]("n_delta"), r.getAs[Long]("n_drop_base"),
        r.getAs[Long]("n_drop_intra"), r.getAs[Long]("n_keep"),
        r.getAs[Long]("dropped_id_sum")) == e)
    }
    // teeth: the delta batch contains genuine duplicates of the base on
    // this corpus — the incremental path has something to do
    assert(rows.map(_.getAs[Long]("n_drop_base")).sum > 0L)
  }
}
