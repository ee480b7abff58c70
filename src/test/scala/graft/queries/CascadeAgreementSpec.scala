package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the cascade/agreement/diversity wave
  * (q232 filter-cascade ordering, q233 Cohen's kappa, q234 distinct-n):
  * the evaluate-until-first-rejection cost model is replayed literally
  * per document and per ordering, the kappa arithmetic (including the
  * sign-split division) is recomputed from raw confusion counts, and
  * the n-gram diversity table is rebuilt from collected text.
  */
class CascadeAgreementSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def toks(t: String): Array[String] =
    t.trim.toLowerCase.split("\\s+")
  private val Stops = Set("the", "a", "an", "and", "of", "to", "in",
    "is", "that", "it")

  private val costs = Map(1 -> 1L, 2 -> 2L, 3 -> 3L, 4 -> 5L)
  private val orders = Map(
    "o1_declared" -> List(1, 2, 3, 4),
    "o2_reverse" -> List(4, 3, 2, 1),
    "o3_scan_first" -> List(3, 4, 1, 2),
    "o4_mixed" -> List(2, 4, 1, 3))

  private def flags(t: String): Map[Int, Boolean] = {
    val lt = t.trim.toLowerCase
    val ws = toks(t)
    Map(
      1 -> (ws.length >= 10),
      2 -> !ws.exists(_.length > 20),
      3 -> (lt.count(c => c >= 'a' && c <= 'z') * 10 >= 6 * lt.length),
      4 -> (ws.count(Stops) >= 2))
  }

  private def chainCost(f: Map[Int, Boolean], p: List[Int]): Long =
    p match {
      case a :: Nil => costs(a)
      case a :: rest => costs(a) + (if (f(a)) chainCost(f, rest) else 0L)
      case Nil => 0L
    }

  test("q232: the probe-cost model replays literally per ordering, the " +
      "accepted set is order-independent, and orderings genuinely differ") {
    val rows = run("q232_filter_cascade_order").collect()
    assert(rows.length == 4)
    val docs = table(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
      .filter(_.trim.nonEmpty)
    val fs = docs.map(flags)
    val nAccept = fs.count(f => (1 to 4).forall(f(_))).toLong
    val expected = orders.map { case (nm, p) =>
      nm -> fs.map(chainCost(_, p)).sum
    }
    rows.foreach { r =>
      val nm = r.getAs[String]("ordering")
      assert(r.getAs[Long]("n_docs") == docs.length.toLong)
      // outcome is order-INDEPENDENT: every ordering accepts the same set
      assert(r.getAs[Long]("n_accepted") == nAccept)
      // the cost model replays exactly
      assert(r.getAs[Long]("total_cost") == expected(nm))
      assert(r.getAs[Long]("cost_per_doc_milli") ==
        expected(nm) * 1000L / docs.length)
    }
    // teeth: the audit discriminates — orderings do not all cost the same
    assert(rows.map(_.getAs[Long]("total_cost")).distinct.length > 1)
  }

  test("q233: kappa (sign-split) replays from raw confusion counts and " +
      "below-chance agreement is representable and witnessed") {
    val rows = run("q233_kappa_agreement").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val tp = r.getAs[Long]("tp"); val fp = r.getAs[Long]("fp")
      val fn = r.getAs[Long]("fn"); val tn = r.getAs[Long]("tn")
      assert(tp + fp + fn + tn == n)
      assert(r.getAs[Long]("acc_bp") == (tp + tn) * 10000L / n)
      val peNum = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
      val den = n * n - peNum
      if (den > 0) {
        val num = (tp + tn) * n - peNum
        val kappa =
          if (num >= 0) num * 10000L / den
          else -((-num) * 10000L / den)
        assert(r.getAs[Long]("kappa_bp") == kappa)
        assert(kappa >= -10000L && kappa <= 10000L)
      } else assert(r.isNullAt(r.fieldIndex("kappa_bp")))
    }
    // teeth: on this fixture the two rules agree BELOW chance for at
    // least one source — the case raw accuracy hides and kappa exposes
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("kappa_bp")) &&
      r.getAs[Long]("kappa_bp") < 0L))
  }

  test("q234: the diversity table replays from collected text and " +
      "distinct-n rises with n on this corpus") {
    val rows = run("q234_distinct_ngram_diversity").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = (for {
      n <- 1 to 3
      (src, t) <- docs
      ws = toks(t)
      if ws.length >= n
      i <- 0 to ws.length - n
    } yield ((src, n.toLong), ws.slice(i, i + n).mkString(" ")))
      .groupBy(_._1).map { case (k, g) =>
        k -> (g.size.toLong, g.map(_._2).distinct.size.toLong)
      }
    rows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Long]("n"))
      val (tot, dis) = expected(k)
      assert(r.getAs[Long]("total_grams") == tot)
      assert(r.getAs[Long]("distinct_grams") == dis)
      assert(r.getAs[Long]("distinct_bp") == dis * 10000L / tot)
    }
    // teeth: per source, distinct share strictly rises 1-gram -> 3-gram
    // (templated text would flatten this — the signal the metric exists
    // for)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      val byN = g.sortBy(_.getAs[Long]("n")).map(_.getAs[Long]("distinct_bp"))
      assert(byN(0) < byN(1) && byN(1) < byN(2))
    }
  }
}
