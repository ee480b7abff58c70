package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the monitoring/calibration wave (q207 KS
  * drift, q208 multiplicative-weights reweighting, q209 calibration ECE,
  * q210 CUSUM): each operator's window/fixed-point reformulation is
  * replayed brute-force — naive sup-over-ECDF, the literal sequential
  * recursion, the textbook weighted mean — from collected rows and must
  * match bit-for-bit. The DuckDB oracle proves the two ENGINES agree;
  * these prove the distributed reformulations compute the textbook
  * definitions they claim to.
  */
class DriftCalibSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q207 KS numerator equals the naive sup-over-ECDF definition " +
      "(source vs rest, every source)") {
    val docs = table(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val out = run("q207_ks_source_drift").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val all = docs.map(_._2)
    val nAll = all.length.toLong
    assert(out.nonEmpty)
    out.foreach { case (src, (nS, nRest, dNum)) =>
      val own = docs.filter(_._1 == src).map(_._2)
      val rest = docs.filter(_._1 != src).map(_._2)
      assert(own.length.toLong == nS && nAll - nS == nRest)
      // the sup of |F1 - F2| over step functions is attained at a sample
      // point; evaluating at every distinct observed value is exact
      val d = all.distinct.map { v =>
        val c1 = own.count(_ <= v).toLong
        val c2 = rest.count(_ <= v).toLong
        (c1 * nRest - c2 * nS).abs
      }.max
      assert(d == dNum, s"KS numerator mismatch for $src")
    }
  }

  test("q210 CUSUM prefix-scan form equals the sequential recursion " +
      "S_t = max(0, S_{t-1} + dev_t), and both alarms fire") {
    val rows = run("q210_cusum_changepoint").collect().sortBy(_.getLong(0))
    val mu = rows.map(_.getLong(2)).sum / rows.length
    var sPos = 0L
    var sNeg = 0L
    rows.foreach { r =>
      val dev = r.getLong(2) - mu
      assert(r.getLong(3) == dev)
      sPos = math.max(0L, sPos + dev)
      sNeg = math.max(0L, sNeg - dev)
      assert(r.getLong(4) == sPos, s"cusum_pos at day ${r.getLong(0)}")
      assert(r.getLong(5) == sNeg, s"cusum_neg at day ${r.getLong(0)}")
    }
    // teeth: the injected +50% post-midpoint shift must actually trip
    // the upward alarm, and the pre-shift regime (below the pooled mean)
    // the downward one — a never-alarming fixture would prove nothing
    assert(rows.exists(_.getBoolean(6)), "upward alarm never fired")
    assert(rows.exists(_.getBoolean(7)), "downward alarm never fired")
    assert(!rows.head.getBoolean(6), "alarm must not fire on day one")
  }

  test("q208 multiplicative-weights recursion replays in pure Scala and " +
      "final weights are monotone in loss") {
    val out = run("q208_mixture_reweight").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length > 1)
    val loss = out.map(_._2)
    var w = loss.map(_ => 1000000000L)
    for (_ <- 1 to 4) {
      val wavg = w.zip(loss).map { case (wi, l) => wi * l }.sum / w.sum
      val upd = w.zip(loss).map { case (wi, l) =>
        val excess = if (l >= wavg) (l - wavg) / 10 else -((wavg - l) / 10)
        val f = math.min(math.max(1000000L + excess, 500000L), 2000000L)
        wi * f / 1000000L
      }
      val z = upd.sum
      w = upd.map(wi => wi * 1000000000L / z)
    }
    val zf = w.sum
    val nSrc = out.length.toLong
    out.zip(w).foreach { case ((src, _, wPpm, dPpm), wi) =>
      assert(wPpm == wi * 1000000L / zf, s"weight mismatch for $src")
      assert(dPpm == wPpm - 1000000L / nSrc)
    }
    // direction: the update up-weights hard (high-surprisal) sources, so
    // sorting by loss must sort weights weakly ascending
    val byLoss = out.sortBy(t => (t._2, t._1)).map(_._3)
    assert(byLoss.zip(byLoss.tail).forall { case (a, b) => a <= b },
      "weights must be weakly monotone in loss")
  }

  test("q209 ECE is the n-weighted mean absolute gap of its own bins, " +
      "and the bins partition the corpus") {
    val rows = run("q209_calibration_audit").collect()
    assert(rows.length > 1, "calibration needs more than one populated bin")
    val n = rows.map(_.getLong(1))
    val gap = rows.map(_.getLong(4))
    val ece = rows.map(_.getLong(5)).distinct
    assert(ece.length == 1)
    assert(ece.head == n.zip(gap).map { case (a, b) => a * b }.sum / n.sum)
    rows.foreach { r =>
      assert(r.getLong(4) == (r.getLong(2) - r.getLong(3)).abs)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 10000)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
    }
    val total = table(spark, sf, "documents")
      .filter(length(lower(trim(col("text")))) > 0).count()
    assert(n.sum == total, "bins must partition the scored corpus")
  }
}
