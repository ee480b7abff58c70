package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the calibration/sketch-design wave:
  * q268 isotonic (PAV) calibration, q269 count-min width audit. Both
  * replayed from raw parquet in pure Scala — the PAV replay uses the
  * actual sequential pool-adjacent-violators algorithm (a DIFFERENT
  * algorithm than the minimax closed form the query uses), so the two
  * implementations agreeing is a real mathematical identity check, not
  * a re-execution.
  */
class CalibrationSketchSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def hash32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("q268: the minimax isotonic fit equals sequential " +
      "pool-adjacent-violators and is monotone") {
    val rows = run("q268_isotonic_calibration").collect()
    assert(rows.nonEmpty)
    val ev = table(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (math.min(15L, math.floor(r.getDouble(1) / 32).toLong),
        if (r.getString(0) == "purchase") 1L else 0L))
    val byB = ev.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val bs = byB.keys.toSeq.sorted
    assert(rows.map(_.getAs[Long]("b")).toSeq === bs)
    // sequential PAV on the fixed-point segment-average definition:
    // pool as (S, C) pairs, merge while the fixed-point averages
    // violate monotonicity, fitted value = pooled S*1e6 DIV C
    case class Pool(s: Long, c: Long) {
      def fp: Long = s * 1000000L / c
    }
    val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
    bs.foreach { b =>
      val (c, s) = byB(b)
      pools += Pool(s, c)
      while (pools.length >= 2 &&
          pools(pools.length - 2).fp >= pools.last.fp) {
        val t = pools.remove(pools.length - 1)
        val p = pools.remove(pools.length - 1)
        pools += Pool(p.s + t.s, p.c + t.c)
      }
    }
    // NOTE: with truncating fixed-point averages PAV and minimax can
    // differ by a last-unit truncation artifact; compare at bp
    // resolution (the query's own output resolution) where the
    // identity is exact
    val pavFit: Map[Long, Long] = {
      var i = 0
      pools.flatMap { p =>
        val covered = bs.slice(i, i + {
          // reconstruct how many buckets this pool absorbed by
          // matching cumulative counts
          var cc = 0L; var k = 0
          while (cc < p.c) { cc += byB(bs(i + k))._1; k += 1 }
          k
        })
        i += covered.length
        covered.map(_ -> p.fp / 100L)
      }.toMap
    }
    rows.foreach { r =>
      val b = r.getAs[Long]("b")
      val (c, s) = byB(b)
      assert(r.getAs[Long]("c") === c)
      assert(r.getAs[Long]("s") === s)
      assert(r.getAs[Long]("rate_bp") === s * 10000 / c)
      assert(r.getAs[Long]("fit_bp") === pavFit(b), s"fit bucket $b")
    }
    // monotone non-decreasing by construction
    val fits = rows.sortBy(_.getAs[Long]("b")).map(_.getAs[Long]("fit_bp"))
    assert(fits.zip(fits.drop(1)).forall { case (a, b) => a <= b })
  }

  test("q269: CMS estimates replay from scratch counters and never " +
      "underestimate") {
    val rows = run("q269_cms_width_audit").collect()
    assert(rows.length === 3)
    val toks = table(spark, sf, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
    val vocab = toks.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val tMass = vocab.values.sum
    val probe = vocab.toSeq.sortBy { case (t, c) => (-c, t) }.take(50)
    rows.foreach { r =>
      val w = r.getAs[Long]("w")
      val counters = scala.collection.mutable
        .Map.empty[(Int, Long), Long]
      vocab.foreach { case (t, c) =>
        (0 to 1).foreach { d =>
          val b = hash32(s"cms${d}_$t") % w
          counters((d, b)) = counters.getOrElse((d, b), 0L) + c
        }
      }
      val errs = probe.map { case (t, c) =>
        val est = (0 to 1).map(d =>
          counters((d, hash32(s"cms${d}_$t") % w))).min
        assert(est >= c, s"CMS underestimated '$t' at w=$w")
        est - c
      }
      // the probe is top-min(50, |vocab|): tiny SFs have small vocabs
      assert(r.getAs[Long]("probe_n") === probe.length.toLong)
      assert(r.getAs[Long]("err_max") === errs.max, s"err_max w=$w")
      assert(r.getAs[Long]("err_avg") === errs.sum / probe.length)
      assert(r.getAs[Long]("n_overestimated") ===
        errs.count(_ > 0).toLong)
      assert(r.getAs[Long]("bound_cnt") === 27183L * tMass / (10000 * w))
    }
  }
}
