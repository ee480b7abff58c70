package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-check for q300 HLL set algebra: registers, the
  * union register-max merge, the harmonic estimates, and the exact
  * cohort counts are all rebuilt in scratch Scala from the raw orders
  * parquet — plus the algebra's defining property: the union sketch
  * built by merging equals the sketch built from the unioned KEYS
  * (mergeability is an identity, not an approximation).
  */
class SketchAlgebraSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("q300: register merge, estimates, and exacts replay — and the " +
      "merged union sketch equals the union-of-keys sketch") {
    val rows = SparkEntry.queries("q300_hll_setops")(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows(0)
    val orders = table(spark, sf, "orders")
      .selectExpr("o_custkey", "year(o_orderdate) AS yr").collect()
      .map(x => (x.getAs[Number](0).longValue, x.getAs[Number](1).intValue))
    val a = orders.filter(_._2 == 1995).map(_._1).toSet
    val b = orders.filter(_._2 == 1996).map(_._1).toSet
    def regs(keys: Set[Long]): Map[Long, Long] =
      keys.toSeq.map { k =>
        val h = java.lang.Long.parseLong(
          md5hex(k.toString).substring(0, 15), 16)
        val (reg, sfx) = (h % 256, h / 256)
        reg -> (if (sfx == 0) 53L
                else 53L - java.lang.Long.toBinaryString(sfx).length)
      }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val (ra, rb) = (regs(a), regs(b))
    // mergeability identity: max-merge of per-set registers == registers
    // of the unioned key set
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, Long.MinValue),
        rb.getOrElse(k, Long.MinValue))).toMap
    assert(merged === regs(a ++ b))
    def est(rg: Map[Long, Long]): Long = {
      val sHit = rg.values.map(mx => BigInt(1) << (53 - mx.toInt)).sum
      val sScaled = sHit + BigInt(256 - rg.size) * (BigInt(1) << 53)
      (BigInt(718) * 256 * 256 * (BigInt(1) << 53) /
        (1000 * sScaled)).toLong
    }
    val (estA, estB, estU) = (est(ra), est(rb), est(merged))
    val estI = math.max(estA + estB - estU, 0L)
    assert(r.getAs[Long]("exact_a") === a.size.toLong)
    assert(r.getAs[Long]("exact_b") === b.size.toLong)
    assert(r.getAs[Long]("exact_u") === (a ++ b).size.toLong)
    assert(r.getAs[Long]("exact_i") === (a & b).size.toLong)
    assert(r.getAs[Long]("est_a") === estA)
    assert(r.getAs[Long]("est_b") === estB)
    assert(r.getAs[Long]("est_u") === estU)
    assert(r.getAs[Long]("est_i") === estI)
    assert(r.getAs[Long]("err_a_bp") ===
      math.abs(estA - a.size) * 10000 / a.size)
    // teeth: both cohorts are non-trivial and genuinely overlap. (No
    // error-band assertion at this spec's sf0.001 — cohorts of ~10² keys
    // sit deep in the RAW estimator's small-range bias zone, q273's
    // documented subject; the oracle-checked sf0.01 run lands ~175–1200
    // bp.) The union estimate must at least dominate each cohort's.
    assert(a.size > 50 && b.size > 50 && (a & b).nonEmpty)
    assert(estU >= math.max(estA, estB))
  }
}
