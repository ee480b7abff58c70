package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the corpus-normalization wave: q271
  * segment-level global dedup (C4 line-dedup shape), q272 cross-source
  * quantile normalization, q273 from-scratch HyperLogLog register audit.
  * Each replayed from raw parquet in pure Scala (scratch chunk hashing +
  * first-occurrence scan, scratch order statistics, BigInt register
  * arithmetic) — the third independent implementation alongside the Spark
  * program and its DuckDB twin.
  */
class CorpusNormSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  private def hash32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  test("q271: segment dedup replays from a scratch first-occurrence scan " +
      "and removal is non-trivial") {
    val rows = run("q271_segment_dedup").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").toSeq))
    // (source, doc_id, segIdx, hash) for complete 10-token chunks
    val segs = docs.flatMap { case (id, src, ws) =>
      (0 until ws.length / 10).map { j =>
        (src, id, j.toLong, hash32(ws.slice(j * 10, j * 10 + 10)
          .mkString(" ")))
      }
    }
    val keep = segs.groupBy(_._4).view
      .mapValues(_.map(t => t._2 * 1000000L + t._3).min).toMap
    val bySrc = segs.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySrc(src)
      val removed = g.filter(t => t._2 * 1000000L + t._3 != keep(t._4))
      assert(r.getAs[Long]("n_docs") === g.map(_._2).distinct.length)
      assert(r.getAs[Long]("n_segments") === g.length)
      assert(r.getAs[Long]("n_removed") === removed.length)
      assert(r.getAs[Long]("docs_affected") ===
        removed.map(_._2).distinct.length)
      assert(r.getAs[Long]("removed_bp") ===
        removed.length.toLong * 10000 / g.length)
    }
    // teeth: the corpus genuinely contains sub-document repeats
    assert(rows.map(_.getAs[Long]("n_removed")).sum > 0)
  }

  test("q272: quantile normalization replays from scratch order " +
      "statistics and equalizes source distributions") {
    val rows = run("q272_quantile_normalization").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pooled = docs.sortBy(d => (d._3, d._1)).map(_._3)
    val n = pooled.length.toLong
    val bySrc = docs.groupBy(_._2)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySrc(src).sortBy(d => (d._3, d._1))
      val ns = g.length.toLong
      val mapped = g.zipWithIndex.map { case (_, i) =>
        pooled(((i.toLong * n) / ns).toInt) // pos-1 = (r-1)*N DIV n_s
      }
      assert(r.getAs[Long]("n") === ns)
      assert(r.getAs[Long]("mean_before") === g.map(_._3).sum / ns)
      assert(r.getAs[Long]("mean_after") === mapped.sum / ns)
      assert(r.getAs[Long]("min_after") === mapped.min)
      assert(r.getAs[Long]("max_after") === mapped.max)
    }
    // teeth: after normalization the per-source means are tighter than
    // before (the whole point of the operator)
    def spread(c: String) = {
      val v = rows.map(_.getAs[Long](c)); v.max - v.min
    }
    assert(spread("mean_after") <= spread("mean_before"))
  }

  test("q273: HLL estimates replay from BigInt register arithmetic and " +
      "tighten with register budget") {
    val rows = run("q273_hll_register_audit").collect()
    assert(rows.length === 3)
    val keys = table(spark, sf, "lineitem")
      .select("l_partkey").distinct().collect().map(_.getLong(0))
    val exact = keys.length.toLong
    val hs = keys.map(k => BigInt(md5hex(k.toString).substring(0, 15), 16))
    val alpha = Map(4 -> 673, 6 -> 709, 8 -> 718)
    rows.foreach { r =>
      val b = r.getAs[Long]("b").toInt
      val m = 1L << b
      val rr = 60 - b
      val regs = hs.groupBy(h => (h % m).toLong).view.mapValues { g =>
        g.map { h =>
          val sfx = h >> b
          if (sfx == 0) rr + 1 else rr + 1 - sfx.bitLength
        }.max
      }.toMap
      val sScaled = (0L until m).map { j =>
        BigInt(1) << (rr + 1 - regs.getOrElse(j, 0))
      }.sum
      val est = (BigInt(alpha(b)) * m * m * (BigInt(1) << (rr + 1))) /
        (BigInt(1000) * sScaled)
      assert(r.getAs[Long]("m") === m)
      assert(r.getAs[Long]("n_hit") === regs.size.toLong)
      assert(r.getAs[Long]("v_empty") === m - regs.size)
      assert(r.getAs[Long]("est") === est.toLong)
      assert(r.getAs[Long]("exact") === exact)
      assert(r.getAs[Long]("err_bp") ===
        (est.toLong - exact).abs * 10000 / exact)
    }
    // teeth: the audit measures the RAW Flajolet estimator, whose
    // small-range bias (no linear-counting correction — the query
    // documents why) can reach ~50% when n/m is small, as it is at
    // sf0.001 for b=8 (200 keys / 256 registers). A broken register or
    // scaling formula is off by ORDERS of magnitude, so the honest
    // structural band is [exact/4, 4·exact] for every precision — tight
    // enough to catch any arithmetic slip, loose enough to hold across
    // sf and the known bias regime.
    rows.foreach { r =>
      val est = r.getAs[Long]("est")
      assert(est >= exact / 4 && est <= exact * 4,
        s"b=${r.getAs[Long]("b")} est $est vs exact $exact")
    }
  }
}
