package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Independent cross-checks for the projection/selection wave (q211 JL
  * distortion audit, q212 distribution-matching rejection sampler, q213
  * coreset coverage contrast): the JL pipeline is replayed from scratch
  * in pure Scala (same md5 sign function, same integer quantization),
  * the matcher's output must actually MOVE the length distribution
  * toward the target, and the greedy coreset must out-cover the blind
  * draw it is meant to replace.
  */
class SketchSelectionSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  test("q211 JL audit replays from scratch: same signs, same integer " +
      "quantization, same histogram") {
    val vecs = graft.Tables.table(spark, sf, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 100)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong)
          .toArray)
      .sortBy(_._1)
    assert(vecs.nonEmpty)
    val m = 16
    val d = 64
    val sgn = Array.tabulate(m, d)((j, i) =>
      if (h32(s"jl_${j}_${i}") % 2 == 0) 1L else -1L)
    val proj = vecs.map { case (_, xm) =>
      Array.tabulate(m)(j => (0 until d).map(i => sgn(j)(i) * xm(i)).sum)
    }
    val hist = collection.mutable.Map[Long, (Long, Long, Long)]()
    for (a <- vecs.indices; b <- vecs.indices if vecs(a)._1 < vecs(b)._1) {
      val d2o = (0 until d)
        .map(i => { val t = vecs(a)._2(i) - vecs(b)._2(i); t * t }).sum
      if (d2o > 0) {
        val d2p = (0 until m)
          .map(j => { val t = proj(a)(j) - proj(b)(j); t * t }).sum
        val ratio = d2p * 10000L / (m * d2o)
        val bucket = math.min(ratio / 2500, 7L)
        val (n, mn, mx) =
          hist.getOrElse(bucket, (0L, Long.MaxValue, Long.MinValue))
        hist(bucket) = (n + 1, math.min(mn, ratio), math.max(mx, ratio))
      }
    }
    val out = run("q211_jl_projection_audit").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == hist.toMap, "histogram mismatch vs from-scratch replay")
  }

  test("q212 matcher moves the length distribution toward the target " +
      "(L1 to target shrinks) and rates are maximal") {
    val rows = run("q212_dist_match_sample").collect()
    assert(rows.length > 1)
    // the most-underrepresented bucket keeps everything — the subsample
    // is maximal under exact matching
    assert(rows.exists(_.getLong(3) == 1000000L))
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), "accepted beyond bucket size")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
    val l1Before = rows.map(r => (r.getLong(5) - r.getLong(7)).abs).sum
    val l1After = rows.map(r => (r.getLong(6) - r.getLong(7)).abs).sum
    assert(l1After <= l1Before,
      s"matching must not move the distribution AWAY from the target " +
        s"(before $l1Before, after $l1After)")
  }

  test("q213 greedy k-center out-covers the hash-random draw of the " +
      "same budget") {
    val rows = run("q213_coreset_coverage_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set("kcenter", "random"))
    assert(rows("kcenter")._1 == rows("random")._1,
      "both strategies must cover the same candidate set")
    assert(rows("kcenter")._2 <= rows("random")._2,
      s"greedy coverage radius ${rows("kcenter")._2} must not exceed " +
        s"the random baseline's ${rows("random")._2}")
  }
}
