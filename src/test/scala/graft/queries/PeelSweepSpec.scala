package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the peel/eval wave (q223 k-core, q224
  * Markov held-out accuracy, q225 PR threshold sweep): the peeling
  * trajectory is replayed as the literal sequential algorithm, the
  * next-event model is refit and rescored from collected rows, and the
  * confusion sweep is recomputed per threshold, all matched bit-for-bit
  * plus the structural monotonicities each operator's meaning rests on.
  */
class PeelSweepSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q223 trajectory equals the literal peel loop with the quartile k") {
    val li = table(spark, sf, "lineitem")
      .filter("l_partkey < 800")
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val e0 = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    def degOf(e: Set[(Long, Long)]): Map[Long, Int] =
      (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
        .groupBy(identity).view.mapValues(_.size).toMap
    val d0 = degOf(e0)
    val sorted = d0.toSeq.sortBy { case (n, d) => (d, n) }
    val k = sorted((d0.size + 1) / 4)._2.toLong // 1-indexed (n+1)/4+1
    var e = e0
    val expected = (0 to 3).map { r =>
      val row = (r.toLong, k, degOf(e).size.toLong, e.size.toLong)
      val alive = degOf(e).filter(_._2 >= k).keySet
      e = e.filter(p => alive(p._1) && alive(p._2))
      row
    }
    val got = run("q223_kcore_peeling").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expected)
    // peeling must actually peel on the fixture, monotonically
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    assert(got.head._3 > got(1)._3)
  }

  test("q224 equals refit-and-rescore, with boundary pairs in neither " +
      "split") {
    val T = 1706054400000000L
    val evs = table(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = evs.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._3, e._2))
      s.sliding(2).collect { case Array(p, c) => (p._4, c._4, p._3, c._3) }
    }.toSeq
    val train = pairs.filter(_._4 < T)
    val test = pairs.filter(_._3 >= T)
    // every pair is train, test, or boundary-excluded; both splits real
    assert(train.nonEmpty && test.nonEmpty)
    assert(pairs.exists(p => p._3 < T && p._4 >= T), "boundary witnessed")
    val model = train.groupBy(_._1).view.mapValues { g =>
      val counts = g.groupBy(_._2).view.mapValues(_.size).toMap
      (counts.toSeq.minBy { case (b, c) => (-c, b) }._1, g.size.toLong)
    }.toMap
    val expected = test.groupBy(_._1).map { case (a, g) =>
      val (pred, nTrain) = model(a)
      val correct = g.count(_._2 == pred).toLong
      a -> (pred, nTrain, g.size.toLong, correct,
        correct * 10000 / g.size)
    }
    val got = run("q224_markov_heldout_accuracy").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expected)
  }

  test("q225 equals the per-threshold confusion replay with monotone " +
      "recall and constant population") {
    val rows = run("q225_pr_threshold_sweep").collect()
      .sortBy(_.getLong(0))
    assert(rows.length == 5)
    val pops = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) +
      r.getLong(4)).toSeq
    assert(pops.distinct.size == 1 && pops.head > 0)
    // tighter thresholds can only lose positives
    val tps = rows.map(_.getLong(1)).toSeq
    assert(tps == tps.sorted.reverse)
    // replay one threshold end-to-end from the raw text
    import graft.functions.TextOps.tokens
    val docs = table(spark, sf, "documents")
    val scored = docs
      .select(org.apache.spark.sql.functions.col("doc_id"),
        tokens(org.apache.spark.sql.functions.col("text")).as("ws"),
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.col("text"))).as("lt"))
      .collect().map { r =>
        val ws = r.getSeq[String](1)
        val toks = ws.size.toLong max 1L
        val uniq = ws.distinct.size.toLong
        val stop = Set("the", "a", "an", "and", "of", "to", "in", "is",
          "that", "it")
        val stopc = ws.count(stop).toLong
        val longw = ws.count(_.length > 12).toLong
        val wlen = ws.map(_.length.toLong).sum
        val score = 2 * math.min(toks, 400) + (uniq * 10000 / toks) / 4 +
          math.min(stopc * 10000 / toks, 2000) / 2 - 100 * longw -
          (wlen * 100 / toks - 500).abs / 2
        val lt = r.getString(2)
        val gold = lt.nonEmpty &&
          lt.count(c => c >= 'a' && c <= 'z').toLong * 10000 /
            lt.length >= 7000 && lt.length >= 200
        (score, gold, lt.nonEmpty)
      }.filter(_._3)
    val t = 2000L
    val tp = scored.count(d => d._1 >= t && d._2).toLong
    val fp = scored.count(d => d._1 >= t && !d._2).toLong
    val fn = scored.count(d => d._1 < t && d._2).toLong
    val tn = scored.count(d => d._1 < t && !d._2).toLong
    val r2000 = rows.find(_.getLong(0) == t).get
    assert((r2000.getLong(1), r2000.getLong(2), r2000.getLong(3),
      r2000.getLong(4)) == ((tp, fp, fn, tn)))
  }
}
