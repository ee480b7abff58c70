package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic pseudo-random intervals (no Random: reruns must agree)
  private def intervals(n: Int, salt: Int, maxLen: Long) =
    (0 until n).map { i =>
      val h = (i * 2654435761L + salt) & 0x7fffffffL
      val key = h % 5
      val start = (h / 5) % 10000
      val len = (h / 50000) % (maxLen + 1)
      (key, i.toLong + salt * 1000L, start, start + len)
    }

  test("binned overlap join equals the naive inequality join, each pair once") {
    import spark.implicits._
    val l = intervals(300, 1, 400).toDF("k", "lid", "ls", "le")
    val r = intervals(300, 2, 150).toDF("k", "rid", "rs", "re")

    val binned = IntervalJoin.overlap(l, r, "k", "ls", "le", "rs", "re",
        binWidth = 100L, maxRightLen = 150L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))

    val naive = l.join(r, Seq("k"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))

    assert(binned.length === binned.distinct.length) // exactly-once, no dedup
    assert(binned.sorted.toSeq === naive.sorted.toSeq)
    assert(naive.nonEmpty) // the fixture must actually exercise overlaps
  }

  test("zero-length and touching intervals count as overlapping (closed ends)") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L, 100L), (1L, 11L, 200L, 300L))
      .toDF("k", "lid", "ls", "le")
    val r = Seq((1L, 20L, 100L, 100L), (1L, 21L, 300L, 350L),
        (1L, 22L, 301L, 320L))
      .toDF("k", "rid", "rs", "re")
    val got = IntervalJoin.overlap(l, r, "k", "ls", "le", "rs", "re",
        binWidth = 64L, maxRightLen = 50L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    // point-on-point, end-on-start touch; (11, 22) misses by one
    assert(got === Set((10L, 20L), (11L, 21L)))
  }
}
