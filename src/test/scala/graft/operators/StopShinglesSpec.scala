package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StopShinglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // boilerplate-heavy corpus: every one of 60 docs carries the same hot
  // shingle (a shared license header); each doc also has 5 distinctive
  // shingles, with docs 0 and 1 sharing theirs (true near-dups)
  private def corpus = {
    import spark.implicits._
    val rows = for {
      d <- 0 until 60
      dist = if (d == 1) 0 else d // doc 1 duplicates doc 0's content
      s <- 9999L +: (0 until 5).map(i => dist * 100L + i)
    } yield (d.toLong, s)
    rows.toDF("doc_id", "sh")
  }

  test("df cut removes the hot key and bounds per-key join fan-out") {
    val filtered = StopShingles.filter(corpus, "sh", maxDf = 10)
    assert(filtered.filter(col("sh") === 9999L).count() === 0)
    val maxDf = filtered.groupBy("sh").count()
      .agg(max("count")).head().getLong(0)
    assert(maxDf <= 10)

    // the boilerplate key alone would contribute 60*59/2 = 1770 join rows;
    // after the cut, candidate pairs come only from distinctive content
    def selfJoinRows(sh: org.apache.spark.sql.DataFrame): Long =
      sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .count()
    assert(selfJoinRows(corpus) === 1770L + 5L)
    assert(selfJoinRows(filtered) === 5L) // only docs 0~1's shared shingles
  }

  test("threshold above the max df keeps every row (≡ threshold = ∞)") {
    val filtered = StopShingles.filter(corpus, "sh", maxDf = 1000)
    assert(filtered.count() === corpus.count())
    assert(filtered.except(corpus).count() === 0)
  }

  test("hot-set subtraction broadcasts (no extra shuffle of the big side)") {
    val plan = StopShingles.filter(corpus, "sh", maxDf = 10)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"expected broadcast anti-join:\n$plan")
  }
}
