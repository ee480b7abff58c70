package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the retrieval/training wave: q266 batch
  * perceptron rounds, q267 BM25 top-k. Replayed from raw parquet in
  * pure Scala — same milli quantization, same per-term fixed-point
  * rounding — so a semantic drift shared by the Spark program and the
  * DuckDB twin cannot pass CI.
  */
class RetrievalTrainSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q266: the integer perceptron weight trajectory and per-epoch " +
      "stats replay from scratch arrays") {
    val rows = run("q266_perceptron_rounds").collect()
    assert(rows.length === 3)
    val vecs = table(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map { r =>
        val x = r.getSeq[Float](1).toArray
          .map(f => math.floor(f.toDouble * 1000).toLong)
        val y = if (r.getInt(2) == 0) 1L else -1L
        (r.getLong(0), y, x)
      }
    val n = vecs.length.toLong
    var w = Array.fill(64)(0L)
    def epochStats(): (Long, Array[Long]) = {
      val mis = vecs.filter { case (_, y, x) =>
        val m = (0 until 64).map(i => w(i) * x(i)).sum
        y * m <= 0L
      }
      val dw = Array.fill(64)(0L)
      mis.foreach { case (_, y, x) =>
        (0 until 64).foreach(i => dw(i) += y * x(i)) }
      (mis.length.toLong, dw)
    }
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    (1 to 2).foreach { _ =>
      val (nMis, dw) = epochStats()
      w = w.zip(dw).map { case (a, b) => a + b }
      expected += ((nMis, (n - nMis) * 10000 / n,
        w.map(math.abs).sum, w.map(math.abs).max))
    }
    val (nMis3, _) = epochStats() // eval under final weights, no update
    expected += ((nMis3, (n - nMis3) * 10000 / n,
      w.map(math.abs).sum, w.map(math.abs).max))
    rows.sortBy(_.getAs[Int]("round")).zip(expected).zipWithIndex
      .foreach { case ((r, e), idx) =>
        assert(r.getAs[Long]("n_mis") === e._1, s"n_mis round ${idx + 1}")
        assert(r.getAs[Long]("acc_bp") === e._2)
        assert(r.getAs[Long]("w_l1") === e._3, s"w_l1 round ${idx + 1}")
        assert(r.getAs[Long]("w_linf") === e._4)
      }
    // the trainer must actually learn: epoch-2 misclassification
    // strictly below the all-misclassified epoch-1 start
    assert(expected(1)._1 < expected(0)._1)
  }

  test("q267: BM25 rankings replay from a scratch postings index with " +
      "per-term fixed-point contributions") {
    val rows = run("q267_bm25_topk").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").toSeq))
    val postings: Map[Long, Map[String, Long]] = docs.map { case (id, ts) =>
      id -> ts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val dl = postings.view.mapValues(_.values.sum).toMap
    val nDocs = docs.length.toLong
    val avgdl = dl.values.sum.toDouble / nDocs
    val dfMap = postings.values.flatMap(_.keys).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byQid = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQid.keySet === docs.map(_._1).filter(_ < 5).toSet)
    byQid.foreach { case (qid, got) =>
      val qTerms = postings(qid).keySet
      val scores = postings.keys.filter(_ != qid).flatMap { d =>
        val s = qTerms.toSeq.flatMap { t =>
          postings(d).get(t).map { tf =>
            val idf = math.log(1.0 +
              (nDocs - dfMap(t) + 0.5) / (dfMap(t) + 0.5))
            val tfp = (tf * 2.2) /
              (tf + 1.2 * (0.25 + 0.75 * dl(d) / avgdl))
            math.round(idf * tfp * 10000)
          }
        }.sum
        if (s != 0L || qTerms.exists(postings(d).contains)) Some(d -> s)
        else None
      }.toSeq
      val expect = scores.sortBy { case (d, s) => (-s, d) }.take(10)
      val gotSorted = got.sortBy(_.getAs[Long]("rank"))
      assert(gotSorted.length === expect.length, s"qid $qid")
      gotSorted.zip(expect).foreach { case (r, (d, s)) =>
        assert(r.getAs[Long]("doc_id") === d,
          s"qid $qid rank ${r.getAs[Long]("rank")}")
        assert(r.getAs[Long]("score_fp") === s)
      }
    }
  }
}
