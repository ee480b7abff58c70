package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the routing/drafting wave: q303 expert
  * capacity (scratch first-token routing + exact-ceil capacity ledger)
  * and q304 draft acceptance (scratch bigram argmax with the exact
  * tie-break, scored per source).
  */
class RoutingDraftSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("q303: capacity ledger replays from scratch first-token routing") {
    val rows = run("q303_expert_capacity").collect()
      .sortBy(_.getAs[Long]("cf_pct"))
    assert(rows.map(_.getAs[Long]("cf_pct")).toSeq ===
      Seq(100L, 125L, 150L))
    val loads = table(spark, sf, "documents")
      .select("text").collect()
      .map { r =>
        val t1 = r.getString(0).trim.toLowerCase.split("\\s+")(0)
        java.lang.Long.parseLong(md5hex(t1).substring(0, 8), 16) % 8
      }
      .groupBy(identity).values.map(_.length.toLong).toSeq
    val n = loads.sum
    rows.foreach { r =>
      val cf = r.getAs[Long]("cf_pct")
      val cap = (n * cf + 799) / 800
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("cap") === cap, s"cap at cf=$cf")
      assert(r.getAs[Long]("max_load") === loads.max)
      assert(r.getAs[Long]("max_share_bp") === loads.max * 10000 / n)
      assert(r.getAs[Long]("experts_over") ===
        loads.count(_ > cap).toLong, s"over at cf=$cf")
      val dropped = loads.map(l => math.max(l - cap, 0L)).sum
      assert(r.getAs[Long]("dropped") === dropped, s"dropped cf=$cf")
      assert(r.getAs[Long]("dropped_bp") === dropped * 10000 / n)
    }
    // teeth: the routing is genuinely skewed (leading tokens are
    // Zipfian) — cf = 1.0 must drop something, and raising cf must
    // monotonically reduce drops
    val drops = rows.map(_.getAs[Long]("dropped"))
    assert(drops(0) > 0L)
    assert(drops(0) >= drops(1) && drops(1) >= drops(2))
  }

  test("q304: acceptance rates replay from a scratch bigram argmax " +
      "draft") {
    val rows = run("q304_draft_acceptance").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").toSeq))
    def bigrams(ds: Seq[(Long, String, Seq[String])]) =
      ds.filter(_._3.length >= 2).flatMap { case (_, src, ws) =>
        ws.zip(ws.tail).map { case (a, b) => (src, a, b) } }
    val train = bigrams(docs.filter(_._1 % 4 != 0).toSeq)
      .groupBy(t => (t._2, t._3)).view.mapValues(_.length).toMap
    // deterministic argmax: max count, then lexicographically SMALLEST w2
    val draftMap = train.toSeq.groupBy(_._1._1).view.mapValues { g =>
      g.minBy { case ((_, w2), c) => (-c, w2) }._1._2
    }.toMap
    val held = bigrams(docs.filter(_._1 % 4 == 0).toSeq)
    val bySrc = held.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySrc(src)
      val nTok = g.length.toLong
      val acc = g.count { case (_, w1, w2) =>
        draftMap.get(w1).contains(w2) }.toLong
      val unseen = g.count(t => !draftMap.contains(t._2)).toLong
      assert(r.getAs[Long]("n_tokens") === nTok, s"n $src")
      assert(r.getAs[Long]("accepted") === acc, s"accepted $src")
      assert(r.getAs[Long]("accept_bp") === acc * 10000 / nTok)
      assert(r.getAs[Long]("unseen_hist") === unseen, s"unseen $src")
    }
    // teeth: the draft is better than nothing but far from perfect
    val bps = rows.map(_.getAs[Long]("accept_bp"))
    assert(bps.forall(b => b > 0L && b < 9000L))
  }
}
