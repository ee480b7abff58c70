package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the warehouse/robust wave: q277 SCD
  * type-2 build (replayed as the sequential per-user scan the window
  * formulation replaces), q278 2-D skyline (replayed with the brute-force
  * O(N²) dominance definition — a different algorithm than the query's
  * level-cummax formulation), q279 MAD outliers (scratch order
  * statistics).
  */
class WarehouseRobustSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q277: SCD2 version table replays from a sequential per-user scan") {
    val rows = run("q277_scd2_dimension").collect()
    assert(rows.nonEmpty)
    val ev = table(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    case class Ver(from: Long, to: Option[Long])
    val byUser = ev.groupBy(_._1).view.mapValues { g =>
      val sorted = g.sortBy(e => (e._2.getTime, e._3))
      // keep events whose state differs from the previous event
      val changes = sorted.zipWithIndex.filter { case (e, i) =>
        i == 0 || sorted(i - 1)._4 != e._4
      }.map(_._1)
      changes.zipWithIndex.map { case (c, i) =>
        val to = if (i + 1 < changes.length)
          Some(changes(i + 1)._2.getTime / 1000) else None
        Ver(c._2.getTime / 1000, to)
      }
    }.toMap
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val us = byUser.filter(_._1 % 16 == b)
      val vers = us.values.flatten
      val durs = vers.collect { case Ver(f, Some(t)) => t - f }
      assert(r.getAs[Long]("n_users") === us.size.toLong)
      assert(r.getAs[Long]("n_versions") === vers.size.toLong)
      assert(r.getAs[Long]("n_current") === us.size.toLong,
        "exactly one open version per user")
      assert(r.getAs[Long]("max_dur_s") ===
        (if (durs.isEmpty) 0L else durs.max))
      assert(r.getAs[Long]("sum_dur_s") === durs.sum)
    }
    // teeth: versions genuinely collapse runs (fewer versions than events)
    assert(rows.map(_.getAs[Long]("n_versions")).sum < ev.length)
  }

  test("q278: the level-cummax skyline equals brute-force dominance") {
    val rows = run("q278_skyline_pareto").collect()
    assert(rows.nonEmpty)
    val parts = table(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100),
        r.getInt(2).toLong))
    val sky = parts.filter { p =>
      !parts.exists(q =>
        q._2 <= p._2 && q._3 >= p._3 &&
          (q._2 < p._2 || q._3 > p._3))
    }.sortBy(p => (p._2, p._1))
    assert(rows.length === sky.length)
    rows.zip(sky).foreach { case (r, p) =>
      assert(r.getAs[Long]("p_partkey") === p._1)
      assert(r.getAs[Long]("price_c") === p._2)
      assert(r.getAs[Long]("size") === p._3)
    }
    // teeth: the frontier is a strict minority of parts
    assert(sky.length < parts.length / 2)
  }

  test("q279: MAD outlier screen replays from scratch order statistics") {
    val rows = run("q279_mad_outliers").collect()
    assert(rows.nonEmpty)
    val docs = table(spark, sf, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val g = docs.filter(_._2 == src)
      val n = g.length
      val med = g.sortBy(d => (d._3, d._1)).apply((n + 1) / 2 - 1)._3
      val devs = g.map(d => (d._1, (d._3 - med).abs))
      val mad = devs.sortBy(d => (d._2, d._1)).apply((n + 1) / 2 - 1)._2
      val nOut = devs.count(_._2 > 3 * math.max(mad, 1L))
      assert(r.getAs[Long]("n") === n.toLong)
      assert(r.getAs[Long]("med") === med)
      assert(r.getAs[Long]("mad") === mad)
      assert(r.getAs[Long]("n_out") === nOut.toLong)
      assert(r.getAs[Long]("out_bp") === nOut.toLong * 10000 / n)
    }
  }
}
