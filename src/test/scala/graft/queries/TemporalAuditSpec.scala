package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.Tables.table

/** Independent cross-checks for the temporal-audit wave: q301 watermark
  * lateness (scratch sequential replay of the arrival-hour watermark
  * advance) and q302 bitemporal as-of (scratch per-user two-axis as-of
  * resolution), both from raw events with scratch md5 jitter.
  */
class TemporalAuditSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5jit(eventId: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(eventId.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.substring(0, 8),
      16) % 7200

  private def tsMicros(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i) match {
      case t: java.sql.Timestamp =>
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      case t: java.time.LocalDateTime =>
        java.time.temporal.ChronoUnit.MICROS.between(
          java.time.LocalDateTime.of(1970, 1, 1, 0, 0), t)
    }

  test("q301: drop fractions replay from a sequential arrival-hour " +
      "watermark advance") {
    val rows = run("q301_watermark_lateness").collect()
      .sortBy(_.getAs[Long]("wm_s"))
    assert(rows.map(_.getAs[Long]("wm_s")).toSeq ===
      Seq(1800L, 3600L, 7200L))
    val ev = table(spark, sf, "events")
      .select("ts", "event_id").collect()
      .map { r =>
        val us = tsMicros(r, 0)
        val arr = us + md5jit(r.getLong(1)) * 1000000L
        (us, arr, arr / 3600000000L)
      }
    val hourMax = ev.groupBy(_._3).view.mapValues(_.map(_._1).max)
      .toMap.toSeq.sortBy(_._1)
    // sequential watermark: cumulative max of PRIOR hours' event-time max
    var cum = 0L
    val wmPrev = hourMax.map { case (h, mx) =>
      val out = h -> cum; cum = math.max(cum, mx); out
    }.toMap
    val lates = ev.map { case (us, _, h) =>
      math.max(wmPrev(h) - us, 0L) }
    rows.foreach { r =>
      val d = r.getAs[Long]("wm_s") * 1000000L
      assert(r.getAs[Long]("n_events") === ev.length.toLong)
      assert(r.getAs[Long]("dropped") === lates.count(_ > d).toLong,
        s"dropped at ${r.getAs[Long]("wm_s")}")
      assert(r.getAs[Long]("dropped_bp") ===
        lates.count(_ > d).toLong * 10000 / ev.length)
      assert(r.getAs[Long]("max_late_s") === lates.max / 1000000L)
    }
    // teeth: the curve is a real decision — tighter watermarks drop
    // strictly more, and a 2h watermark (= the jitter bound) drops none
    val dropped = rows.map(_.getAs[Long]("dropped"))
    assert(dropped(0) > dropped(1))
    assert(dropped(2) === 0L)
    assert(dropped(0) > 0L)
  }

  test("q302: every grid cell replays from a scratch per-user " +
      "two-axis as-of resolution") {
    val rows = run("q302_bitemporal_asof").collect()
      .sortBy(_.getAs[Long]("gid"))
    assert(rows.length === 6)
    val pur = table(spark, sf, "events")
      .filter("event_type = 'purchase'")
      .select("user_id", "event_id", "ts", "value").collect()
      .map { r =>
        val valid = tsMicros(r, 2)
        (r.getLong(0), r.getLong(1), valid,
          valid + md5jit(r.getLong(1)) * 1000000L,
          math.floor(r.getDouble(3) * 100).toLong)
      }
    rows.foreach { r =>
      val (tv, tt) = (r.getAs[Long]("tv_us"), r.getAs[Long]("tt_us"))
      val byUser = pur
        .filter(p => p._3 <= tv && p._4 <= tt)
        .groupBy(_._1).values
        .map(_.maxBy(p => (p._3, p._4, p._2)))
        .toSeq
      assert(r.getAs[Long]("n_users") === byUser.length.toLong,
        s"n_users at gid ${r.getAs[Long]("gid")}")
      assert(r.getAs[Long]("sum_cents") === byUser.map(_._5).sum,
        s"sum at gid ${r.getAs[Long]("gid")}")
      assert(r.getAs[Long]("max_staleness_s") ===
        byUser.map(p => tt - p._3).max / 1000000L)
    }
    // teeth: retroactive visibility is real — at least one Tv has a
    // different belief at Tt = Tv vs Tt = Tv + 2h
    val byTv = rows.groupBy(_.getAs[Long]("tv_us"))
    assert(byTv.values.exists { g =>
      g.map(_.getAs[Long]("sum_cents")).distinct.length > 1 ||
        g.map(_.getAs[Long]("n_users")).distinct.length > 1
    })
  }
}
