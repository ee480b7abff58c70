package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.concurrent.TimeLimits
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Seconds, Span}

import graft.TestSpark
import graft.streaming.StreamSessionize._

class StreamSessionizeSpec extends AnyFunSuite with TimeLimits {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("session_window aggregation over a MemoryStream") {
    failAfter(Span(180, Seconds)) {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")

    val query = sessionWindows(events, gap = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      // user 1: two events 5 min apart (one session), then a 30-min gap
      input.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(35), 4.0),
                    (2L, ts(0), 8.0))
      query.processAllAvailable()
      val out = spark.table("sessions")
        .select("user_id", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(out === Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
    } finally query.stop()
    }
  }

  test("stateful sessionizer emits closed sessions on gap") {
    failAfter(Span(180, Seconds)) {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = statefulSessionize(input.toDS(), gapMs = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts(0), 1.0), Event(1, ts(5), 2.0))
      query.processAllAvailable()
      // second batch: 30-min gap closes the first session
      input.addData(Event(1, ts(35), 4.0))
      query.processAllAvailable()
      val out = spark.table("closed_sessions")
        .select("user_id", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(out.toSeq === Seq((1L, 2L, 3.0)))
    } finally query.stop()
    }
  }

  test("streaming dedup drops re-delivered docs within the watermark") {
    failAfter(Span(180, Seconds)) {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val docs = input.toDF().toDF("ts", "text", "doc_id")

    val query = dedupStream(docs, watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), "alpha beta", 1L), (ts(1), "gamma", 2L))
      query.processAllAvailable()
      // batch 2: one exact re-delivery (dropped), one new doc (kept);
      // the duplicate has a different doc_id — identity is the CONTENT
      // fingerprint, as in the batch exact-dedup
      input.addData((ts(2), "alpha beta", 3L), (ts(3), "delta", 4L))
      query.processAllAvailable()
      val kept = spark.table("dedup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 4L))
      // payload columns pass through, fingerprint column does not
      assert(spark.table("dedup_out").columns.toSeq ===
        Seq("ts", "text", "doc_id"))
    } finally query.stop()
    }
  }

  test("stream-stream attribution join pairs purchases with in-horizon clicks") {
    failAfter(Span(180, Seconds)) {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]

    val joined = attributionStream(
      clicks.toDF().toDF("user_id", "ts", "campaign"),
      purchases.toDF().toDF("user_id", "ts", "order_id"),
      horizon = "30 minutes")
    val query = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((1L, ts(0), "ad_a"), (1L, ts(40), "ad_b"),
        (2L, ts(5), "ad_c"))
      purchases.addData((1L, ts(50), 900L), (2L, ts(60), 901L))
      query.processAllAvailable()
      // payload columns pass through with their prefixes — the attributed
      // click stays identifiable
      val out = spark.table("attrib")
        .select("c_user_id", "c_ts", "c_campaign", "p_ts", "p_order_id")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getString(2), r.getTimestamp(3), r.getLong(4)))
        .toSet
      // user 1: only the ts(40) click is within 30 min of the ts(50)
      // purchase (ts(0) is outside the horizon); user 2's click at ts(5)
      // is 55 min before the purchase -> no pair
      assert(out === Set((1L, ts(40), "ad_b", ts(50), 900L)))
    } finally query.stop()
    }
  }

  test("batch and streaming sessionization agree (same code path)") {
    import spark.implicits._
    val batch = Seq(
      (1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(35), 4.0), (2L, ts(0), 8.0))
      .toDF("user_id", "ts", "value")
    val out = sessionWindows(batch, gap = "10 minutes")
      .select("user_id", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out === Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("mapGroupsWithState running totals accumulate across batches") {
    failAfter(Span(180, Seconds)) {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val query = runningUserTotals(input.toDS())
        .writeStream.format("memory").queryName("user_totals")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(Event(1, ts(0), 1.0), Event(1, ts(5), 2.0))
        query.processAllAvailable()
        input.addData(Event(1, ts(10), 4.0), Event(2, ts(0), 8.0))
        query.processAllAvailable()
        // Update mode: latest row per user wins
        val latest = spark.table("user_totals")
          .groupBy("user_id")
          .agg(org.apache.spark.sql.functions.max("n_events").as("n"),
               org.apache.spark.sql.functions.max("total_value").as("v"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSet
        assert(latest === Set((1L, 3L, 7.0), (2L, 1L, 8.0)))
      } finally query.stop()
    }
  }

  test("windowed counts with watermark") {
    import spark.implicits._
    val batch = Seq(
      (ts(1), "click"), (ts(2), "click"), (ts(11), "click"), (ts(3), "view"))
      .toDF("ts", "event_type")
    val out = windowedCounts(batch, width = "10 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(out === Set(
      (ts(0), "click", 2L), (ts(10), "click", 1L), (ts(0), "view", 1L)))
  }
}
