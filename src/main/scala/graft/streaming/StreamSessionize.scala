package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extensions (SURVEY.md §2-C): the reference is
  * batch-only (cumulative snapshots), but the `events` table motivates a
  * streaming surface. Two sessionizers:
  *
  *   1. `sessionWindows` — declarative `session_window` aggregation with a
  *      watermark: Spark merges windows whose events are within the gap,
  *      state is evicted by the watermark. The right default.
  *   2. `statefulSessionize` — `flatMapGroupsWithState` with explicit
  *      per-user state + processing-time timeout, for session semantics the
  *      built-in window can't express (e.g. emit-on-close with custom
  *      session payloads).
  *
  * Both operate identically on a batch DataFrame vs a stream (same code
  * path), which is how they're unit-tested with MemoryStream.
  */
object StreamSessionize {

  /** Declarative gap-sessionization. `events` needs (user_id, ts, value). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, n: Long,
                                total: Double)
  final case class ClosedSession(user_id: Long, session_start: Timestamp,
                                 session_end: Timestamp, n_events: Long,
                                 total_value: Double)

  /** Custom state machine: accumulate per-user sessions, emit a
    * ClosedSession whenever a gap exceeds `gapMs` (or on timeout, when a
    * timeout mode is configured — production pipelines pass
    * `ProcessingTimeTimeout` so idle users' sessions close without new
    * data; tests use the `NoTimeout` default for deterministic batches).
    */
  def statefulSessionize(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000,
                         timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), timeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map { s =>
              ClosedSession(userId, new Timestamp(s.start),
                new Timestamp(s.lastSeen), s.n, s.total)
            }
            state.remove()
            out.iterator
          } else {
            val sorted = it.toVector.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Vector.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed += ClosedSession(userId, new Timestamp(s.start),
                    new Timestamp(s.lastSeen), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Typed transition input: (user, event-time micros, tie-break id,
    * type). */
  final case class TransEvent(user_id: Long, us: Long, event_id: Long,
                              event_type: String)

  /** One observed behavior transition for a user. */
  final case class Transition(user_id: Long, prev_type: String,
                              next_type: String)

  /** Per-user chain state: the latest event seen so far. */
  final case class LastEvent(us: Long, event_id: Long,
                             event_type: String)

  /** Stateful per-user transition extraction — the streaming twin of the
    * q138/q291 batch lag-pair base: per-user state holds only the LAST
    * event; each micro-batch sorts its group by (us, event_id) (q138's
    * exact order) and emits one Transition per adjacent pair, chaining
    * through the stored last event. State is O(1) per user — the
    * Markov-chain ingestion shape at any scale.
    *
    * Cross-batch contract: like every incremental chain, a user's event
    * arriving in a LATER batch than a chronologically-later event links
    * in arrival order. Replay fixtures route each user's events into a
    * single batch (partition the files by user) for exact batch parity —
    * the gate does exactly that.
    */
  def transitionStream(events: Dataset[TransEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[LastEvent]) =>
          val sorted = it.toVector.sortBy(e => (e.us, e.event_id))
          var last = state.getOption
          val out = Vector.newBuilder[Transition]
          sorted.foreach { e =>
            last.foreach(l =>
              out += Transition(uid, l.event_type, e.event_type))
            last = Some(LastEvent(e.us, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Per-user funnel progress: earliest strict-order completion time of
    * each stage in micros, None while unreached. */
  final case class FunnelProgress(user_id: Long, t1: Option[Long],
                                  t2: Option[Long], t3: Option[Long])

  /** Typed funnel input: (user, stage name, event-time micros). */
  final case class StageEvent(user_id: Long, event_type: String, us: Long)

  /** Stateful strict-order funnel (view -> click -> purchase), the
    * streaming twin of batch q80: per-user state holds the earliest
    * completion time of each stage; each micro-batch folds its events in
    * event-time order, so a click counts only if it follows the user's
    * earliest view seen so far, a purchase only after that click.
    *
    * Within one micro-batch arrival order is irrelevant (events sort
    * before folding). ACROSS batches the fold is incremental: a view
    * arriving after a later batch already consumed clicks can lower t1
    * without reopening those clicks — exactly the watermark-lateness
    * contract every streaming aggregate has. Replay fixtures single-batch
    * (like the attribution gate) for exact batch parity.
    */
  def funnelStream(events: Dataset[StageEvent]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val U = Long.MaxValue
    def opt(v: Long): Option[Long] = if (v == U) None else Some(v)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[(Long, Long, Long)]) =>
          var (t1, t2, t3) = state.getOption.getOrElse((U, U, U))
          // ascending event time: by the time a click folds in, t1 is the
          // min over all views at-or-before it — strict order by renaming
          it.toVector.sortBy(e => (e.us, e.event_type)).foreach { e =>
            e.event_type match {
              case "view"     => if (e.us < t1) t1 = e.us
              case "click"    => if (e.us > t1 && e.us < t2) t2 = e.us
              case "purchase" => if (e.us > t2 && e.us < t3) t3 = e.us
              case _          =>
            }
          }
          state.update((t1, t2, t3))
          Iterator.single(FunnelProgress(userId, opt(t1), opt(t2), opt(t3)))
      }
  }

  final case class UserActivity(user_id: Long, n_events: Long,
                                total_value: Double)

  /** `mapGroupsWithState` variant: one updated state record per user per
    * micro-batch (running totals) — the 1:1 state-output shape, vs the
    * 0..n emission of the flatMap sessionizer above.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), UserActivity](
        GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var v = v0
          it.foreach { e => n += 1; v += e.value }
          state.update((n, v))
          UserActivity(userId, n, v)
      }
  }

  final case class DecayScore(user_id: Long, n_events: Long,
                              score_scaled: Long)

  /** Recency-weighted engagement score as streaming state — the q165
    * family's incremental twin. Decay is by EVENT TIME against a fixed
    * reference (`0.9` per `unitMs`), so each event's contribution
    * `floor(value·100) · round(0.9^k · 1e6)` depends only on the event
    * itself: the running sum is INTEGER and ORDER-INSENSITIVE, which is
    * what makes an exact stream ≡ batch parity gate possible — arrival
    * order across micro-batches cannot change the answer (an
    * arrival-ORDER decay recurrence could never promise that). State per
    * user is two longs.
    */
  def decayedScoreStream(events: Dataset[Event], refMs: Long,
                         unitMs: Long = 86400000L): Dataset[DecayScore] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long), DecayScore](
        GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[(Long, Long)]) =>
          var (n, acc) = state.getOption.getOrElse((0L, 0L))
          it.foreach { e =>
            n += 1
            acc += decayTerm(e.value, e.ts.getTime, refMs, unitMs)
          }
          state.update((n, acc))
          DecayScore(userId, n, acc)
      }
  }

  /** One event's integer decay contribution — shared by the stream op and
    * the batch twin so parity is by construction of the same arithmetic.
    * Events newer than the reference clamp to age 0; ages past 200 units
    * underflow to weight 0 (0.9^200 · 1e6 ≪ 1).
    */
  def decayTerm(value: Double, tsMs: Long, refMs: Long, unitMs: Long): Long = {
    val k = math.max(0L, (refMs - tsMs) / unitMs)
    val w = if (k > 200) 0L else math.round(math.pow(0.9, k.toDouble) * 1e6)
    math.floor(value * 100).toLong * w
  }

  final case class DocBand(doc_id: Long, band_id: Int, key: String)
  final case class BandOwner(band_id: Int, key: String, min_doc: Long)

  /** Streaming LSH near-dup detection state: per (band, key), the minimum
    * doc_id ever seen — the "owner" of that signature bucket. A document
    * is a near-dup candidate iff any of its band keys is owned by a LOWER
    * doc_id, exactly the batch MinHash-LSH candidate rule restricted to
    * earlier documents (the trickle-ingest semantics).
    *
    * The fold is a commutative MIN, so the converged state is independent
    * of arrival order across micro-batches — the property the parity gate
    * asserts with an adversarial round-robin replay. State per bucket is
    * one long; at corpus scale the bucket count tracks the distinct
    * signature count, the same cardinality the batch band self-join
    * shuffles on.
    */
  def bandOwnerStream(bands: Dataset[DocBand]): Dataset[BandOwner] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(b => (b.band_id, b.key))
      .mapGroupsWithState[Long, BandOwner](GroupStateTimeout.NoTimeout()) {
        case ((bandId, key), it, state: GroupState[Long]) =>
          val m = (state.getOption.iterator ++ it.map(_.doc_id))
            .min
          state.update(m)
          BandOwner(bandId, key, m)
      }
  }

  /** Tumbling-window event counts with late-data handling — the windowed
    * aggregation shape (`window` + watermark) for dashboard-style rollups.
    */
  def windowedCounts(events: DataFrame, width: String = "10 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Per-source corpus statistics as a streaming aggregation — the
    * incremental half of q173's temperature-scaled mixing. State is one
    * (n_docs, sum_tokens) counter pair per SOURCE — source cardinality,
    * not corpus size — so the aggregation needs no watermark and its
    * state cannot grow with the stream; emission is complete-mode. The
    * mixing math itself (sqrt weight, share, epoch factor) is a pure
    * projection over this converged state, applied at read time — so a
    * corpus arriving as a stream yields bit-identical mixing rates to
    * the batch q173 over the same documents (parity-gated).
    */
  def mixingStatsStream(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextOps.tokens(col("text"))).cast("long"))
          .as("sum_tokens"))

  /** Streaming partition-integrity manifest — the q191 manifest kept live
    * as documents arrive: per partition, row count, key range, byte total
    * and the Σ-hash content fingerprint, as ONE complete-mode streaming
    * aggregation whose state is O(partitions) (a handful of integer
    * accumulators each; the per-row hash is computed in the narrow
    * pre-aggregation projection and immediately folded). Because every
    * accumulator is commutative and exact (the fingerprint sums BIGINT
    * hashes in a DECIMAL(38,0) accumulator, reduced mod 1e9+7 only in the
    * output projection), the converged state equals the batch q191 answer
    * on any micro-batch split of the same rows. The one batch column
    * missing here is n_langs: a DISTINCT aggregation is unsupported over
    * unbounded input, and an exact distinct would make state grow with
    * the stream — the parity gate compares the shared columns.
    */
  def manifestStream(docs: DataFrame): DataFrame =
    graft.operators.Manifest.manifest(docs,
      withLangs = false, ordered = false)

  /** Ingest-time quality screen — the q190 classifier as a STATELESS
    * stream filter (the same shape as `decontamScreenStream`: a narrow
    * per-row column program, no state, no watermark), emitting the
    * accepted documents with their scores. Because the scorer is one
    * codegen'd projection shared verbatim with the batch q190/q195 path
    * (`TextQueries.qualityScored`), any micro-batch split of a replay
    * must produce exactly the batch-accepted set — parity-gated.
    */
  def qualityScreenStream(docs: DataFrame): DataFrame =
    graft.queries.TextQueries.qualityScored(docs)
      .filter(col("pass") === 1L)
      .select(col("doc_id"), col("source"), col("score"))

  /** Ingest-time PII screen — q61's pattern detectors on the live feed:
    * per arriving document the email-regex and blocklist match counts
    * plus a hash witness of the SCRUBBED text, via the projection shared
    * verbatim with the batch audit (`TrainingQueries.piiPerDoc`).
    * Stateless — no state, no watermark — so any micro-batch split of a
    * replay equals the batch projection row-for-row; the per-source
    * audit q61 publishes is one groupBy over this stream's sink. This is
    * the screen that runs BEFORE data lands: a document whose
    * `n_emails + n_terms > 0` can be quarantined at ingest time rather
    * than scrubbed in a later batch sweep.
    */
  def piiScreenStream(docs: DataFrame): DataFrame =
    graft.queries.TrainingQueries.piiPerDoc(docs)

  /** Ingest-time conformal outlier screen — q263's per-source
    * calibration thresholds applied statelessly to the live feed:
    * conformal calibration is inherently offline (an exact order
    * statistic over the calibration split), so the thresholds arrive
    * as a sources-sized static frame broadcast into the stream-static
    * join, and each arriving document costs one subtract/abs/compare.
    * No state, no watermark — any micro-batch split of a replay
    * equals the batch application row-for-row (the parity gate pins
    * it). A non-conforming document is the distribution-free analogue
    * of the q190 quality reject: flag at ingest time, audit later.
    */
  def conformalScreenStream(docs: DataFrame, thresholds: DataFrame)
      : DataFrame =
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(broadcast(thresholds.select("source", "mu", "qhat")),
        Seq("source"))
      .withColumn("score", abs(col("n_chars") - col("mu")))
      .withColumn("conforming", col("score") <= col("qhat"))
      .select("doc_id", "source", "score", "conforming")

  /** Ingest-time DSIR importance screen — q199's per-document weight
    * computed STATELESSLY on the stream: the 64-entry bucket→log-ratio
    * table arrives as a ONE-row map frame (`TextQueries.dsirLrMap`,
    * built from the dense `dsirBucketTable`, so every possible bucket
    * has an entry and a lookup can never miss), crossJoin-broadcast into
    * each micro-batch, and the document's micro-nat weight folds inside
    * `aggregate()` over its token array — no explode, no shuffle, no
    * state, so any micro-batch split is exactly the batch answer by
    * construction. This is a DIFFERENT physical plan from the batch
    * explode → broadcast-join → groupBy in `dsirDocScores` computing the
    * same integer sum — the parity gate pins the two to each other
    * pair-for-pair (the decontam-screen cross-plan pattern). At scale
    * the static side is a constant 64 entries and each arriving document
    * costs one pass over its own tokens.
    */
  def dsirScreenStream(docs: DataFrame, lrMapRow: DataFrame,
                       minW: Long = 0L): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        graft.functions.TextOps.tokens(col("text")).as("ws"))
      .crossJoin(broadcast(lrMapRow))
      .withColumn("n_toks", size(col("ws")).cast("long"))
      .withColumn("w_sum", expr(
        s"""aggregate(ws, CAST(0 AS BIGINT), (acc, w) ->
           | acc + element_at(lr_map,
           |   CAST(conv(substring(md5(concat('dsir_', w)), 1, 8), 16, 10)
           |     AS BIGINT) % ${graft.queries.TextQueries.DsirBuckets}))"""
          .stripMargin))
      .filter(col("w_sum") >= minW)
      .select("doc_id", "source", "n_toks", "w_sum")

  /** Ingest-time Bloom decontamination screen — q226's membership
    * verdict computed STATELESSLY on the stream: the packed filter words
    * arrive as a ONE-row ≤128-entry map frame
    * (`TextQueries.bloomWordMap`), crossJoin-broadcast into each
    * micro-batch, and the K=3 probe checks run as a pure column program
    * (element_at lookups + shift/AND) — no explode, no join, no state,
    * so any micro-batch split is exactly the batch answer by
    * construction. This is a DIFFERENT physical plan from the batch
    * explode → broadcast word-join → min-fold in
    * `TextQueries.bloomFlags`; the parity gate pins the two to each
    * other (the dsir-screen cross-plan pattern). At scale the static
    * side is a constant 128 words whatever the member-set size — the
    * property that makes Bloom screens the ingest decontamination
    * primitive — and each arriving document costs three md5 probes.
    * Emits the flagged (suspect-member) documents for quarantine.
    */
  def bloomScreenStream(docs: DataFrame, wordMapRow: DataFrame): DataFrame = {
    import graft.queries.TextQueries.{BloomBits, BloomWordBits}
    val checks = (1 to 3).map { i =>
      val bit = s"(CAST(conv(substring(md5(concat('bloom', $i, '_', fp))," +
        s" 1, 8), 16, 10) AS BIGINT) % $BloomBits)"
      val mask = s"shiftleft(CAST(1 AS BIGINT), " +
        s"CAST($bit % $BloomWordBits AS INT))"
      s"((coalesce(element_at(bw, $bit DIV $BloomWordBits), " +
        s"CAST(0 AS BIGINT)) & $mask) = $mask)"
    }.mkString(" AND ")
    docs
      .select(col("doc_id"), col("source"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
          .as("fp"))
      .crossJoin(broadcast(wordMapRow))
      .filter(expr(checks))
      .select("doc_id", "source")
  }

  /** Live corpus-mix drift monitor — the streaming half of q160's KL
    * diagnostic, made state-finite by the 64-bucket DSIR feature space:
    * arriving documents fold into per-(source, bucket) counters (state
    * O(sources × 64) whatever the stream length; counts are commutative,
    * so ANY micro-batch split converges to the batch counts — complete
    * output mode). The KL projection (`TextQueries.klFromCounts` against
    * a static `driftRef` reference snapshot) runs on the CONVERGED
    * integer counts — the `mixingStatsStream + projection` gate pattern,
    * because chaining a second stateful aggregation onto the stream is
    * both unsupported and unnecessary: the counts frame IS the state a
    * drift dashboard polls. Parity gate twenty-one.
    */
  def driftCountsStream(docs: DataFrame): DataFrame =
    graft.queries.TextQueries.bucketCounts(docs)

  /** Streaming PSI bucket counts — the incremental twin of batch q330:
    * the SAME fixed-boundary integer-cent bucketing and early/late
    * conditional counts (`TrainingQueries.psiBucketCounts`), maintained
    * as a state-finite streaming aggregation (8 groups, complete mode).
    * The PSI projection (`psiFromCounts`) runs on the CONVERGED counts
    * frame — same composition rule as the drift monitor: the counts ARE
    * the dashboard state; the smoothed ln terms are a stateless
    * projection over 8 rows. Parity gate twenty-eight.
    */
  def psiCountsStream(events: DataFrame): DataFrame =
    graft.queries.TrainingQueries.psiBucketCounts(events)

  /** Stream-static enrichment: each micro-batch joined to a STATIC
    * dimension frame (Structured Streaming re-resolves the static side
    * per batch; broadcast keeps it a map-side hash join — the standard
    * shape for enriching an event stream with a slowly-changing
    * dimension snapshot). Left join: events without a dimension row
    * survive with nulls rather than silently dropping.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Hopping-window totals — the streaming twin of batch q84: identical
    * 2h/1h window assignment and integer-cents money (floor before sum),
    * so a file replay's converged state equals the batch answer
    * row-for-row however micro-batches split the input.
    */
  def hoppingTotalsStream(events: DataFrame, watermark: String = "1 hour")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"),
           coalesce(sum(floor(col("value") * 100).cast("long")), lit(0L))
             .as("value_cents"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"), col("value_cents"))

  /** Streaming exact dedup — the ingest-time twin of the batch q40: drop
    * re-deliveries of the same document (keyed by content fingerprint)
    * as they arrive, with state bounded by the watermark.
    *
    * `dropDuplicatesWithinWatermark` keeps one state entry per key only
    * until the watermark passes its event time, so a 100 TB/day firehose
    * holds hours of keys, not the full corpus — the unbounded-state trap
    * of plain `dropDuplicates` on a stream. Exactly-once *within* the
    * watermark horizon; duplicates farther apart than the horizon need the
    * batch dedup family downstream.
    *
    * `docs` needs (ts, text) plus any payload columns; the fingerprint is
    * the same md5 the batch exact-dedup uses, so the two stages agree on
    * what "identical" means.
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Stream-stream attribution join: each purchase joined to the same
    * user's clicks in the preceding `horizon` — the streaming twin of the
    * batch as-of family (q58/q63), built on Spark's watermarked
    * stream-stream inner join.
    *
    * Both sides carry watermarks and the join condition bounds the time
    * range on BOTH ends (`c_ts <= p_ts` and `c_ts >= p_ts - horizon`), so
    * each side's join state is evicted once the other side's watermark
    * passes — bounded state on an unbounded firehose. Emits one row per
    * (click, purchase) pair in the horizon; downstream aggregation picks
    * last-touch/first-touch attribution.
    *
    * `clicks` and `purchases` need (user_id, ts) plus any payload columns
    * (event ids, campaign fields, ...); EVERY input column passes through,
    * prefixed c_/p_, so the attributed click stays identifiable.
    */
  /** Streaming twin of q111's interval-overlap join: a view opens a
    * `leftLen` window, a click opens a `rightLen` window, and a pair is
    * emitted when the two windows of the same user overlap. The overlap
    * predicate `v_start <= c_end && c_start <= v_end` rewrites to the
    * bounded time-range condition `c_ts ∈ [v_ts - rightLen, v_ts +
    * leftLen]`, which is exactly the shape Structured Streaming's
    * stream-stream join can bound state with: each side's watermark plus
    * the range condition lets expired rows be dropped, so state is
    * O(events in the overlap horizon), not O(stream).
    */
  def overlapStream(views: DataFrame, clicks: DataFrame,
                    leftLen: String = "10 minutes",
                    rightLen: String = "5 minutes",
                    watermark: String = "1 hour"): DataFrame = {
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
    val v = prefixed(views, "v_").withWatermark("v_ts", watermark)
    val c = prefixed(clicks, "c_").withWatermark("c_ts", watermark)
    v.join(c,
      col("v_user_id") === col("c_user_id") &&
        col("c_ts") >= col("v_ts") - expr(s"INTERVAL $rightLen") &&
        col("c_ts") <= col("v_ts") + expr(s"INTERVAL $leftLen"))
  }

  def attributionStream(clicks: DataFrame, purchases: DataFrame,
                        horizon: String = "1 hour",
                        watermark: String = "1 hour"): DataFrame = {
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
    val c = prefixed(clicks, "c_").withWatermark("c_ts", watermark)
    val p = prefixed(purchases, "p_").withWatermark("p_ts", watermark)
    c.join(p,
      col("c_user_id") === col("p_user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"))
  }

  /** Windowed quantile estimates over the stream via the MERGEABLE
    * [[graft.functions.QuantileSketch]] — the sketch's counting-vector
    * state is exactly what a streaming aggregation needs: micro-batch
    * partials merge by addition in the state store, so the converged
    * per-window estimate is identical to the batch computation on the
    * same data regardless of how the stream was micro-batched (the
    * parity gate replays a multi-batch file source to prove it).
    * `percentile_approx`'s order-sensitive buffer can promise no such
    * thing.
    */
  def windowedQuantilesStream(events: DataFrame, width: String = "1 day",
                              watermark: String = "1 hour"): DataFrame =
    events
      // the sketch's log-bins ignore non-positive values (q129 pairs the
      // same filter with it) — filtering FIRST keeps `n` consistent with
      // the population the quantiles describe, and an all-non-positive
      // window emits nothing instead of (n>0, NaN, NaN)
      .filter(col("value") > 0)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width))
      .agg(graft.functions.QuantileSketch.sketch(col("value")).as("sk"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"),
        round(col("sk.p50"), 4).as("p50"), round(col("sk.p95"), 4).as("p95"))

  /** Ingest-time benchmark decontamination screen — the streaming
    * composition of q182: documents arriving on the ingest stream are
    * checked against a STATIC benchmark index (one row per eval doc:
    * its pre-distinct shingle-hash array and its size) and every pair
    * whose containment (|intersection|·10⁴ DIV |eval shingles|, the
    * q182 integer rule) reaches `flagBp` is emitted. Entirely STATELESS:
    * a stream-static broadcast join plus a per-row `array_intersect`
    * projection — no aggregation state, no watermark, so ANY micro-batch
    * split is exactly the batch answer by construction, and the parity
    * gate proves it against the q182-style explode-join plan (two
    * different physical computations of the same containment rule must
    * agree pair-for-pair). At scale the static side is benchmark-sized
    * (O(eval) broadcast, same bound q182 proves) and each arriving doc
    * costs |eval| array intersections — constant per document.
    *
    * @param docs  streaming (doc_id, hs: array<long>) — pre-distinct
    *              shingle hashes, the ShingleHashes projection
    * @param evalIdx static (eval_id, eval_hs: array<long>, n_eval: long)
    */
  def decontamScreenStream(docs: DataFrame, evalIdx: DataFrame,
                           flagBp: Long = 5000): DataFrame =
    // own-contract guard (not just the callers'): an eval-index row with
    // an empty shingle array would divide by zero in the bp projection —
    // null/silently-dropped pair non-ANSI, runtime error under ANSI —
    // breaking the documented "any micro-batch split equals the batch
    // answer" property on a degenerate row. Such a row can never flag
    // anything anyway (overlap ≤ n_eval = 0), so dropping it is the only
    // answer consistent with the batch screen.
    docs.crossJoin(broadcast(evalIdx.filter(col("n_eval") > 0)))
      .withColumn("overlap",
        size(array_intersect(col("hs"), col("eval_hs"))).cast("long"))
      .withColumn("bp", expr("overlap * 10000 DIV n_eval"))
      .filter(col("bp") >= flagBp)
      .select("doc_id", "eval_id", "overlap", "bp")

  /** One CDC change-feed event: a key's new payload (or tombstone) at
    * feed position `seq` — the LSN a change feed ships so consumers can
    * order events per key without trusting arrival order. `change_type`
    * uses [[graft.operators.SnapshotDiff.diff]]'s vocabulary
    * (added/changed/removed); removed rows carry the superseded payload,
    * which the tombstone ignores. */
  final case class CdcEvent(key: Long, status: String, price: Double,
                            change_type: String, seq: Long)
  // not `private`: the state encoder's generated code must reach the
  // accessors (LatestState is public for the same reason)
  final case class CdcState(seq: Long, removed: Boolean,
                            status: String, price: Double, n: Long)
  /** The current compacted view of one key: its latest payload (or
    * tombstone) plus how many feed events have folded into it. */
  final case class CdcView(key: Long, removed: Boolean, status: String,
                           price: Double, n_events: Long)

  /** Streaming CDC upsert — the micro-batch twin of batch
    * [[graft.operators.SnapshotDiff.applyDelta]]: compact the change feed
    * per key to its highest-`seq` event (removes become tombstones) via
    * `mapGroupsWithState`, emitting the key's current view every batch
    * (OutputMode.Update). The fold is a per-key max on `seq`
    * (commutative + associative, `seq` unique per key as a change feed
    * guarantees), so ANY split of the feed across micro-batches — and any
    * interleaving of multiple delta GENERATIONS — converges to the same
    * compacted view; reconstructing the snapshot is then one stream-static
    * anti-join/union against the base, exactly applyDelta's plan shape.
    * State is O(live keys) — one ~40-byte record per key ever touched by
    * the feed, independent of feed length; at 100 TB the keys shard across
    * executors by groupByKey and the HDFS-backed state store holds what
    * RAM cannot. The thirteenth stream≡batch parity gate witnesses
    * stream-rebuilt == applyDelta∘applyDelta == cur with the
    * [[graft.operators.SnapshotDiff.fingerprint]] multiset witness.
    */
  def cdcUpsertStream(deltas: Dataset[CdcEvent]): Dataset[CdcView] = {
    import deltas.sparkSession.implicits._
    deltas
      .groupByKey(_.key)
      .mapGroupsWithState[CdcState, CdcView](
        GroupStateTimeout.NoTimeout()) {
        case (k, it, state: GroupState[CdcState]) =>
          // Option semantics for the first event: it folds UNCONDITIONALLY
          // into fresh state, so no seq value is a reserved sentinel — a
          // feed event carrying seq == Long.MinValue is counted AND can
          // become the view, instead of being silently uncountable.
          // (`it` is non-empty: with NoTimeout the function only runs for
          // keys that received data this batch.)
          var s: CdcState = state.getOption.orNull
          it.foreach { e =>
            s =
              if (s == null)
                CdcState(e.seq, e.change_type == "removed", e.status,
                  e.price, 1L)
              else if (e.seq > s.seq)
                CdcState(e.seq, e.change_type == "removed", e.status,
                  e.price, s.n + 1)
              else s.copy(n = s.n + 1)
          }
          state.update(s)
          CdcView(k, s.removed, s.status, s.price, s.n)
      }
  }

  /** Versioned event for latest-per-key compaction (ts in micros). */
  final case class VersionedEvent(user_id: Long, event_id: Long, us: Long,
                                  event_type: String, value: Double)
  final case class LatestState(event_id: Long, us: Long, event_type: String,
                               value: Double, n: Long)
  final case class LatestRow(user_id: Long, n_versions: Long,
                             latest_event_id: Long, latest_ts_us: Long,
                             latest_type: String, latest_value: Double)

  /** Latest-per-key compaction — the streaming upsert view, twin of batch
    * q128: per-key state is one (ts, id, payload) record plus a version
    * counter; each micro-batch folds its events with the same (us,
    * event_id) lexicographic max the batch struct-max uses. The fold is a
    * commutative max, so arrival order — within a batch or across
    * batches — cannot change the converged answer; the emitted row per
    * key per batch is the current compacted view (OutputMode.Update).
    * State is O(keys), never O(events).
    */
  def latestStream(events: Dataset[VersionedEvent]): Dataset[LatestRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[LatestState, LatestRow](
        GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[LatestState]) =>
          // same first-event-unconditional fold as cdcUpsertStream: no
          // (us, event_id) value is a reserved sentinel
          var s: LatestState = state.getOption.orNull
          it.foreach { e =>
            val newer = s == null || e.us > s.us ||
              (e.us == s.us && e.event_id > s.event_id)
            val n = if (s == null) 1L else s.n + 1
            s =
              if (newer)
                LatestState(e.event_id, e.us, e.event_type, e.value, n)
              else s.copy(n = n)
          }
          state.update(s)
          LatestRow(uid, s.n, s.event_id, s.us, s.event_type, s.value)
      }
  }

  /** One signed group-aggregate contribution from a CDC before/after
    * delta (the q221 representation): −1/−cents under the row's BEFORE
    * group, +1/+cents under its AFTER group. */
  final case class AggDelta(g: String, dn: Long, dc: Long)
  final case class AggState(n: Long, cents: Long, n_deltas: Long)
  /** The maintained per-group view: running count and Σcents, plus how
    * many delta contributions have folded in. */
  final case class AggView(g: String, n: Long, cents: Long, n_deltas: Long)

  /** Streaming incremental view maintenance — the `mapGroupsWithState`
    * twin of batch q221: a per-group (count, Σcents) view is SEEDED from
    * the existing materialized aggregate (`initialState` — the view
    * itself is the state, loaded without rescanning any history) and then
    * maintained from signed delta contributions alone. The fold is pure
    * addition — commutative and associative — so ANY split of the
    * contribution stream across micro-batches, and any arrival order
    * within them, converges to the same view (the parity gate replays an
    * adversarial file split and matches the batch recompute group-for-
    * group). State is O(groups) — exactly the materialized view's
    * cardinality, independent of delta volume; at 100 TB groups shard by
    * key across executors and a changed row's cross-group move arrives
    * as two independent contributions that need no coordination (each
    * lands on its own group's state).
    */
  def ivmAggStream(deltas: Dataset[AggDelta],
                   initView: Dataset[AggView]): Dataset[AggView] = {
    import deltas.sparkSession.implicits._
    val init = initView.groupByKey(_.g)
      .mapValues(v => AggState(v.n, v.cents, v.n_deltas))
    deltas.groupByKey(_.g)
      .mapGroupsWithState[AggState, AggView](
        GroupStateTimeout.NoTimeout(), init) {
        case (g, it, state: GroupState[AggState]) =>
          var s = state.getOption.getOrElse(AggState(0L, 0L, 0L))
          it.foreach { d =>
            s = AggState(s.n + d.dn, s.cents + d.dc, s.n_deltas + 1)
          }
          state.update(s)
          AggView(g, s.n, s.cents, s.n_deltas)
      }
  }

  /** A token arrival for the heavy-hitter screen: `part` is the LOGICAL
    * partition (doc_id mod P), (doc_id, pos) pins fold order in a batch.
    */
  final case class TokEvent(part: Long, doc_id: Long, pos: Long,
                            tok: String)
  final case class MgState(counters: Map[String, Long], nSeen: Long)
  final case class MgRow(part: Long, tok: String, est: Long,
                         n_seen: Long)

  /** Ingest-time Misra–Gries heavy-hitter screen — the STREAMING side of
    * q311's mergeable-summary family: per logical partition the state is
    * a bounded k-counter map (O(k), never O(distinct tokens) — the whole
    * point of MG over a plain streaming groupBy count, whose state grows
    * with the vocabulary). Classic update: tracked token increments; an
    * untracked token takes a free slot, else ALL counters decrement by 1
    * (zeros evicted) and the arrival is dropped. Fold order inside one
    * micro-batch is pinned by (doc_id, pos) — the GroupState iterator
    * itself carries no order guarantee. MG's deterministic guarantee
    * holds under ANY batch split: for every token x with true partition
    * frequency f(x), est(x) ≤ f(x) ≤ est(x) + ⌊N_p/(k+1)⌋, and every x
    * with f(x) > ⌊N_p/(k+1)⌋ is tracked — exactly what the parity gate
    * asserts against the exact batch counts. Emits the full summary per
    * batch (Update mode); the converged summary is the rows at the
    * maximum n_seen per partition.
    *
    * Memory: persisted STATE is O(k) per partition as advertised, but the
    * per-micro-batch fold materializes and sorts the group's batch slice
    * (`it.toSeq.sortBy`) for a deterministic fold order, so TRANSIENT
    * executor memory is O(tokens per partition per batch). In practice
    * source batch sizing (maxFilesPerTrigger / maxOffsetsPerTrigger)
    * bounds it; it is not the O(k) of the state store.
    */
  def heavyHittersStream(toks: Dataset[TokEvent], k: Int = 16)
      : Dataset[MgRow] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.part)
      .flatMapGroupsWithState[MgState, MgRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        case (part, it, state: GroupState[MgState]) =>
          var s = state.getOption.getOrElse(MgState(Map.empty, 0L))
          it.toSeq.sortBy(e => (e.doc_id, e.pos)).foreach { e =>
            val c = s.counters
            val next =
              if (c.contains(e.tok)) c.updated(e.tok, c(e.tok) + 1)
              else if (c.size < k) c.updated(e.tok, 1L)
              else c.collect {
                case (t, n) if n > 1 => t -> (n - 1)
              }
            s = MgState(next, s.nSeen + 1)
          }
          state.update(s)
          s.counters.toSeq.sortBy(_._1)
            .map { case (t, n) => MgRow(part, t, n, s.nSeen) }.iterator
      }
  }
}
