package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DoubleType

/** Event-time streaming operators over event-shaped data (`ts`, `user_id`,
  * `event_type`, `value`): watermarked tumbling windows, native gap
  * sessions, and custom per-key state. Each function takes a DataFrame that
  * may be BATCH or STREAMING — identical semantics either way, which is how
  * the specs verify them (stream result ≡ batch result on the same data)
  * and how a backfill can reuse the live-query code path.
  *
  * Scale: every operator here shuffles once on its grouping key and holds
  * only per-group state; watermarks bound state size for unbounded streams.
  */
object EventStream {

  /** Tumbling 1-hour event-time aggregation with a watermark — the
    * streaming twin of the batch query `q15_time_window`. The watermark
    * lets Spark finalize + evict window state once event time passes
    * `window end + delay`; without it an unbounded stream's state grows
    * forever. */
  def hourlyStats(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Grid.sum2($"value").as("sum_value"))
      .select(unix_millis($"window.start").as("hour_ms"), $"event_type",
        $"n", $"sum_value")
  }

  /** HOPPING (sliding) 1-hour window with a 15-minute slide: each event
    * lands in 4 overlapping windows — the trailing-hour-refreshed-every-
    * quarter-hour dashboards are built from. Same watermark/state story as
    * [[hourlyStats]], ×(window/slide) state entries per key. Batch twin
    * under the oracle gate: `q48_sliding_window`. */
  def slidingStats(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Grid.sum2($"value").as("sum_value"))
      .select(unix_millis($"window.start").as("ws_ms"), $"event_type",
        $"n", $"sum_value")
  }

  /** Gap-based sessions via native `session_window` (30-min inactivity) —
    * the declarative streaming twin of `q20_sessionize`'s window-function
    * formulation. Catalyst merges overlapping session fragments across
    * micro-batches; the watermark finalizes sessions. */
  def gapSessions(events: DataFrame, gap: String = "30 minutes",
                  watermarkDelay: String = "2 hours"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window($"ts", gap), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Grid.sum2($"value").as("sum_value"))
      .select($"user_id",
        unix_millis($"session_window.start").as("start_ms"),
        unix_millis($"session_window.end").as("end_ms"),
        $"n_events", $"sum_value")
  }

  /** Stream-static enrichment join: the static dimension side is re-read
    * per micro-batch (so dimension updates are picked up) and broadcast
    * when small — the standard shape for decorating a 100 TB/day stream
    * with reference data. Works identically in batch mode. */
  def enrich(events: DataFrame, dim: DataFrame, joinCol: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), joinCol)

  /** Streaming dedup by message id — the EFFECTIVELY-ONCE layer over the
    * engine's at-least-once delivery (O6/O13: checkpoint replay and
    * ack-deadline redelivery both re-emit messages; the reference's Pub/Sub
    * has exactly the same duplicate window). `dropDuplicatesWithinWatermark`
    * keeps one row per id and EVICTS each id's state once the watermark
    * passes it — so state is bounded by the duplicate horizon (how late a
    * replay can arrive), not by stream history. Use this between a
    * subscription and an append sink when the consumer cannot tolerate
    * duplicates but a full MergeSink upsert is overkill. */
  def dedupById(events: DataFrame, idCol: String = "event_id",
                tsCol: String = "ts",
                watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream self-join: pairs each purchase with the same user's
    * clicks in the preceding hour. Both sides carry watermarks, and the
    * time-bound predicate lets Spark EVICT buffered state older than the
    * bound — without it a stream-stream join buffers forever. Identical
    * semantics in batch mode (the specs' oracle). */
  def purchasesWithRecentClicks(events: DataFrame,
                                watermarkDelay: String = "1 hour"): DataFrame =
    intervalJoin(events, watermarkDelay, "inner")

  /** LEFT OUTER stream-stream interval join: every purchase emits — paired
    * with each preceding-hour click, or with NULL click columns when none
    * exists. Outer emission in streaming is WATERMARK-DRIVEN: the null row
    * for an unmatched purchase can only be produced once the click-side
    * watermark proves no qualifying click can still arrive (the same
    * instant its buffered state is evicted), so result completeness and
    * state eviction are one mechanism — there is no unbounded buffering
    * and no early false-negative. Batch mode runs the identical plan with
    * plain left-join semantics (EventStreamSpec proves stream ≡ batch;
    * `q56_outer_interval_join` puts the batch run under the DuckDB gate). */
  def purchasesWithRecentClicksOuter(events: DataFrame,
                                     watermarkDelay: String = "1 hour"): DataFrame =
    intervalJoin(events, watermarkDelay, "leftOuter")

  /** ONE definition of the watermark wiring, interval predicate, and
    * output projection for both join flavors — the inner/outer pair's
    * documented relationship (outer restricted to matched rows ≡ inner,
    * asserted by EventStreamSpec) must not be able to drift. */
  private def intervalJoin(events: DataFrame, watermarkDelay: String,
                           joinType: String): DataFrame = {
    import events.sparkSession.implicits._
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"),
        $"event_id".as("click_id"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"),
        $"event_id".as("purchase_id"), $"value")
      .withWatermark("purchase_ts", watermarkDelay)
    purchases.join(clicks,
      $"user_id" === $"c_user" &&
        $"click_ts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR") &&
        $"click_ts" <= $"purchase_ts",
      joinType)
      .select($"user_id", $"purchase_id", $"click_id",
        unix_millis($"purchase_ts").as("purchase_ms"),
        unix_millis($"click_ts").as("click_ms"), $"value")
  }

  final case class EventRow(ts: java.sql.Timestamp, user_id: Long,
                            event_type: String, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
                              n_events: Long, sum_value: Double)

  /** Custom per-key state (the `flatMapGroupsWithState` surface): emits a
    * finalized session row when a key's inactivity gap elapses in EVENT
    * time within the group's sorted batch, and on state timeout for the
    * tail session. Use when session output needs logic `session_window`
    * can't express (e.g. emitting partial summaries, side effects,
    * capped-length sessions). */
  def statefulSessions(events: Dataset[EventRow], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed: close the tail session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.startMs, s.lastMs, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            for (e <- sorted) {
              val ms = e.ts.getTime
              cur match {
                case Some(s) if ms - s.lastMs <= gapMs =>
                  cur = Some(s.copy(lastMs = ms, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  out += SessionOut(userId, s.startMs, s.lastMs, s.n, s.sum)
                  cur = Some(SessionState(ms, ms, 1, e.value))
                case None =>
                  cur = Some(SessionState(ms, ms, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            out.result().iterator
          }
      }
  }

  final case class SpanRow(ts: java.sql.Timestamp, user_id: Long,
                           st: Long, en: Long)
  final case class SpanState(spans: List[(Long, Long)])
  final case class SpanOut(user_id: Long, s0: Long, e1: Long)

  /** Streaming interval-coverage merge — the stateful twin of the batch
    * `q263_interval_coverage` (the uptime/viewability monitor as it
    * actually deploys): per-key state is the OPEN coverage spans (the
    * touch-closed union of every interval seen so far whose span the
    * watermark has not yet passed), each batch's intervals merge into
    * that set with one sorted sweep, and a span row is emitted exactly
    * when the watermark clears its end — at that point no future
    * interval (whose start is ≥ the watermark) can extend or merge it,
    * so the emission is final. Coverage of a SET of intervals is
    * order-independent (it is the union), so out-of-order arrival
    * within the watermark is harmless by construction.
    *
    * State is O(open spans) per key — arrival rate × watermark delay,
    * never stream history (the q163 bounded-state contract): every
    * closed span leaves the store the batch the watermark passes it. */
  def coverageSpans(intervals: Dataset[SpanRow]): Dataset[SpanOut] = {
    import intervals.sparkSession.implicits._
    intervals
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SpanState, SpanOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[SpanRow], state: GroupState[SpanState]) =>
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption.map(_.spans).getOrElse(Nil)
          val fresh = rows.map(r => (r.st, r.en)).toSeq.sortBy(identity)
          // touch-closed union sweep ([a,b) ∪ [b,c) = [a,c), q263's
          // st > prevMax break rule) over the already-disjoint prior
          // spans and the batch's sorted intervals
          val merged = List.newBuilder[(Long, Long)]
          var cur: Option[(Long, Long)] = None
          for ((s0, e1) <- (prior ++ fresh).sortBy(identity)) cur match {
            case Some((cs, ce)) if s0 <= ce => cur = Some((cs, math.max(ce, e1)))
            case Some(c) => merged += c; cur = Some((s0, e1))
            case None => cur = Some((s0, e1))
          }
          cur.foreach(merged += _)
          // a span whose end the watermark passed can never be touched
          // again (future starts are ≥ wm > end) — emit and drop it
          val (done, open) = merged.result().partition(_._2 < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SpanState(open))
            state.setTimeoutTimestamp(math.max(open.head._2, wm + 1))
          }
          done.iterator.map { case (s0, e1) => SpanOut(uid, s0, e1) }
      }
  }

  final case class FunnelEvent(ts: java.sql.Timestamp, user_id: Long,
                               event_type: String)
  /** -1 = stage not reached (case-class state must be flat for the
    * encoder; Options live only in the OUTPUT row). */
  final case class FunnelState(view: Long, click: Long, purchase: Long)
  final case class FunnelOut(user_id: Long, stage: Long,
                             t_view_ms: Option[Long], t_click_ms: Option[Long],
                             t_purchase_ms: Option[Long])

  /** Streaming funnel progression — the stateful twin of the batch
    * `q76_funnel`: per-user state is the three stage timestamps, and a row
    * is emitted exactly when a user ADVANCES a stage — the funnel-progress
    * event stream a live conversion dashboard tails (the latest emission
    * per user is that user's current verdict). Within a micro-batch,
    * events are sorted by (ms, stage order), so any single batch
    * reproduces the batch query's min-based sequencing EXACTLY; across
    * batches the first-qualifying rule equals batch whenever events
    * arrive in event-time order — the same in-order contract (and the
    * same first-arrival stance) as CorpusStream, asserted by
    * EventStreamSpec. State is three longs per user, the smallest
    * possible footprint for ordered-sequence detection; `stateTtlMs`
    * bounds it (the CorpusStream mechanism: every sighting of the user
    * refreshes the horizon, a user unseen for the full horizon is
    * dropped and restarts the funnel from stage 0 on their next event —
    * the campaign-window semantics a live dashboard wants anyway). With
    * None, every user's state lives for the stream's lifetime. */
  def funnelProgress(events: Dataset[FunnelEvent],
                     stateTtlMs: Option[Long] = None): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val rank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    val timeoutConf =
      if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), timeoutConf) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove() // campaign horizon passed: forget the user
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            val entry = s
            def stageOf(x: FunnelState): Long =
              Seq(x.view, x.click, x.purchase).takeWhile(_ >= 0).size.toLong
            var stage = stageOf(s)
            val out = Seq.newBuilder[FunnelOut]
            val sorted = rows.toSeq.filter(e => rank.contains(e.event_type))
              .sortBy(e => (e.ts.getTime, rank(e.event_type)))
            for (e <- sorted) {
              val ms = e.ts.getTime // the shared ms grid (q44 convention)
              e.event_type match {
                case "view" if s.view < 0 => s = s.copy(view = ms)
                case "click" if s.view >= 0 && s.click < 0 && ms >= s.view =>
                  s = s.copy(click = ms)
                case "purchase" if s.click >= 0 && s.purchase < 0 && ms >= s.click =>
                  s = s.copy(purchase = ms)
                case _ => () // non-advancing event
              }
              val ns = stageOf(s)
              if (ns > stage) {
                stage = ns
                out += FunnelOut(uid, ns,
                  Some(s.view).filter(_ >= 0), Some(s.click).filter(_ >= 0),
                  Some(s.purchase).filter(_ >= 0))
              }
            }
            if (s != entry) state.update(s)
            // refresh the horizon on EVERY sighting of a known user, not
            // just advances — an active-but-not-advancing user must not age
            if (state.exists) stateTtlMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}
