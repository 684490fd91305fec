package graft.queries

import graft.Tables
import graft.cdc.Cdc
import graft.stream.Conform
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Queries over the `events` stream-shaped table: JSON extraction, event-time
  * windows, sessionization, and batch-verifiable versions of the CDC pipeline
  * operators (SURVEY.md §2 O3/O4/O11, O26).
  *
  * The cdc_* queries synthesize Debezium-shaped envelopes from `events` rows
  * in-plan (to_json), then run the REAL pipeline code ([[Cdc]] / [[Conform]])
  * over them — so the DuckDB oracle can verify the pipeline semantics without
  * needing a streaming runtime on the oracle side.
  *
  * Timestamp note: `events.ts` is nanosecond-precision parquet; Spark reads it
  * truncated to µs while DuckDB keeps ns. All outputs and comparisons
  * therefore go through millisecond epochs (unix_millis / epoch_ms), where
  * both engines agree by truncation.
  */
object EventQueries {


  /** The row carried inside the synthetic CDC envelope. */
  private val cdcRowSchema = StructType(Seq(
    StructField("id", LongType), StructField("user_id", LongType),
    StructField("etype", StringType), StructField("val", DoubleType)))

  private val topicSchema = StructType(Seq(
    StructField("id", LongType), StructField("user_id", LongType),
    StructField("etype", StringType), StructField("__deleted", StringType)))

  private val sinkSchema = StructType(Seq(
    StructField("id", LongType), StructField("user_id", LongType),
    StructField("etype", StringType), StructField("age", LongType),
    StructField("__deleted", StringType)))

  /** events rows wrapped into Debezium envelopes, serialized to JSON — the
    * wire format the CDC pipeline consumes ('error' events play deletes).
    *
    * Source-sorted by `event_id`: the cdc_* outputs must be id-ordered for
    * the oracle compare, and a TRAILING global sort would make the range
    * partitioner's sampling pass re-execute the whole serialize→parse span
    * (measured ~2× wall time). Sorting the cheap source scan instead costs
    * one sample of the raw parquet; every downstream op is narrow, so the
    * order survives to the output — same rows, same order, one JSON pass. */
  private def envelopes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).orderBy($"event_id")
    val row = struct($"event_id".as("id"), $"user_id",
      $"event_type".as("etype"), $"value".as("val"))
    val isDel = $"event_type" === "error"
    ev.select(to_json(struct(
      when(isDel, row).as("before"),
      when(!isDel, row).as("after"),
      struct(lit("debezium_test").as("db"), lit("people").as("table")).as("source"),
      when(isDel, lit("d")).when($"event_type" === "signup", lit("c"))
        .otherwise(lit("u")).as("op"),
      unix_millis($"ts").as("ts_ms"))).as("value"))
  }

  /** cdc_unwrap — O2+O3+O4: parse envelope JSON, include-filter, flatten with
    * delete-rewrite. Pure narrow ops; one codegen span over the scan. */
  def cdcUnwrap(s: SparkSession, dir: String): DataFrame = {
    val parsed = Cdc.parseEnvelope(envelopes(s, dir), "value", cdcRowSchema)
    // id order inherited from the source-sorted envelopes (see above)
    Cdc.unwrapRewrite(Cdc.includeFilter(parsed, "debezium_test", "people"))
  }

  val cdcUnwrapSql: String =
    """SELECT event_id AS id, user_id, event_type AS etype, value AS val,
      |  CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
      |FROM events ORDER BY id""".stripMargin

  /** cdc_conform — O7+O11: topic-schema validation (drops the unknown `val`
    * field) then sink conformance (null-fills the sink-only `age` column). */
  def cdcConform(s: SparkSession, dir: String): DataFrame = {
    val parsed = Cdc.parseEnvelope(envelopes(s, dir), "value", cdcRowSchema)
    val rows = Cdc.unwrapRewrite(Cdc.includeFilter(parsed, "debezium_test", "people"))
    // id order inherited from the source-sorted envelopes (see above)
    Conform.conformToSink(
      Conform.validateAgainstTopic(rows, topicSchema), topicSchema, sinkSchema)
  }

  val cdcConformSql: String =
    """SELECT event_id AS id, user_id, event_type AS etype,
      |  CAST(NULL AS BIGINT) AS age,
      |  CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
      |FROM events ORDER BY id""".stripMargin

  /** q14_events_json — JSON field extraction + aggregation (O5 surface). */
  def q14EventsJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type",
        get_json_object($"props", "$.k").cast(LongType).as("k"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  val q14Sql: String =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q15_time_window — tumbling 1-hour event-time window aggregation: the
    * batch twin of the Structured Streaming windowed agg in
    * [[graft.streaming.EventStream.hourlyStats]]. Window start is emitted as an epoch-ms
    * BIGINT: Spark's µs timestamps and the oracle's ns timestamps serialize
    * differently, but truncate to identical milliseconds. */
  def q15TimeWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(unix_millis(date_trunc("hour", $"ts")).as("hour_ms"), $"event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Grid.sum2($"value").as("sum_value"))
      .orderBy($"hour_ms", $"event_type")
  }

  val q15Sql: String =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
      |  count(*) AS n, (CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""".stripMargin

  /** q16_cdc_latest — O26 latest-change-wins merge as a batch query: one row
    * per key, newest by (ts, event_id). The same window runs inside the
    * streaming merge sink's foreachBatch. */
  def q16CdcLatest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // recency at ms precision + unique-id tie-break: deterministic and
    // identical across Spark (µs timestamps) and the ns-precision oracle
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_millis($"ts").desc, $"event_id".desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
      .orderBy($"user_id")
  }

  val q16Sql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q20_sessionize — gap-based sessionization (30-min inactivity): lag +
    * running sum of session-start markers, then per-session rollup. One
    * shuffle on user_id serves both windows and the final aggregation. */
  def q20Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // order by the ms epoch (not raw ts): keeps the tie-break identical to
    // the oracle, which only sees ms precision
    val byUser = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    val gapMs = 30L * 60 * 1000
    Tables.events(s, dir)
      .withColumn("ms", unix_millis($"ts"))
      .withColumn("prev_ms", lag($"ms", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_ms".isNull || $"ms" - $"prev_ms" > gapMs, 1L).otherwise(0L))
      .withColumn("sess_seq", sum($"new_sess")
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_seq")
      .agg(count(lit(1)).as("n_events"),
        min($"ms").as("start_ms"), max($"ms").as("end_ms"),
        graft.functions.Grid.sum2($"value").as("sum_value"))
      .orderBy($"user_id", $"sess_seq")
  }

  val q20Sql: String =
    """SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq, count(*) AS n_events,
      |  min(ms) AS start_ms, max(ms) AS end_ms,
      |  (CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value
      |FROM (
      |  SELECT user_id, ms, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS sess_seq
      |  FROM (
      |    SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
      |      CASE WHEN lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
      |             OR epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 1800000
      |           THEN 1 ELSE 0 END AS new_sess
      |    FROM events) marked) sessions
      |GROUP BY user_id, sess_seq ORDER BY user_id, sess_seq""".stripMargin

  /** q39_percentile — exact interpolated percentiles (median / p95) of the
    * event value per type: the latency/score-distribution primitive. Spark's
    * `percentile` is the sort-based exact aggregate with linear
    * interpolation — the same definition as DuckDB `quantile_cont` — so the
    * grid-snapped (round 6) results hash-match. At scale the partial
    * aggregation ships per-type value buffers, bounded by group count ×
    * values; for sketch-sized state the approx variant is the drop-in —
    * see [[q45ApproxStats]], whose error contract SketchSpec asserts. */
  def q39Percentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  val q39Sql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.95), 6) AS p95,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q48_sliding_window — hopping-window aggregation (1-hour window,
    * 15-minute slide): the batch run of the STREAMING operator
    * [[graft.streaming.EventStream.slidingStats]] (same code path — the
    * operator is batch/stream agnostic, which is also how EventStreamSpec
    * proves stream ≡ batch). Every event contributes to window/slide = 4
    * overlapping windows; the oracle replays that as an explicit ×4
    * window-start expansion in integer ms arithmetic (`epoch_ms -
    * epoch_ms % slide - i*slide`), which is exactly Spark's epoch-aligned
    * window assignment on the ms grid. */
  def q48SlidingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.streaming.EventStream.slidingStats(Tables.events(s, dir))
      .orderBy($"ws_ms", $"event_type")
  }

  val q48Sql: String =
    """SELECT ws_ms, event_type, count(*) AS n,
      |  (CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value
      |FROM (
      |  SELECT epoch_ms(ts) - (epoch_ms(ts) % 900000) - i * 900000 AS ws_ms,
      |         event_type, value
      |  FROM events CROSS JOIN range(4) r(i))
      |GROUP BY ws_ms, event_type
      |ORDER BY ws_ms, event_type""".stripMargin

  /** q45's measurement core: the raw SKETCH aggregates a 100 TB user
    * reaches for first — `approx_count_distinct` (HyperLogLog++, fixed
    * ~kB state per group vs an exact distinct's shuffle of every distinct
    * value) and `approx_percentile` (Greenwald-Khanna-style quantile
    * summary, state bounded by the accuracy parameter vs `percentile`'s
    * full value buffer). Both are partial-aggregable one-pass sketches —
    * the at-scale drop-ins for q12's exact distinct and q39's exact
    * percentiles. SketchSpec asserts the error bounds on these raw
    * estimates directly; [[q45ApproxStats]] turns them into the
    * oracle-checkable verdict. */
  private[graft] def q45Sketches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", rsd = 0.05).as("du_approx"),
        expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"),
        expr("approx_percentile(value, 0.95, 10000)").as("p95_approx"),
        count(lit(1)).as("n"))
  }

  /** q45_approx_stats — sketch aggregates UNDER THE ORACLE GATE. Sketch
    * estimates themselves are implementation-specific (DuckDB's HLL and
    * quantile summaries are different algorithms), so the raw estimates
    * can never hash-match an oracle. What CAN: the exact group stats and
    * the documented accuracy contract as a boolean verdict. This query
    * runs the sketches ([[q45Sketches]]), broadcasts the tiny per-group
    * estimate table back into ONE exact pass, and emits per group the
    * exact `n`/`du_exact` plus three BIGINT verdicts — `hll_ok`
    * (|approx−exact| ≤ 3·rsd·exact, the HLL++ 3σ bound) and
    * `p50_ok`/`p95_ok` (the returned element's empirical rank within
    * 1/accuracy of the target quantile, +1 row of slack because the sketch
    * returns an actual element). The oracle states the contract — literal
    * 1s next to DuckDB's exact stats — so a sketch drifting out of bound
    * flips a verdict to 0 and fails the hash compare. All verdict
    * arithmetic is integer (counts scaled by the bound's denominators):
    * no float rounding can disagree between engines.
    *
    * Scale shape: the sketch pass is the production artifact (fixed-size
    * partial-aggregable state); the exact pass exists to certify it and
    * costs one distinct-expand over events — the certification harness, by
    * construction the thing the sketches REPLACE at 100 TB. */
  def q45ApproxStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sk = q45Sketches(s, dir) // one row per event_type — broadcast side
    val exact = Tables.events(s, dir)
      .select($"event_type", $"user_id", $"value")
      .join(broadcast(sk), "event_type")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"user_id").as("du_exact"),
        max($"du_approx").as("du_a"), // constant within the group
        sum(when($"value" < $"p50_approx", 1L).otherwise(0L)).as("lt50"),
        sum(when($"value" <= $"p50_approx", 1L).otherwise(0L)).as("le50"),
        sum(when($"value" < $"p95_approx", 1L).otherwise(0L)).as("lt95"),
        sum(when($"value" <= $"p95_approx", 1L).otherwise(0L)).as("le95"))
    // rank-window verdict for quantile num/den with accuracy 10000:
    // rank(< v) may not exceed ceil(q·n)+slack and rank(<= v) must reach
    // floor(q·n)−slack, slack = n/10000 + 1 rows — all integer arithmetic
    def idiv(a: Column, b: Long): Column = call_function("div", a, lit(b))
    def rankOk(lt: Column, le: Column, num: Long, den: Long): Column = {
      val slack = idiv($"n", 10000L) + 1L
      val lo = idiv(lit(num) * $"n", den)                  // floor(q·n)
      val hi = idiv(lit(num) * $"n" + lit(den - 1), den)   // ceil(q·n)
      ((le + slack >= lo) && (lt <= hi + slack)).cast("long")
    }
    exact.select($"event_type", $"n", $"du_exact",
        (abs($"du_a" - $"du_exact") * 100L <= $"du_exact" * 15L).cast("long").as("hll_ok"),
        rankOk($"lt50", $"le50", 1L, 2L).as("p50_ok"),
        rankOk($"lt95", $"le95", 19L, 20L).as("p95_ok"))
      .orderBy($"event_type")
  }

  /** q45 oracle: DuckDB computes the exact side; the verdict columns are
    * the CONTRACT — literal 1s. A sketch out of bound emits 0 on the
    * Spark side and the driver's hash compare catches it. */
  val q45Sql: String =
    """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS du_exact,
      |  CAST(1 AS BIGINT) AS hll_ok, CAST(1 AS BIGINT) AS p50_ok,
      |  CAST(1 AS BIGINT) AS p95_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q46_interval_join — batch twin of the stream-stream interval join
    * ([[graft.streaming.EventStream.purchasesWithRecentClicks]]): each
    * purchase paired with the same user's clicks in the preceding hour.
    * The streaming op compares raw (µs) timestamps so its join predicate
    * can drive watermark state eviction; this twin compares ms epochs —
    * the only grid where Spark's µs-truncated and the oracle's ns-precision
    * timestamps agree (the q44 convention). EventStreamSpec proves the
    * stream op ≡ its own batch execution; this query puts the batch
    * semantics under the DuckDB hash gate.
    *
    * Scale shape: one shuffle of each filtered side on user_id; per-key
    * state is bounded by the hour window, output by pair cardinality. */
  def q46IntervalJoin(s: SparkSession, dir: String): DataFrame =
    msIntervalJoin(s, dir, "inner")

  /** ONE definition of the ms-grid predicate and projection for q46/q56 —
    * the q44 timestamp-grid convention must not fork between the twins.
    * The nulls-first sort is a no-op for the inner flavor (no nulls) and
    * pins the q56 hash order. */
  private def msIntervalJoin(s: SparkSession, dir: String, joinType: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), unix_millis($"ts").as("click_ms"),
        $"event_id".as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_millis($"ts").as("purchase_ms"),
        $"event_id".as("purchase_id"), $"value")
    purchases.join(clicks,
      $"user_id" === $"c_user" &&
        $"click_ms" >= $"purchase_ms" - lit(3600000L) &&
        $"click_ms" <= $"purchase_ms",
      joinType)
      .select($"user_id", $"purchase_id", $"click_id",
        $"purchase_ms", $"click_ms", $"value")
      .orderBy($"purchase_id", $"click_id".asc_nulls_first)
  }

  val q46Sql: String =
    """WITH clicks AS (
      |  SELECT user_id AS c_user, epoch_ms(ts) AS click_ms, event_id AS click_id
      |  FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, epoch_ms(ts) AS purchase_ms, event_id AS purchase_id, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, purchase_id, click_id, purchase_ms, click_ms, value
      |FROM purchases p JOIN clicks c ON p.user_id = c.c_user
      |  AND c.click_ms >= p.purchase_ms - 3600000
      |  AND c.click_ms <= p.purchase_ms
      |ORDER BY purchase_id, click_id""".stripMargin

  /** q56_outer_interval_join — batch twin of the LEFT OUTER stream-stream
    * interval join ([[graft.streaming.EventStream.purchasesWithRecentClicksOuter]]):
    * q46's pairing, but every purchase emits — unattributed ones with NULL
    * click columns (the attribution-pipeline contract: revenue rows must
    * land even when no touchpoint exists). In streaming the null rows are
    * watermark-driven (emitted exactly when state eviction proves no match
    * can arrive); in batch it is a plain left join — EventStreamSpec
    * proves the two executions agree, this query hash-gates the batch one.
    *
    * Scale shape: identical to q46 (one shuffle per side on user_id);
    * NULL-first ordering pinned on both engines for the hash compare. */
  def q56OuterIntervalJoin(s: SparkSession, dir: String): DataFrame =
    msIntervalJoin(s, dir, "leftOuter")

  val q56Sql: String =
    """WITH clicks AS (
      |  SELECT user_id AS c_user, epoch_ms(ts) AS click_ms, event_id AS click_id
      |  FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, epoch_ms(ts) AS purchase_ms, event_id AS purchase_id, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, purchase_id, click_id, purchase_ms, click_ms, value
      |FROM purchases p LEFT JOIN clicks c ON p.user_id = c.c_user
      |  AND c.click_ms >= p.purchase_ms - 3600000
      |  AND c.click_ms <= p.purchase_ms
      |ORDER BY purchase_id, click_id NULLS FIRST""".stripMargin

  /** q51_range_frame — RANGE-framed window: per user, the trailing-hour
    * running sum/count at every event (`rangeBetween(-1h, now)` over the
    * ms epoch). A RANGE frame bounds by ORDER-BY VALUE distance, not row
    * count — the per-entity rolling-metric primitive (rate limiting,
    * trailing spend, burst detection) that ROWS frames cannot express when
    * events are unevenly spaced. One shuffle on user_id; per-partition
    * state is the frame's sliding buffer. Decimal-grid sums, the q1/q15
    * parity convention. */
  def q51RangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ms")
      .rangeBetween(-3600000L, 0L)
    Tables.events(s, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"),
        graft.functions.Grid.units2($"value").as("v"))
      .select($"user_id", $"event_id", $"ms",
        (sum($"v").over(w) / 100.0).cast(DoubleType).as("trailing_hour_sum"),
        count(lit(1)).over(w).as("trailing_hour_n"))
      .orderBy($"user_id", $"ms", $"event_id")
  }

  val q51Sql: String =
    """SELECT user_id, event_id, ms,
      |  (CAST(sum(v) OVER w AS DOUBLE) / 100.0) AS trailing_hour_sum,
      |  count(*) OVER w AS trailing_hour_n
      |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ms
      |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ms, event_id""".stripMargin

  /** q49_pivot — `groupBy(user).pivot(event_type)`: long→wide reshaping,
    * the report/feature-matrix primitive. The pivot VALUES are declared
    * (not discovered), so the plan is a single aggregation pass with a
    * fixed output schema — no driver-side distinct scan, which is the only
    * pivot formulation that scales. Spark leaves never-hit cells NULL
    * (count included), hence the explicit coalesce to 0 to match the
    * oracle's `count(*) FILTER` semantics. */
  def q49Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select($"user_id" +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy($"user_id")
  }

  val q49Sql: String =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click')    AS n_click,
      |  count(*) FILTER (WHERE event_type = 'error')    AS n_error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |  count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
      |  count(*) FILTER (WHERE event_type = 'view')     AS n_view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q50_stats_agg — standard-deviation / correlation per event type,
    * formulated for CROSS-ENGINE bit-exactness: the shuffled partial
    * aggregates are EXACT decimal sums (Σx, Σx², Σxy on the DECIMAL grid —
    * associative, order-independent), and the statistics are derived from
    * them in one final double expression. Native `stddev`/`corr` stream
    * doubles through engine-specific summation orders, so their last ulps
    * differ between engines (and between partitionings!) — unacceptable
    * where a re-run must reproduce byte-identical stats. Same one-shuffle
    * map-side-combine shape as any sum. */
  def q50StatsAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = $"value".cast(DecimalType(18, 2))
    val y = $"user_id".cast(DecimalType(18, 2))
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"),
        sum(y).as("sy"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      // exact decimal sums → double ONCE, then derive in pure double
      // arithmetic with the identical expression on the oracle side:
      // decimal-typed derived arithmetic would hit each engine's own
      // precision-cap rules, double-typed is IEEE-identical
      .select($"event_type", $"n".cast(DoubleType).as("nd"), $"n",
        $"sx".cast(DoubleType).as("sxd"), $"sxx".cast(DoubleType).as("sxxd"),
        $"sy".cast(DoubleType).as("syd"), $"syy".cast(DoubleType).as("syyd"),
        $"sxy".cast(DoubleType).as("sxyd"))
      // degenerate groups guard, stated IDENTICALLY on both sides: n=1
      // (stddev divides by 0), zero/cancellation-negative variance (corr
      // divides by 0; DuckDB would even ERROR on sqrt(<0) where Spark
      // yields NaN) — all emit NULL, the SQL convention for undefined stats
      .select($"event_type", $"n",
        $"sxd".as("sum_value"),
        // sample stddev from exact sums: sqrt((Sxx - Sx^2/n) / (n-1))
        when($"nd" > 1.0 && $"sxxd" - $"sxd" * $"sxd" / $"nd" >= 0.0,
          sqrt(($"sxxd" - $"sxd" * $"sxd" / $"nd") / ($"nd" - 1.0)))
          .as("stddev_value"),
        // Pearson r from exact sums
        when($"sxxd" - $"sxd" * $"sxd" / $"nd" > 0.0 &&
             $"syyd" - $"syd" * $"syd" / $"nd" > 0.0,
          ($"sxyd" - $"sxd" * $"syd" / $"nd") /
            (sqrt($"sxxd" - $"sxd" * $"sxd" / $"nd") *
             sqrt($"syyd" - $"syd" * $"syd" / $"nd")))
          .as("corr_value_user"))
      .orderBy($"event_type")
  }

  val q50Sql: String =
    """SELECT event_type, n,
      |  sxd AS sum_value,
      |  CASE WHEN nd > 1.0 AND sxxd - sxd * sxd / nd >= 0.0
      |       THEN sqrt((sxxd - sxd * sxd / nd) / (nd - 1.0)) END AS stddev_value,
      |  CASE WHEN sxxd - sxd * sxd / nd > 0.0 AND syyd - syd * syd / nd > 0.0
      |       THEN (sxyd - sxd * syd / nd) /
      |            (sqrt(sxxd - sxd * sxd / nd) * sqrt(syyd - syd * syd / nd)) END
      |    AS corr_value_user
      |FROM (
      |  SELECT event_type, count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxd,
      |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxxd,
      |    CAST(sum(CAST(user_id AS DECIMAL(18,2))) AS DOUBLE) AS syd,
      |    CAST(sum(CAST(user_id AS DECIMAL(18,2)) * CAST(user_id AS DECIMAL(18,2))) AS DOUBLE) AS syyd,
      |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(user_id AS DECIMAL(18,2))) AS DOUBLE) AS sxyd
      |  FROM events GROUP BY event_type)
      |ORDER BY event_type""".stripMargin

  /** q44_asof_join — AS-OF join, the time-series operator Spark has no
    * native form of: each purchase is matched to the same user's most
    * recent click at or before it (the "state of X as of time T" lookup
    * behind feature backfills and point-in-time-correct training data).
    *
    * NOT a range join: the naive `ON c.ms <= p.ms` + max() formulation
    * explodes to every (purchase × earlier-click) pair before pruning —
    * quadratic per key. This composition is ONE shuffle, linear state:
    * both sides are tagged and unioned, sorted per user by (ms, side), and
    * the last click carries forward via a running `last(_, ignoreNulls)`
    * window — purchases then just read the carried value. Clicks sort
    * before purchases at equal ms, so ties match (`<=` semantics, same as
    * DuckDB's native ASOF JOIN, which is the oracle). The click side is
    * first deduped to one row per (user, ms) — max event_id wins — so tie
    * resolution is deterministic in both engines. */
  def q44AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", unix_millis($"ts").as("ms"), $"event_id")
      .groupBy($"user_id", $"ms").agg(max($"event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_millis($"ts").as("ms"),
        $"event_id".as("purchase_id"), $"value")
    val tagged = clicks.select($"user_id", $"ms", lit(0).as("side"), $"click_id",
        lit(null).cast("long").as("purchase_id"), lit(null).cast("double").as("value"))
      .unionByName(purchases.select($"user_id", $"ms", lit(1).as("side"),
        lit(null).cast("long").as("click_id"), $"purchase_id", $"value"))
    val carry = Window.partitionBy($"user_id").orderBy($"ms", $"side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_click_id", last($"click_id", ignoreNulls = true).over(carry))
      .withColumn("asof_click_ms",
        last(when($"click_id".isNotNull, $"ms"), ignoreNulls = true).over(carry))
      .filter($"side" === 1)
      .select($"purchase_id", $"user_id", $"ms".as("purchase_ms"),
        $"asof_click_id".as("click_id"), $"asof_click_ms".as("click_ms"), $"value")
      .orderBy($"purchase_id")
  }

  val q44Sql: String =
    """WITH clicks AS (
      |  SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_ms(ts)),
      |purchases AS (
      |  SELECT user_id, epoch_ms(ts) AS ms, event_id AS purchase_id, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id, p.ms AS purchase_ms,
      |  c.click_id, c.ms AS click_ms, p.value
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND c.ms <= p.ms
      |ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------------------- q76

  /** q76_funnel — ordered conversion-funnel analysis: per user, the
    * earliest view, the earliest click AT OR AFTER that view, and the
    * earliest purchase AT OR AFTER that click — stage = how deep the user
    * got (0–3). The ORDER constraint is what distinguishes a funnel from
    * three independent mins: a purchase before the first qualifying click
    * does not count, which is the sequencing semantics of product
    * analytics (Amplitude/GA-style unordered-window funnels drop the
    * ≥ constraints; this is the strict ordered flavor).
    *
    * Scale shape: one stage = one user-keyed min-aggregation over a
    * type-filtered slice, chained through user-keyed joins — every
    * exchange in the chain is on the SAME key, so the stage-2/3 joins and
    * aggs reuse the stage-1 partitioning (no new shuffle of the events
    * table; the filters prune each slice at the scan). Stage count is a
    * small constant; per-user state is three timestamps, never an event
    * list. Timestamps ride the ms grid (the q44/q46 convention — the one
    * grid where both engines' timestamp precisions agree). */
  def q76Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
    val users = e.select($"user_id").distinct()
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ms").as("t_view_ms"))
    val c = e.filter($"event_type" === "click")
      .join(v, "user_id").filter($"ms" >= $"t_view_ms")
      .groupBy($"user_id").agg(min($"ms").as("t_click_ms"))
    val p = e.filter($"event_type" === "purchase")
      .join(c, "user_id").filter($"ms" >= $"t_click_ms")
      .groupBy($"user_id").agg(min($"ms").as("t_purchase_ms"))
    users
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select($"user_id",
        ($"t_view_ms".isNotNull.cast("long") + $"t_click_ms".isNotNull.cast("long")
          + $"t_purchase_ms".isNotNull.cast("long")).as("stage"),
        $"t_view_ms", $"t_click_ms", $"t_purchase_ms")
      .orderBy($"user_id")
  }

  val q76Sql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |u AS (SELECT DISTINCT user_id FROM e),
      |v AS (SELECT user_id, min(ms) AS t_view_ms FROM e
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ms) AS t_click_ms
      |      FROM e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ms >= v.t_view_ms GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ms) AS t_purchase_ms
      |      FROM e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ms >= c.t_click_ms GROUP BY 1)
      |SELECT u.user_id,
      |  CAST((CASE WHEN v.t_view_ms IS NULL THEN 0 ELSE 1 END)
      |     + (CASE WHEN c.t_click_ms IS NULL THEN 0 ELSE 1 END)
      |     + (CASE WHEN p.t_purchase_ms IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS stage,
      |  v.t_view_ms, c.t_click_ms, p.t_purchase_ms
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |  LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q82

  /** q82_event_paths — behavioral path mining: the most common 3-step
    * event sequences across users (every consecutive type triple in each
    * user's time-ordered stream), top 10 by frequency — the "what do
    * users actually do" query behind funnel design (q76 checks ONE
    * hypothesized path; this discovers which paths are worth
    * hypothesizing).
    *
    * Scale shape: one shuffle of events on user_id for the per-user
    * ordered window (lead×2 — state is two rows, not the user's history),
    * then a path-keyed count aggregation whose cardinality is bounded by
    * |event types|³, and a global top-10 of that tiny aggregate. Ordering
    * within a user is (ms, event_id) — event_id breaks same-ms ties, so
    * both engines enumerate identical sequences. */
  def q82EventPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type", unix_millis($"ts").as("ms"))
      .select($"user_id", $"event_type",
        lead($"event_type", 1).over(w).as("t2"),
        lead($"event_type", 2).over(w).as("t3"))
      .filter($"t2".isNotNull && $"t3".isNotNull)
      .select(concat_ws(">", $"event_type", $"t2", $"t3").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path")
      .limit(10)
  }

  val q82Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS t2,
      |    lead(event_type, 2) OVER w AS t3
      |  FROM (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
      |SELECT event_type || '>' || t2 || '>' || t3 AS path, count(*) AS n
      |FROM e WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY 1
      |ORDER BY n DESC, path
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q83

  /** q83_cohort_retention — weekly cohort retention: users are cohorted by
    * the week of their FIRST signup event, and each later week of activity
    * (any event type) increments that cohort's (weeks-since-signup) cell —
    * the classic retention triangle every growth dashboard draws. Weeks
    * are integer epoch-ms weeks (`ms div 604800000`): a pure integer grid
    * both engines share, with none of date_trunc's timezone/week-start
    * ambiguity. Negative offsets (activity before the signup landed) are
    * excluded; the horizon is capped at 8 weeks, so the output is at most
    * |cohorts|×9 cells.
    *
    * Scale shape: the cohort table is one user-keyed min-aggregation; the
    * join back to events is the same user_id key (shared partitioning);
    * the retention cells are a (cohort, offset)-keyed count-distinct whose
    * group count is bounded by the calendar, not the data. */
  def q83CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val WeekMs = 604800000L
    def wk(c: Column): Column = call_function("div", c, lit(WeekMs))
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_type", wk(unix_millis($"ts")).as("w"))
    val cohorts = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"w").as("cohort_week"))
    ev.join(cohorts, "user_id")
      .select($"user_id", $"cohort_week", ($"w" - $"cohort_week").as("weeks_since"))
      .filter($"weeks_since".between(0, 8))
      .groupBy($"cohort_week", $"weeks_since")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"weeks_since")
  }

  val q83Sql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) // 604800000 AS w
      |           FROM events),
      |c AS (SELECT user_id, min(w) AS cohort_week FROM e
      |      WHERE event_type = 'signup' GROUP BY 1)
      |SELECT cohort_week, e.w - cohort_week AS weeks_since,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM e JOIN c USING (user_id)
      |WHERE e.w - cohort_week BETWEEN 0 AND 8
      |GROUP BY 1, 2
      |ORDER BY cohort_week, weeks_since""".stripMargin

  // ---------------------------------------------------------------- q93

  /** q93_outliers — robust per-group anomaly detection by the Hampel /
    * MAD rule: an event is an outlier when |value − median| > 3·MAD
    * (MAD = median absolute deviation), computed per event_type. Median +
    * MAD is the robust replacement for mean + stddev telemetry (q50):
    * breakdown point 50%, so the outliers being hunted cannot drag the
    * threshold the way they drag a stddev.
    *
    * Engine determinism: values snap to the e6 integer grid at the scan,
    * and both medians ride the ×2 trick — `2·percentile(ints, 0.5)` is
    * `a+b` (even n) or `2a` (odd n), EXACT in int64, so `med2 = 2·median`
    * and `mad4 = 4·MAD` are integers and the flag `2·dev2 > 3·mad4`
    * (⟺ dev > 3·MAD) is pure integer comparison — no float can disagree.
    *
    * Scale shape: two grouped exact-percentile passes (per-type state =
    * the value buffer, the q39 trade) + one broadcast-joined flag scan;
    * group count is tiny. At 100 TB swap `percentile` for
    * `approx_percentile` and certify with q45's rank-window contract —
    * same plan, sketch-sized state. */
  def q93Outliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_id", $"event_type",
        floor($"value" * 1000000.0 + lit(0.5)).cast("long").as("v_e6"))
    val med = ev.groupBy($"event_type")
      .agg((expr("percentile(v_e6, 0.5)") * 2.0).cast("long").as("med2_e6"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev2_e6", abs($"v_e6" * 2L - $"med2_e6"))
    val mad = dev.groupBy($"event_type")
      .agg((expr("percentile(dev2_e6, 0.5)") * 2.0).cast("long").as("mad4_e6"))
    dev.join(broadcast(mad), "event_type")
      .filter($"dev2_e6" * 2L > $"mad4_e6" * 3L)
      .select($"event_id", $"event_type", $"v_e6", $"dev2_e6", $"med2_e6", $"mad4_e6")
      .orderBy($"event_id")
  }

  val q93Sql: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6 FROM events),
      |med AS (
      |  SELECT event_type, CAST(2.0 * quantile_cont(v_e6, 0.5) AS BIGINT) AS med2_e6
      |  FROM e GROUP BY 1),
      |dev AS (
      |  SELECT e.event_id, e.event_type, e.v_e6, med.med2_e6,
      |    abs(2*e.v_e6 - med.med2_e6) AS dev2_e6
      |  FROM e JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type, CAST(2.0 * quantile_cont(dev2_e6, 0.5) AS BIGINT) AS mad4_e6
      |  FROM dev GROUP BY 1)
      |SELECT d.event_id, d.event_type, d.v_e6, d.dev2_e6, d.med2_e6, mad.mad4_e6
      |FROM dev d JOIN mad USING (event_type)
      |WHERE 2*d.dev2_e6 > 3*mad.mad4_e6
      |ORDER BY d.event_id""".stripMargin

  // ---------------------------------------------------------------- q94

  /** q94_ewma_trend — exponentially-weighted daily volume trend per
    * event_type, the smoothing pass behind rate/anomaly dashboards. With
    * α = 1/2 the truncated-at-8-lags EWMA is a DYADIC sum — this query
    * exports `ewma_s = Σ_{j=0..7} n_{t−j}·2^(7−j)` (= 2⁸·EWMA with the
    * j-th weight 2^-(j+1)), which is EXACT integer arithmetic: no float
    * enters at all, the strongest form of the engine-determinism
    * convention. Lags are row-based over each type's ordered day series
    * (missing days treated as adjacent — the standard telemetry
    * simplification; a calendar-dense variant is a `sequence()` date
    * spine away).
    *
    * Scale shape: one groupBy(type, day) agg collapses the event volume
    * map-side (the exchange carries |types|·|days| rows), then ONE window
    * partitioned by type computes all 8 lags — one shuffle, tiny state. */
  def q94EwmaTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val K = 8
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    val ewmaS = (0 until K).map { j =>
      val wt = lit(1L << (K - 1 - j))
      if (j == 0) $"n" * wt else coalesce(lag($"n", j).over(w), lit(0L)) * wt
    }.reduce(_ + _)
    // day exported as its ISO string — DATE is unproven in the driver's
    // hash compare (the q11 convention keeps date exports scalar)
    daily
      .select($"event_type", $"day".cast("string").as("day"), $"n", ewmaS.as("ewma_s"))
      .orderBy($"event_type", $"day")
  }

  val q94Sql: String = {
    val k = 8
    val terms = (0 until k).map { j =>
      if (j == 0) s"n * ${1L << (k - 1)}"
      else s"lag(n, $j, 0) OVER w * ${1L << (k - 1 - j)}"
    }.mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, CAST(day AS VARCHAR) AS day, n, $terms AS ewma_s
       |FROM daily
       |WINDOW w AS (PARTITION BY event_type ORDER BY day)
       |ORDER BY event_type, day""".stripMargin
  }

  // ---------------------------------------------------------------- q97

  /** q97_range_bin_join — range join WITHOUT an equi key, made scale-safe
    * by BINNING: "incident windows" (hours with ≥2 errors, spanning
    * [first-error, +90 min) — deliberately NOT bin-aligned) are joined to
    * every event whose timestamp falls inside them. q44/q46's interval
    * joins ride a user_id equi key; with no key at all the naive plan is a
    * cartesian range join — the classic scale cliff. The standard fix,
    * implemented here: explode each window into the hour bins it covers,
    * join events to window-bins on the BIN (pure equi join), then apply
    * the exact range predicate as a residual filter. An event lives in
    * exactly one bin and a window lists each covered bin once, so pairs
    * appear once — no dedup pass.
    *
    * Scale shape: the window-bin table is O(windows · bins-per-window) and
    * BROADCASTS — the event scan never shuffles at all; the only exchange
    * is the per-window aggregation (O(windows) rows). At 100 TB with a
    * window table too big to broadcast, the same plan becomes an equi
    * SHUFFLE join on the bin — still never a cartesian. */
  def q97RangeBinJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Bin = 3600000L // 1 h bins; windows are 90 min so cover 2-3 bins
    def idiv(a: Column, b: Long): Column = call_function("div", a, lit(b))
    val ev = Tables.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", unix_millis($"ts").as("ms"))
    val windows = ev.filter($"event_type" === "error")
      .groupBy(idiv($"ms", Bin).as("window_id"))
      .agg(count(lit(1)).as("n_err"), min($"ms").as("start_ms"))
      .filter($"n_err" >= 2)
      .select($"window_id", $"start_ms", ($"start_ms" + 5400000L).as("end_ms"))
    val windowBins = windows
      .select($"window_id", $"start_ms", $"end_ms",
        explode(sequence(idiv($"start_ms", Bin), idiv($"end_ms" - 1, Bin))).as("bin"))
    ev.withColumn("bin", idiv($"ms", Bin))
      .join(broadcast(windowBins), "bin")
      .filter($"ms" >= $"start_ms" && $"ms" < $"end_ms")
      .groupBy($"window_id", $"start_ms", $"end_ms")
      .agg(count(lit(1)).as("n_events"), countDistinct($"user_id").as("n_users"))
      .orderBy($"window_id")
  }

  /** q97 oracle: the PLAIN range join (DuckDB's IEJoin handles it at
    * oracle scale) — stating the semantics the binned plan must equal. */
  val q97Sql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |w AS (
      |  SELECT ms // 3600000 AS window_id, min(ms) AS start_ms,
      |    min(ms) + 5400000 AS end_ms
      |  FROM ev WHERE event_type = 'error'
      |  GROUP BY 1 HAVING count(*) >= 2)
      |SELECT w.window_id, w.start_ms, w.end_ms,
      |  count(*) AS n_events, count(DISTINCT e.user_id) AS n_users
      |FROM w JOIN ev e ON e.ms >= w.start_ms AND e.ms < w.end_ms
      |GROUP BY 1, 2, 3
      |ORDER BY window_id""".stripMargin

  // ---------------------------------------------------------------- q98

  /** q98_equidepth_hist — equi-depth (equal-mass) histogram of
    * `events.value`: 8 buckets split at the exact octiles, the ANALYZE
    * artifact selectivity estimators want (q71's fixed-WIDTH histogram
    * shows shape; equi-DEPTH bounds per-bucket error).
    *
    * Why octiles and a ×8 export, not deciles: exact-percentile
    * interpolation lands on `a + (b−a)·f` where f is the fractional rank.
    * For p = k/8, both p and every reachable f are DYADIC, so with
    * integer-grid inputs each interpolation term is float-EXACT and any
    * algebraically-equivalent formula in any engine computes the identical
    * double; ×8 then lifts boundaries to exact int64 (`oct8 = 8·value_e6`
    * units). Deciles (p = k/10) are not representable in binary and the
    * two engines' interpolation orders could drift a ulp — the q93
    * ×2-median trick generalized to its safe limit. Bucket membership is
    * then pure integer comparison (8·v ≥ boundary).
    *
    * Scale shape: one percentile agg (per-group value buffer — the q39
    * trade; approx_percentile is the sketch-sized drop-in), boundaries
    * broadcast as a 1-row cross join, one 8-group count agg. */
  def q98EquidepthHist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(floor($"value" * 1000000.0 + lit(0.5)).cast("long").as("v_e6"))
    val ps = (1 to 7).map(_ / 8.0)
    val bnd = ev.agg(
      expr(s"percentile(v_e6, array(${ps.mkString(", ")}))").as("qs"))
      .select(transform($"qs", q => (q * 8.0).cast("long")).as("oct8"))
    val bucket = (1 to 7).map(i =>
      when($"v_e6" * 8L >= element_at($"oct8", i), 1L).otherwise(0L)).reduce(_ + _)
    ev.crossJoin(broadcast(bnd))
      .select(bucket.as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(bnd))
      .select($"bucket", $"n_rows",
        when($"bucket" === 0L, lit(null).cast("long"))
          .otherwise(element_at($"oct8", $"bucket".cast("int"))).as("lo8"),
        when($"bucket" === 7L, lit(null).cast("long"))
          .otherwise(element_at($"oct8", $"bucket".cast("int") + 1)).as("hi8"))
      .orderBy($"bucket")
  }

  val q98Sql: String =
    """WITH e AS (
      |  SELECT CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v FROM events),
      |b AS (
      |  SELECT [CAST(x * 8.0 AS BIGINT) for x in
      |          quantile_cont(v, [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875])] AS oct8
      |  FROM e),
      |m AS (
      |  SELECT len(list_filter(b.oct8, o -> 8*e.v >= o)) AS bucket FROM e, b)
      |SELECT bucket, count(*) AS n_rows,
      |  CASE WHEN bucket = 0 THEN NULL ELSE b.oct8[CAST(bucket AS INTEGER)] END AS lo8,
      |  CASE WHEN bucket = 7 THEN NULL ELSE b.oct8[CAST(bucket AS INTEGER) + 1] END AS hi8
      |FROM m, b
      |GROUP BY bucket, b.oct8
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q101

  /** q101_salted_join — skew-SALTED replicated shuffle join: the classic
    * hot-key treatment for the case AQE's skew-join split cannot reach.
    * AQE splits an oversized SHUFFLE PARTITION of the stream side of a
    * sort-merge/hash join, but when one KEY dominates (a bot user, a
    * null-ish default id, an `unknown` domain), every plan that keys the
    * exchange on `user_id` alone sends that key's entire row set through
    * one task. The fix is algebraic, not adaptive: the fact side gets a
    * uniform salt in [0, R) derived from a per-ROW attribute
    * (`xxhash64(event_id)` — NOT the join key, which is constant within
    * the hot key), the dim side replicates each row R times (one per
    * salt), and the join runs on `(key, salt)` — the hot key now spreads
    * across R tasks, at the bounded cost of an R× dim blow-up
    * (|dim|·R rows, still exchange-sized, never |fact|-sized).
    *
    * The salt is INTERNAL: it exists between the two projections and the
    * join, and the aggregation after the join erases it — so the oracle
    * states the semantics as the PLAIN join + GROUP BY (the q97/q59
    * pattern: the scale technique must be invisible in the result).
    *
    * `hint("shuffle_hash")` pins the shuffled-join shape the technique
    * exists for: at sf0.01 the replicated dim is broadcast-sized and
    * Catalyst would (correctly) broadcast it, collapsing the salted
    * exchange this query certifies — at 100 TB the dim that needs salting
    * is precisely the one too big to broadcast. Grid.sum2 keeps the value
    * sum exact-integer across partial-agg orders (1000-executor ≡ oracle).
    * SkewSpec proves the spread: a hot key owning half the fact table
    * lands in all R salt groups. */
  def q101SaltedJoin(s: SparkSession, dir: String): DataFrame =
    q101SaltedJoinWith(s, dir, salts = 8)

  /** q101 with the replication factor R exposed (R=1 degenerates to the
    * plain shuffle join; SkewSpec checks R-invariance of the result). */
  def q101SaltedJoinWith(s: SparkSession, dir: String, salts: Int): DataFrame =
    q101SaltedJoinOn(Tables.events(s, dir), Tables.customer(s, dir), salts)

  /** The salted join over caller-supplied fact/dim relations — the seam
    * tools.SkewBench uses to measure plain-vs-salted wall on a corpus with
    * the hot key scaled (fact needs `event_id/user_id/event_type/value`,
    * dim `c_custkey/c_mktsegment`). */
  private[graft] def q101SaltedJoinOn(factTable: DataFrame, dimTable: DataFrame,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val fact = factTable
      .select(col("user_id"), col("event_type"), col("value"),
        pmod(xxhash64(col("event_id")), lit(salts.toLong)).as("salt"))
    val dim = dimTable
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    fact.join(dim.hint("shuffle_hash"),
        fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.functions.Grid.sum2(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** q101 oracle: the plain join — salting is a physical rewrite and must
    * not be observable. */
  val q101Sql: String =
    """SELECT c_mktsegment, event_type, count(*) AS n,
      |  (CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2
      |ORDER BY c_mktsegment, event_type""".stripMargin

  // ---------------------------------------------------------------- q113

  /** q113_grouped_topk — grouped top-K via the engine's bounded-state
    * aggregate ([[graft.functions.expressions.TopK]], `graft_topk`): the
    * top 10 events per type by (grid value DESC, event_id ASC), exploded
    * with ranks. SEMANTICALLY the q106/q8 window shape — and the oracle
    * states it as exactly that `row_number()` SQL — but executed as a
    * TypedImperativeAggregate with partial merge: the map side reduces
    * every partition to ≤ K pairs per group BEFORE the exchange, so only
    * K-sized states cross the wire and no global per-group sort ever
    * runs. This SHIPS the "two-phase top-K" dial q106's scaladoc names:
    * same contract, O(groups·K) exchanged instead of O(rows) shuffled and
    * sorted.
    *
    * Determinism: scores are e6-grid ints, ties break by id ASC inside
    * the aggregate, so the result is a function of the input SET —
    * TopKSpec pins partition-layout invariance and the window≡aggregate
    * equivalence; the oracle gate hash-pins it cross-engine. */
  def q113GroupedTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type",
        graft.functions.Grid.units2($"value").cast("long").as("v2"), $"event_id")
      .groupBy($"event_type")
      .agg(call_function("graft_topk", $"v2", $"event_id", lit(10)).as("top"))
      .select($"event_type", posexplode($"top"))
      .select($"event_type", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("event_id"), $"col.score".as("v2"))
      .orderBy($"event_type", $"rank")
  }

  val q113Sql: String =
    """SELECT event_type, rank, event_id, v2 FROM (
      |  SELECT event_type, event_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT) DESC, event_id) AS BIGINT) AS rank
      |  FROM events) t
      |WHERE rank <= 10
      |ORDER BY event_type, rank""".stripMargin

  // ---------------------------------------------------------------- q133

  /** q133_rate_anomaly — event-rate spike detection against a trailing
    * baseline: hourly counts per event type, each hour z-scored against
    * its own TRAILING 24-hour window (current hour excluded), flagged at
    * z ≥ 3. This is the operational health signal for the CDC/streaming
    * core (O1–O14): a publisher outage, a replay storm, or an upstream
    * backfill all announce themselves as rate anomalies long before any
    * correctness gate trips — the monitoring query a pipeline operator
    * alerts on.
    *
    * Engine-exact formulation: with c = baseline hours, s1 = Σn,
    * s2 = Σn², the population z rearranges to
    * `(c·n − s1) / sqrt(c·s2 − s1²)` — numerator and radicand are EXACT
    * int64, so the only float is one sqrt + divide with identical formula
    * text both engines, floored onto the e6 grid (q88's convention). The
    * flag compares the e6 integer. The radicand is FLOORED at c² (= a
    * variance floor of one event², integer-exact): a perfectly steady
    * baseline would otherwise zero the denominator and turn the most
    * blatant spike into NULL — with the floor, a 10× jump over a constant
    * baseline z-scores as the jump itself (RateAnomalySpec plants one)
    * while ±1-event jitter scores z ≈ 1. Hours with under 12 baseline
    * hours export NULL z (flag 0) — the cold-start rule stated in the
    * oracle, not hidden in the engine.
    *
    * Scale shape: ONE (type, hour) partial-agg shuffle collapses the
    * corpus map-side (the q94 class — |types|·|hours| rows after); the
    * RANGE window runs per type over its own hour series. At 100 TB the
    * pre-aggregation IS the design: the window sees thousands of rows no
    * matter how many billions of events fed them. */
  def q133RateAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hours = Tables.events(s, dir)
      .select($"event_type", expr("unix_millis(ts) div 3600000").as("hr"))
      .groupBy($"event_type", $"hr").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"hr").rangeBetween(-24, -1)
    hours
      .withColumn("c", count($"n").over(w))
      .withColumn("s1", sum($"n").over(w))
      .withColumn("s2", sum($"n" * $"n").over(w))
      .withColumn("z_e6",
        when($"c" >= 12,
          floor(lit(1000000.0) * ($"c" * $"n" - $"s1") /
            sqrt(greatest($"c" * $"s2" - $"s1" * $"s1", $"c" * $"c")
              .cast("double"))).cast("long"))
          .otherwise(lit(null).cast("long")))
      .select($"event_type", $"hr", $"n",
        $"z_e6",
        when($"z_e6" >= 3000000L, lit(1L)).otherwise(lit(0L)).as("anomaly"))
      .orderBy($"event_type", $"hr")
  }

  /** q133 oracle: identical hour grid, identical integer rearrangement,
    * identical cold-start rule. */
  val q133Sql: String =
    """WITH h AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, hr, n,
      |    count(n) OVER tw AS c, sum(n) OVER tw AS s1,
      |    sum(n * n) OVER tw AS s2
      |  FROM h
      |  WINDOW tw AS (PARTITION BY event_type ORDER BY hr
      |                RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT event_type, hr, n,
      |    CASE WHEN c >= 12
      |         THEN CAST(floor(1000000.0 * (c * n - s1)
      |                / sqrt(CAST(greatest(c * s2 - s1 * s1, c * c) AS DOUBLE))) AS BIGINT)
      |         ELSE NULL END AS z_e6
      |  FROM w)
      |SELECT event_type, hr, CAST(n AS BIGINT) AS n, z_e6,
      |  CAST(CASE WHEN z_e6 >= 3000000 THEN 1 ELSE 0 END AS BIGINT) AS anomaly
      |FROM z ORDER BY event_type, hr""".stripMargin

  // ---------------------------------------------------------------- q154

  /** q154_clamped_balance — overdraft-free running balance: per user,
    * purchases credit value and errors debit it, clamped below at zero
    * (the Lindley recursion `b_t = max(0, b_{t-1} + δ_t)` — token
    * buckets, rate limiters, inventory floors, credit ledgers all share
    * this shape). A NONLINEAR per-row recurrence looks like it forces
    * per-group iteration (mapGroups, the thing that abandons codegen and
    * vectorization) — but the reflected walk has a closed form,
    * `b_n = P_n − min(0, min_{j≤n} P_j)` over the plain prefix sums, so
    * the plan is ONE user-keyed window + the same-key aggregate: fully
    * declarative, whole-stage-codegen, one exchange.
    *
    * The oracle is genuinely independent here: it executes the LITERAL
    * recurrence (DuckDB `list_reduce` folding `greatest(acc + δ, 0)` over
    * the ordered deltas) — the closed form must reproduce the iterated
    * fold exactly, on every user, at every SF. All arithmetic exact e2
    * int64. */
  def q154ClampedBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.events(s, dir)
      .filter($"event_type".isin("purchase", "error"))
      .select($"user_id", unix_millis($"ts").as("ms"), $"event_id",
        when($"event_type" === "purchase",
          floor($"value" * 100 + 0.5).cast("long"))
          .otherwise(-floor($"value" * 100 + 0.5).cast("long")).as("delta"))
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("p", sum($"delta").over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"delta").as("sum_delta_e2"),
        min($"p").as("minp"))
      .select($"user_id", $"n", $"sum_delta_e2",
        ($"sum_delta_e2" - least(lit(0L), $"minp")).as("balance_e2"))
      .orderBy($"user_id")
  }

  /** q154 oracle: the literal clamp recurrence, iterated. */
  val q154Sql: String =
    """WITH d AS (
      |  SELECT user_id, epoch_ms(ts) AS ms, event_id,
      |    CASE WHEN event_type = 'purchase'
      |         THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
      |         ELSE -CAST(floor(value * 100 + 0.5) AS BIGINT) END AS delta
      |  FROM events WHERE event_type IN ('purchase', 'error'))
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(delta) AS BIGINT) AS sum_delta_e2,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list(delta ORDER BY ms, event_id)),
      |       (acc, d) -> greatest(acc + d, 0)) AS BIGINT) AS balance_e2
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q153

  /** q153_attribution — last-touch marketing attribution: each purchase's
    * revenue credits the user's most recent click's CHANNEL (campaign id
    * = props.k mod 4) within a 7-day lookback, else 'direct'. The revenue
    * side of the funnel family (q149 measures latency, this answers
    * "which channel earned the money" — the report every growth team
    * reconciles spend against), and the JSON props column finally
    * feeding an attribution dimension (q14 parses it; this joins on it).
    *
    * Spark-first shape is q44/q138's single-shuffle carry-forward:
    * clicks (deduped to one row per (user, ms) with the MIN channel — the
    * stated tie rule, so engines can't disagree on simultaneous clicks)
    * and purchases union into one user-keyed stream; clicks sort before
    * purchases at equal ms (inclusive attribution); a last-non-null
    * window carries (click ms, channel) onto every purchase. ONE
    * exchange, no row multiplication; the lookback is a row-local age
    * check after the carry. The oracle states the declarative form with
    * DuckDB's ASOF JOIN — nearest click at-or-before, which is exactly
    * what the carry computes.
    *
    * Scale shape: one user-keyed shuffle + one |channels|-row aggregate;
    * revenue sums exact on the e2 grid. */
  def q153Attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_type", unix_millis($"ts").as("ms"),
        $"value", $"props")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ms",
        concat(lit("ch"),
          get_json_object($"props", "$.k").cast("long") % 4).as("channel"))
      .groupBy($"user_id", $"ms").agg(min($"channel").as("channel"))
      .select($"user_id", $"ms", lit(0).as("kind"), $"channel",
        lit(null).cast("long").as("v2"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ms", lit(1).as("kind"),
        lit(null).cast("string").as("channel"),
        floor($"value" * 100 + 0.5).cast("long").as("v2"))
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("c_ms", last(when($"kind" === 0, $"ms"), ignoreNulls = true).over(w))
      .withColumn("c_ch", last($"channel", ignoreNulls = true).over(w))
      .filter($"kind" === 1)
      .select(
        when($"c_ms".isNotNull && $"c_ms" >= $"ms" - 604800000L, $"c_ch")
          .otherwise(lit("direct")).as("channel"),
        $"v2")
      .groupBy($"channel")
      .agg(count(lit(1)).as("n"), sum($"v2").as("rev2"))
      .select($"channel", $"n", $"rev2",
        ($"rev2".cast("double") / 100.0).as("revenue"))
      .orderBy($"channel")
  }

  /** q153 oracle: the declarative nearest-click-at-or-before form via
    * ASOF JOIN, same min-channel tie rule, same 7-day fence. */
  val q153Sql: String =
    """WITH c AS (
      |  SELECT user_id, epoch_ms(ts) AS cms,
      |    min('ch' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
      |        AS VARCHAR)) AS channel
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (
      |  SELECT user_id, epoch_ms(ts) AS pms,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v2
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.pms, p.v2, c.cms, c.channel
      |  FROM p ASOF LEFT JOIN c
      |    ON p.user_id = c.user_id AND c.cms <= p.pms)
      |SELECT CASE WHEN cms IS NOT NULL AND cms >= pms - 604800000
      |            THEN channel ELSE 'direct' END AS channel,
      |  CAST(count(*) AS BIGINT) AS n, CAST(sum(v2) AS BIGINT) AS rev2,
      |  (CAST(sum(v2) AS DOUBLE) / 100.0) AS revenue
      |FROM j GROUP BY 1 ORDER BY channel""".stripMargin

  // ---------------------------------------------------------------- q149

  /** q149_time_to_convert — conversion-latency distribution: for each
    * converting user, the time from their FIRST view to their first
    * at-or-after purchase, summarized as exact p50/p90/p99 per weekday of
    * that first view. The duration-distribution readout that completes
    * the funnel family (q76/q85 count who converts, q82 mines paths —
    * this measures HOW LONG conversion takes, the number an on-call
    * growth team actually watches).
    *
    * Engine-exact: durations are integer milliseconds (exact doubles),
    * and linear percentile interpolation `(1−θ)a + θb` is the same
    * two-operand IEEE tree in Spark's `percentile` and DuckDB's
    * `quantile_cont` (the q39-established pairing), rounded at 6. The
    * weekday is pure integer arithmetic on the epoch-day grid
    * (`(days + 4) % 7`, Thursday anchor — identical text both sides).
    *
    * Scale shape: two user-keyed min-aggregations sharing one
    * partitioning (the q76 rule) + one join on the same key; the
    * percentile state is per-weekday over |converting users| durations —
    * pre-aggregated, never raw events (at extreme cardinality the q45 GK
    * sketch is the documented escape hatch). */
  def q149TimeToConvert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_type", unix_millis($"ts").as("ms"))
    val firstView = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ms").as("v_ms"))
    val firstConv = e.filter($"event_type" === "purchase")
      .join(firstView, "user_id")
      .filter($"ms" >= $"v_ms")
      .groupBy($"user_id", $"v_ms").agg(min($"ms").as("p_ms"))
    firstConv
      .select(expr("(v_ms div 86400000 + 4) % 7").as("dow"),
        ($"p_ms" - $"v_ms").cast("double").as("dur_ms"))
      .groupBy($"dow")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(dur_ms, 0.5)"), 6).as("p50_ms"),
        round(expr("percentile(dur_ms, 0.9)"), 6).as("p90_ms"),
        round(expr("percentile(dur_ms, 0.99)"), 6).as("p99_ms"))
      .orderBy($"dow")
  }

  /** q149 oracle: identical funnel fold, weekday arithmetic, and
    * quantile_cont pairing. */
  val q149Sql: String =
    """WITH fv AS (
      |  SELECT user_id, min(epoch_ms(ts)) AS v_ms
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |fc AS (
      |  SELECT e.user_id, fv.v_ms, min(epoch_ms(e.ts)) AS p_ms
      |  FROM events e JOIN fv ON e.user_id = fv.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= fv.v_ms
      |  GROUP BY 1, 2)
      |SELECT (v_ms // 86400000 + 4) % 7 AS dow, CAST(count(*) AS BIGINT) AS n,
      |  round(quantile_cont(CAST(p_ms - v_ms AS DOUBLE), 0.5), 6) AS p50_ms,
      |  round(quantile_cont(CAST(p_ms - v_ms AS DOUBLE), 0.9), 6) AS p90_ms,
      |  round(quantile_cont(CAST(p_ms - v_ms AS DOUBLE), 0.99), 6) AS p99_ms
      |FROM fc GROUP BY 1 ORDER BY dow""".stripMargin

  // ---------------------------------------------------------------- q148

  /** q148_cuped — variance-reduced A/B experiment readout (CUPED, Deng
    * et al. WSDM'13): per-variant post-period means adjusted by the
    * pooled pre-period covariate, `adj = ȳ_v − θ·(x̄_v − x̄)` with
    * `θ = cov(x, y)/var(x)`. The experimentation-analytics capability on
    * top of the q43/q129 deterministic-assignment discipline — variant =
    * md5(user) mod 2, so assignment is reproducible from data alone; the
    * covariate is each user's PRE-period activity (first 15 days), the
    * metric their POST-period value sum (last 15) — users carry their own
    * baseline out of the naive variant means.
    *
    * Engine-exact: the per-user fold and all five regression sums are
    * exact int64 (counts + e2-grid value units); θ and the adjustment are
    * then a FIXED tree of SQL-level float ops on int64-exact inputs —
    * each SQL operator is one IEEE-rounded double op in both engines
    * (neither fuses across operators), so the doubles agree bitwise and
    * the single trailing e6 floor is safe. Zero pre-period variance
    * exports NULL (stated in the oracle).
    *
    * Scale shape: ONE user-keyed partial-agg pass folds the corpus to a
    * per-user row; everything after is |users|-row sums reused for the
    * 1-row pooled aggregate (broadcast) and the 2-row variant aggregate
    * — the q133/q146 pre-aggregation class. */
  def q148Cuped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val split = 1705363200000L // 2024-01-16 00:00 UTC: day 16 of the span
    val perUser = Tables.events(s, dir)
      .select($"user_id", unix_millis($"ts").as("ms"),
        floor($"value" * 100 + 0.5).cast("long").as("v2"))
      .groupBy($"user_id")
      .agg(sum(when($"ms" < split, 1L).otherwise(0L)).as("x"),
        sum(when($"ms" >= split, $"v2").otherwise(0L)).as("y"))
      .withColumn("variant",
        when(conv(substring(md5($"user_id".cast("string").cast("binary")), 1, 15),
          16, 10).cast("long") % 2 === 0, lit("A")).otherwise(lit("B")))
    val pooled = perUser.agg(count(lit(1)).as("c"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
    perUser.groupBy($"variant")
      .agg(count(lit(1)).as("n"), sum($"x").as("vx"), sum($"y").as("vy"))
      .crossJoin(broadcast(pooled))
      .select($"variant", $"n",
        floor(lit(1000000.0) * $"vy" / $"n".cast("double")).cast("long")
          .as("raw_mean_e6"),
        when($"c" * $"sxx" - $"sx" * $"sx" > 0,
          floor(lit(1000000.0) *
            (($"c" * $"sxy" - $"sx" * $"sy").cast("double") /
              ($"c" * $"sxx" - $"sx" * $"sx").cast("double"))).cast("long"))
          .otherwise(lit(null).cast("long")).as("theta_e6"),
        when($"c" * $"sxx" - $"sx" * $"sx" > 0,
          floor(lit(1000000.0) *
            ($"vy".cast("double") / $"n".cast("double") -
              (($"c" * $"sxy" - $"sx" * $"sy").cast("double") /
                ($"c" * $"sxx" - $"sx" * $"sx").cast("double")) *
                ($"vx".cast("double") / $"n".cast("double") -
                  $"sx".cast("double") / $"c".cast("double")))).cast("long"))
          .otherwise(lit(null).cast("long")).as("adj_mean_e6"))
      .orderBy($"variant")
  }

  /** q148 oracle: identical per-user fold, md5 assignment, and float
    * operator tree (each SQL op = one IEEE op in both engines). */
  val q148Sql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN epoch_ms(ts) < 1705363200000 THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN epoch_ms(ts) >= 1705363200000
      |             THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |v AS (
      |  SELECT *, CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
      |            THEN 'A' ELSE 'B' END AS variant
      |  FROM u),
      |p AS (
      |  SELECT CAST(count(*) AS BIGINT) AS c, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM v),
      |g AS (
      |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS vx, CAST(sum(y) AS BIGINT) AS vy
      |  FROM v GROUP BY 1)
      |SELECT variant, n,
      |  CAST(floor(1000000.0 * vy / CAST(n AS DOUBLE)) AS BIGINT) AS raw_mean_e6,
      |  CASE WHEN c * sxx - sx * sx > 0 THEN
      |    CAST(floor(1000000.0 *
      |      (CAST(c * sxy - sx * sy AS DOUBLE) / CAST(c * sxx - sx * sx AS DOUBLE))) AS BIGINT)
      |  ELSE NULL END AS theta_e6,
      |  CASE WHEN c * sxx - sx * sx > 0 THEN
      |    CAST(floor(1000000.0 *
      |      (CAST(vy AS DOUBLE) / CAST(n AS DOUBLE) -
      |        (CAST(c * sxy - sx * sy AS DOUBLE) / CAST(c * sxx - sx * sx AS DOUBLE)) *
      |        (CAST(vx AS DOUBLE) / CAST(n AS DOUBLE) -
      |          CAST(sx AS DOUBLE) / CAST(c AS DOUBLE)))) AS BIGINT)
      |  ELSE NULL END AS adj_mean_e6
      |FROM g, p ORDER BY variant""".stripMargin

  // ---------------------------------------------------------------- q146

  /** q146_group_trend — per-group ordinary-least-squares trend: for each
    * event type, the OLS slope/intercept of its hourly event count over
    * the hour index. The grouped-regression capability (is traffic for
    * this type growing, and how fast?) that turns q133's point anomalies
    * and q140's dense series into a direction — the statistical-modeling
    * primitive warehouses express as REGR_SLOPE/REGR_INTERCEPT.
    *
    * Engine-exact closed form: with c, Σx, Σy, Σxy, Σx² as exact int64
    * sums over the per-type series (x = hour − the type's first hour, so
    * magnitudes stay small), slope = (c·Σxy − Σx·Σy)/(c·Σx² − (Σx)²) and
    * intercept = (Σy·Σx² − Σx·Σxy)/(same denominator) — integer
    * numerators and denominator, ONE IEEE division each floored onto the
    * e6 grid with identical formula text both engines (q133's rule;
    * `div` is avoided because the numerator can be negative and
    * truncation ≠ floor there). Types with fewer than 2 observed hours
    * export NULL — stated in the oracle.
    *
    * Scale shape: the corpus collapses map-side in ONE (type, hour)
    * partial-agg shuffle; the regression folds |hours| rows per type to
    * five sums — at 100 TB the window never sees raw events, only the
    * pre-aggregated series (the q133/q140 class). */
  def q146GroupTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = Tables.events(s, dir)
      .select($"event_type", expr("unix_millis(ts) div 3600000").as("hr"))
      .groupBy($"event_type", $"hr").agg(count(lit(1)).as("y"))
    val x = $"hr" - min($"hr").over(Window.partitionBy($"event_type"))
    h.withColumn("x", x)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("c"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select($"event_type", $"c",
        when($"c" >= 2, floor(lit(1000000.0) * ($"c" * $"sxy" - $"sx" * $"sy") /
          ($"c" * $"sxx" - $"sx" * $"sx").cast("double")).cast("long"))
          .otherwise(lit(null).cast("long")).as("slope_e6"),
        when($"c" >= 2, floor(lit(1000000.0) * ($"sy" * $"sxx" - $"sx" * $"sxy") /
          ($"c" * $"sxx" - $"sx" * $"sx").cast("double")).cast("long"))
          .otherwise(lit(null).cast("long")).as("intercept_e6"))
      .orderBy($"event_type")
  }

  /** q146 oracle: identical hour grid, per-type x re-basing, integer
    * sums, and single-division e6 floors. */
  val q146Sql: String =
    """WITH h AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |x AS (
      |  SELECT event_type, hr - min(hr) OVER (PARTITION BY event_type) AS x, y
      |  FROM h),
      |sums AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM x GROUP BY 1)
      |SELECT event_type, c,
      |  CASE WHEN c >= 2 THEN CAST(floor(1000000.0 * (c * sxy - sx * sy)
      |    / CAST(c * sxx - sx * sx AS DOUBLE)) AS BIGINT) ELSE NULL END
      |    AS slope_e6,
      |  CASE WHEN c >= 2 THEN CAST(floor(1000000.0 * (sy * sxx - sx * sxy)
      |    / CAST(c * sxx - sx * sx AS DOUBLE)) AS BIGINT) ELSE NULL END
      |    AS intercept_e6
      |FROM sums ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q140

  /** q140_gap_fill — time-series resample onto the dense hour grid with
    * forward-fill: per event type, every hour in the corpus's global
    * [min, max] hour range becomes a row (observed or not), missing hours
    * carry the most recent OBSERVED hour's value sum plus their staleness
    * age. This is the metrics/sensor-resampling op every monitoring and
    * feature-engineering pipeline needs (q133 z-scores the observed
    * series; this one makes the series dense so downstream windows and
    * joins can assume a complete calendar).
    *
    * Spark-first shape: the corpus collapses map-side in ONE (type, hour)
    * partial-agg shuffle (the q94/q133 class); the dense grid is generated
    * from a 1-row global-bounds aggregate BROADCAST onto the distinct
    * types and `sequence()`-exploded — grid cardinality is
    * |types|·|hours|, a property of the time span and not of the corpus
    * volume, so at 100 TB the grid is still a few thousand rows and the
    * gap-fill window runs per type over its own dense series. Value sums
    * ride the e2 integer grid (exact under any shuffle order); the
    * forward-fill is `last(_, ignoreNulls)` over the running frame —
    * single pass, O(1) state per type. */
  def q140GapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = Tables.events(s, dir)
      .select($"event_type", expr("unix_millis(ts) div 3600000").as("hr"), $"value")
      .groupBy($"event_type", $"hr")
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * 100 + 0.5).cast("long")).as("v2"))
    val bounds = h.agg(min($"hr").as("lo"), max($"hr").as("hi"))
    val grid = Tables.events(s, dir).select($"event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select($"event_type", explode(sequence($"lo", $"hi")).as("hr"))
    val w = Window.partitionBy($"event_type").orderBy($"hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(h, Seq("event_type", "hr"), "left")
      .select($"event_type", $"hr",
        coalesce($"n", lit(0L)).as("n"),
        last($"v2", ignoreNulls = true).over(w).as("filled_v2"),
        ($"hr" - last(when($"v2".isNotNull, $"hr"), ignoreNulls = true).over(w))
          .as("gap_age"))
      .orderBy($"event_type", $"hr")
  }

  /** q140 oracle: identical grid bounds, fill rule, and staleness age. */
  val q140Sql: String =
    """WITH h AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, count(*) AS n,
      |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v2
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
      |g AS (
      |  SELECT t.event_type, UNNEST(generate_series(b.lo, b.hi)) AS hr
      |  FROM (SELECT DISTINCT event_type FROM events) t, b),
      |j AS (
      |  SELECT g.event_type, g.hr, coalesce(h.n, 0) AS n, h.v2
      |  FROM g LEFT JOIN h ON g.event_type = h.event_type AND g.hr = h.hr)
      |SELECT event_type, hr, CAST(n AS BIGINT) AS n,
      |  last_value(v2 IGNORE NULLS) OVER w AS filled_v2,
      |  hr - last_value(CASE WHEN v2 IS NOT NULL THEN hr END IGNORE NULLS)
      |         OVER w AS gap_age
      |FROM j
      |WINDOW w AS (PARTITION BY event_type ORDER BY hr
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, hr""".stripMargin

  // ---------------------------------------------------------------- q138

  /** q138_scd2_join — slowly-changing-dimension (Type 2) enrichment: every
    * event joins the dimension VERSION that was valid at its event time.
    * q44 is the event-to-event as-of join; this is its dimension flavor —
    * the "which segment was this customer in WHEN the event happened"
    * question that naive `fact ⋈ current_dim` answers wrongly for any
    * backfill or late event.
    *
    * Dimension versions are deterministic: three per customer (v = 0,1,2),
    * valid from Jan 1 / 11 / 21 (the events table's own 30-day span, so
    * every version is exercised), attribute `seg_ver = mktsegment#v`.
    *
    * Spark-first shape is q44's single-shuffle carry-forward, NOT a
    * range join: dim-version rows and event rows union into ONE stream,
    * partition by the customer key, order by (ms, kind) — dim sorts
    * before events at equal ms, making the validity bound inclusive —
    * and a last-non-null window carries each customer's newest
    * at-or-before version onto every event row. One exchange total;
    * per-key window state is O(1); no row multiplication ever (contrast
    * the valid_ms ≤ ms join, which multiplies every event by its
    * candidate versions before pruning — the oracle states THAT form
    * declaratively, the plan never builds it). */
  def q138Scd2Join(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = 1704067200000L // 2024-01-01 00:00:00 UTC, the corpus epoch
    val step = 864000000L     // 10 days
    val dimv = Tables.customer(s, dir)
      .select($"c_custkey", $"c_mktsegment",
        explode(array(lit(0L), lit(1L), lit(2L))).as("v"))
      .select($"c_custkey".as("k"), (lit(base) + $"v" * step).as("ms"),
        lit(0).as("kind"), $"v",
        concat($"c_mktsegment", lit("#"), $"v").as("seg_ver"),
        lit(null).cast("long").as("event_id"))
    val ev = Tables.events(s, dir)
      .select($"user_id".as("k"), unix_millis($"ts").as("ms"),
        lit(1).as("kind"), lit(null).cast("long").as("v"),
        lit(null).cast("string").as("seg_ver"), $"event_id")
    val w = Window.partitionBy($"k").orderBy($"ms", $"kind", $"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dimv.unionByName(ev)
      .withColumn("cur_v", last($"v", ignoreNulls = true).over(w))
      .withColumn("cur_seg", last($"seg_ver", ignoreNulls = true).over(w))
      .filter($"kind" === 1 && $"cur_seg".isNotNull)
      .select($"event_id", $"k".as("user_id"), $"cur_v".as("version"),
        $"cur_seg".as("seg_ver"))
      .orderBy($"event_id")
  }

  /** q138 oracle: the declarative SCD-2 form — newest version with
    * valid_ms ≤ event ms per event. */
  val q138Sql: String =
    """WITH dimv AS (
      |  SELECT c_custkey, CAST(u.v AS BIGINT) AS v,
      |    c_mktsegment || '#' || u.v AS seg_ver,
      |    1704067200000 + u.v * 864000000 AS valid_ms
      |  FROM customer, UNNEST([0, 1, 2]) AS u(v)),
      |ev AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events),
      |j AS (
      |  SELECT e.event_id, e.user_id, d.v, d.seg_ver,
      |    row_number() OVER (PARTITION BY e.event_id
      |                       ORDER BY d.valid_ms DESC) AS rn
      |  FROM ev e JOIN dimv d
      |    ON d.c_custkey = e.user_id AND d.valid_ms <= e.ms)
      |SELECT event_id, user_id, v AS version, seg_ver
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q177

  /** q177_rolling_actives — trailing-7-day distinct active users per
    * event type, per observed day: the rolling-DAU/WAU family. SQL states
    * it as `count(DISTINCT user)` over a range window — which Spark
    * (correctly) refuses, because windowed DISTINCT does not decompose.
    * The engine form is the COVERAGE-INTERVAL decomposition: a user's
    * activity on day d makes them "active" for days [d, d+6], so per
    * (type, user) the distinct activity days are merged into islands
    * (gap > 6 ⇒ new island — adjacent coverage would overlap otherwise),
    * each island [s, e] covers [s, e+6] exactly once, and the per-day
    * count is then a plain `count(*)` — no DISTINCT ever touches a
    * corpus-sized relation.
    *
    * Scale shape: one (type, user, day) dedup shuffle (map-side
    * combinable); the island window partitions by (type, user) — fully
    * parallel, state O(1) per row; the explode emits at most
    * span+6 rows per island (calendar-bounded, disjoint by the gap rule);
    * the final count folds map-side onto |types|·|days| rows. The
    * observed-day filter is a broadcast semi-join against the ≤|days|
    * calendar. */
  def q177RollingActives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, dir)
      .select($"event_type", $"user_id", to_date($"ts").as("d")).distinct()
    val w = Window.partitionBy($"event_type", $"user_id").orderBy($"d")
    val islands = p
      .withColumn("gap", datediff($"d", lag($"d", 1).over(w)))
      .withColumn("new_island", when($"gap".isNull || $"gap" > 6, 1).otherwise(0))
      .withColumn("island",
        sum($"new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"event_type", $"user_id", $"island")
      .agg(min($"d").as("s"), max($"d").as("e"))
    val coverage = islands.select($"event_type", $"user_id",
      explode(sequence($"s", date_add($"e", 6))).as("day"))
    val observedDays = p.select($"d".as("day")).distinct()
    coverage.join(broadcast(observedDays), "day")
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("actives_7d"))
      // ISO string, not DateType: the cross-engine hash needs one rendering
      .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
        $"actives_7d")
      .orderBy($"event_type", $"day")
  }

  /** q177 oracle: the declarative trailing-window distinct count — the
    * island decomposition must reproduce it day for day. */
  val q177Sql: String =
    """WITH p AS (
      |  SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS d
      |  FROM events),
      |days AS (SELECT DISTINCT d AS day FROM p)
      |SELECT p.event_type, strftime(days.day, '%Y-%m-%d') AS day,
      |  CAST(count(DISTINCT p.user_id) AS BIGINT) AS actives_7d
      |FROM days JOIN p ON p.d BETWEEN days.day - 6 AND days.day
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q180

  /** q180_survival — Kaplan–Meier product-limit survival curve (Kaplan &
    * Meier, JASA 1958) for signup→purchase conversion with right
    * censoring at the observation horizon: per event day t, the at-risk
    * count, conversions d, and Ŝ(t) = Π_{u≤t}(1 − d_u/n_u) on the e6
    * grid. The time-to-event family (churn, conversion, failure
    * analysis) that naive "average latency of converters" reporting gets
    * wrong — censored subjects carry information the product-limit form
    * keeps.
    *
    * Exactness: d and n are exact longs from one day-level fold; the
    * running product is `exp(Σ ln(1 − d/n))` — the established
    * cross-engine `log`/`ln` idiom — accumulated by an ORDERED running
    * window, which both engines fold sequentially in day order (the
    * q154 rule), with the e6 floor absorbing libm ulp; extinction
    * (d = n, ln 0) short-circuits to exactly 0 via a running flag.
    *
    * Scale shape: two user-keyed aggregations (first signup, first
    * qualifying purchase) co-partition on user_id; the curve algebra
    * runs on the |distinct duration days| relation — calendar-bounded,
    * corpus-independent — so the windows never see corpus-sized input. */
  def q180Survival(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_type", to_date($"ts").as("d"))
    val su = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"d").as("s_day"))
    val pu = ev.filter($"event_type" === "purchase")
      .join(su, "user_id").filter($"d" >= $"s_day")
      .groupBy($"user_id").agg(min($"d").as("p_day"))
    val horizon = ev.agg(max($"d").as("h"))
    val subj = su.join(pu, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        when($"p_day".isNotNull, datediff($"p_day", $"s_day"))
          .otherwise(datediff($"h", $"s_day")).as("t"),
        when($"p_day".isNotNull, 1L).otherwise(0L).as("ev"))
    val byday = subj.groupBy($"t")
      .agg(sum($"ev").as("d_ev"), (count(lit(1)) - sum($"ev")).as("c_ev"))
    val tot = subj.agg(count(lit(1)).as("n0"))
    val wPrior = Window.orderBy($"t").rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy($"t").rowsBetween(Window.unboundedPreceding, 0)
    byday.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        $"n0" - coalesce(sum($"d_ev" + $"c_ev").over(wPrior), lit(0L)))
      .filter($"d_ev" > 0)
      .withColumn("extinct",
        max(when($"d_ev" === $"n_risk", 1).otherwise(0)).over(wCum))
      .withColumn("lsum", sum(when($"d_ev" === $"n_risk", lit(0.0))
        .otherwise(log(lit(1.0) - $"d_ev".cast("double") / $"n_risk"))).over(wCum))
      .select($"t", $"n_risk", $"d_ev".as("d"),
        floor((when($"extinct" === 1, lit(0.0)).otherwise(exp($"lsum")))
          * 1000000 + 0.5).cast("long").as("surv_e6"))
      .orderBy($"t")
  }

  /** q180 oracle: the same product-limit derivation declaratively. */
  val q180Sql: String =
    """WITH su AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS s_day
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |pu AS (
      |  SELECT e.user_id, min(CAST(e.ts AS DATE)) AS p_day
      |  FROM events e JOIN su ON su.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= su.s_day
      |  GROUP BY 1),
      |horizon AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
      |subj AS (
      |  SELECT su.user_id,
      |    CASE WHEN pu.p_day IS NOT NULL THEN datediff('day', su.s_day, pu.p_day)
      |         ELSE datediff('day', su.s_day, horizon.h) END AS t,
      |    CASE WHEN pu.p_day IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM su LEFT JOIN pu ON pu.user_id = su.user_id CROSS JOIN horizon),
      |byday AS (
      |  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
      |         CAST(count(*) - sum(ev) AS BIGINT) AS c
      |  FROM subj GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM subj),
      |risk AS (
      |  SELECT t, d, c,
      |    n0 - CAST(COALESCE(sum(d + c) OVER (ORDER BY t
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |         AS BIGINT) AS n_risk
      |  FROM byday CROSS JOIN tot),
      |km AS (
      |  SELECT t, n_risk, d,
      |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS extinct,
      |    sum(CASE WHEN d = n_risk THEN 0.0
      |             ELSE ln(1.0 - CAST(d AS DOUBLE) / n_risk) END) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum
      |  FROM risk WHERE d > 0)
      |SELECT t, n_risk, d,
      |  CAST(floor(CASE WHEN extinct = 1 THEN 0.0 ELSE exp(lsum) END
      |             * 1000000 + 0.5) AS BIGINT) AS surv_e6
      |FROM km ORDER BY t""".stripMargin

  // ---------------------------------------------------------------- q184

  /** q184_cusum — CUSUM changepoint/drift monitor (Page, Biometrika
    * 1954) over daily event counts per type: the sequential
    * level-shift detector a data-quality pipeline runs over feed
    * volumes (the "did ingestion silently halve" alarm that q133's
    * per-hour z-score misses because it only sees single-bucket
    * spikes, not slow accumulating drift).
    *
    * The one-sided statistic S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − K))
    * is the q154 Lindley recurrence, so it gets the same closed form:
    * prefix sum minus running minimum — two ordered windows, no
    * iterative fold. Everything stays INTEGER by scaling through n
    * (days per type): increment = n·x − S − (S div 200) where S = Σx,
    * i.e. slack K = mean/200, alarm threshold h = mean·n/10 — both
    * DEFINED as integer ops so the statistic is exact cross-engine
    * (no float ever enters). Slack sits below the noise floor on
    * purpose: the statistic is a live random walk and the alarm set
    * discriminates at every SF (24/150 alarm days at sf0.1).
    *
    * Scale shape: one map-side-combinable fold collapses the corpus to
    * |types|·|days| rows; everything after — the stats join, both
    * windows, the alarm compare — runs on that calendar-bounded
    * relation, partitioned by type. Int64 bound: n·x < 2⁶³ needs
    * x ≲ 6×10¹⁶ daily events/type at n = 150 — unreachable. */
  def q184Cusum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("x"))
    val st = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.join(broadcast(st), "event_type")
      .withColumn("inc", $"n" * $"x" - $"s" - expr("s div 200"))
      .withColumn("p", sum($"inc").over(w))
      .withColumn("m", least(lit(0L), min($"p").over(w)))
      .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
        $"x", ($"p" - $"m").as("cusum_scaled"),
        when($"p" - $"m" > expr("s div 10"), lit(1L)).otherwise(lit(0L))
          .as("alarm"))
      .orderBy($"event_type", $"day")
  }

  /** q184 oracle: the identical integer Lindley closed form. */
  val q184Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS s
      |  FROM daily GROUP BY 1),
      |inc AS (
      |  SELECT d.event_type, d.day, d.x,
      |         n.n * d.x - n.s - (n.s // 200) AS inc, n.s AS s
      |  FROM daily d JOIN st n USING (event_type)),
      |pre AS (
      |  SELECT event_type, day, x, s,
      |    CAST(sum(inc) OVER (PARTITION BY event_type ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
      |  FROM inc),
      |cu AS (
      |  SELECT event_type, day, x, s, p,
      |    CAST(least(0, min(p) OVER (PARTITION BY event_type ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS m
      |  FROM pre)
      |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
      |  p - m AS cusum_scaled,
      |  CAST(CASE WHEN p - m > s // 10 THEN 1 ELSE 0 END AS BIGINT) AS alarm
      |FROM cu ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q185

  /** q185_acf — lag-k autocorrelation of the daily event-count series
    * per type (the Box–Jenkins identification statistic): r_k =
    * Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² at lags {1, 2, 3, 7} — the
    * seasonality screen (a weekly-periodic feed shows r_7 ≫ r_1) a
    * forecasting or anomaly layer runs before choosing its model.
    *
    * Exactness: scaling every centered term through n makes both the
    * numerator and denominator INTEGER — c_t = n·x_t − Σx, so
    * Σ c_t·c_{t+k} and Σ c_t² are exact int64 cross-engine; the single
    * float division lands on e6. Int64 bound: Σc² < 2⁶³ needs daily
    * x ≲ 1.7M events/type at n = 150 (c ≤ n·x); decimal(38) widening
    * is the one-line escape beyond that.
    *
    * Scale shape: the corpus folds map-side to |types|·|days| rows;
    * the lag self-join, the 4-lag explode, and both folds run on that
    * calendar-bounded relation — corpus size never reaches a join or
    * window. */
  def q185Acf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), to_date(lit("2024-01-01"))).as("d"))
      .agg(count(lit(1)).as("x"))
    val st = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val c = daily.join(broadcast(st), "event_type")
      .select($"event_type", $"d", ($"n" * $"x" - $"s").as("cx"))
    val den = c.groupBy($"event_type").agg(sum($"cx" * $"cx").as("den"))
    val num = c
      .withColumn("lag", explode(array(lit(1L), lit(2L), lit(3L), lit(7L))))
      .as("a")
      .join(c.as("b"),
        $"b.event_type" === $"a.event_type" &&
          $"b.d" === ($"a.d" + $"a.lag").cast("int"))
      .groupBy($"a.event_type".as("event_type"), $"a.lag".as("lag"))
      .agg(sum($"a.cx" * $"b.cx").as("num"))
    num.join(broadcast(den), "event_type")
      .select($"event_type", $"lag", $"num", $"den",
        floor($"num".cast("double") / $"den" * 1000000 + 0.5).cast("long")
          .as("acf_e6"))
      .orderBy($"event_type", $"lag")
  }

  /** q185 oracle: identical integer centering and float chain. */
  val q185Sql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS s
      |  FROM daily GROUP BY 1),
      |c AS (
      |  SELECT d.event_type, d.d, n.n * d.x - n.s AS cx
      |  FROM daily d JOIN st n USING (event_type)),
      |den AS (
      |  SELECT event_type, CAST(sum(cx * cx) AS BIGINT) AS den
      |  FROM c GROUP BY 1),
      |lags AS (SELECT CAST(unnest([1, 2, 3, 7]) AS BIGINT) AS lag),
      |num AS (
      |  SELECT a.event_type, l.lag, CAST(sum(a.cx * b.cx) AS BIGINT) AS num
      |  FROM c a CROSS JOIN lags l JOIN c b
      |    ON b.event_type = a.event_type AND b.d = a.d + l.lag
      |  GROUP BY 1, 2)
      |SELECT n.event_type, n.lag, n.num, d.den,
      |  CAST(floor(CAST(n.num AS DOUBLE) / d.den * 1000000 + 0.5)
      |       AS BIGINT) AS acf_e6
      |FROM num n JOIN den d USING (event_type)
      |ORDER BY event_type, lag""".stripMargin

  // ---------------------------------------------------------------- q195

  /** q195_cohort_ltv — cumulative lifetime-value curve per acquisition
    * cohort (first-order month): cohort size, per-age revenue, and the
    * running cumulative — the unit-economics readout (payback period,
    * LTV/CAC) that q83's retention counts price out. Revenue stays on
    * the e2 integer grid end to end.
    *
    * Scale shape: two custkey-co-partitioned passes (first-order month,
    * then revenue attributed to cohort × month-age) fold the corpus
    * map-side to |cohorts|·|ages| rows; the cumulative window and the
    * cohort-size join run on that calendar-bounded relation,
    * partitioned by cohort. */
  def q195CohortLtv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_custkey".as("c"),
      trunc(to_date($"o_orderdate"), "month").as("m"),
      floor($"o_totalprice" * 100 + 0.5).cast("long").as("rev"))
    val fo = o.groupBy($"c").agg(min($"m").as("cohort"))
    val r = o.join(fo, "c")
      .groupBy($"cohort",
        months_between($"m", $"cohort").cast("long").as("age"))
      .agg(sum($"rev").as("rev_e2"))
    val cs = fo.groupBy($"cohort").agg(count(lit(1)).as("n_cust"))
    val w = Window.partitionBy($"cohort").orderBy($"age")
      .rowsBetween(Window.unboundedPreceding, 0)
    r.join(broadcast(cs), "cohort")
      .withColumn("cum_rev_e2", sum($"rev_e2").over(w))
      .select(date_format($"cohort", "yyyy-MM").as("cohort"),
        $"age", $"n_cust", $"rev_e2", $"cum_rev_e2")
      .orderBy($"cohort", $"age")
  }

  /** q195 oracle: identical two-pass cohort attribution. */
  val q195Sql: String =
    """WITH fo AS (SELECT o_custkey AS c,
      |  min(date_trunc('month', CAST(o_orderdate AS DATE))) AS cohort
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT fo.cohort,
      |    CAST(date_diff('month', fo.cohort,
      |         date_trunc('month', CAST(o.o_orderdate AS DATE)))
      |         AS BIGINT) AS age,
      |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
      |         AS BIGINT) AS rev_e2
      |  FROM orders o JOIN fo ON fo.c = o.o_custkey GROUP BY 1, 2),
      |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cust
      |       FROM fo GROUP BY 1)
      |SELECT strftime(r.cohort, '%Y-%m') AS cohort, r.age, cs.n_cust,
      |  r.rev_e2,
      |  CAST(sum(r.rev_e2) OVER (PARTITION BY r.cohort ORDER BY r.age
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_rev_e2
      |FROM r JOIN cs ON cs.cohort = r.cohort
      |ORDER BY cohort, age""".stripMargin

  // ---------------------------------------------------------------- q197

  /** q197_changepoint — single changepoint LOCALIZATION by binary
    * segmentation (Scott & Knott 1974; the first split of the
    * recursive scheme): per event type, the day t maximizing the
    * integer between-segment contrast |S₁·(n−t) − S₂·t| (the scaled
    * mean-difference objective — cross-multiplied so no division ever
    * happens). q184 answers "is there drift?"; this answers "WHERE did
    * the level shift happen" — the pair a monitoring pipeline runs
    * together.
    *
    * Scale shape: one map-side fold to |types|·|days| rows; prefix
    * sums and the argmax window are type-partitioned and
    * calendar-bounded. All integer; ties break on the earlier day. */
  def q197Changepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("x"))
    val wPre = Window.partitionBy($"event_type").orderBy($"day")
    val pre = daily
      .withColumn("s1",
        sum($"x").over(wPre.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t", row_number().over(wPre).cast("long"))
    val tot = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val wBest = Window.partitionBy($"event_type")
      .orderBy($"contrast".desc, $"day")
    pre.join(broadcast(tot), "event_type")
      .filter($"t" < $"n")
      .withColumn("contrast",
        abs($"s1" * ($"n" - $"t") - ($"s" - $"s1") * $"t"))
      .withColumn("rn", row_number().over(wBest)).filter($"rn" === 1)
      .select($"event_type", date_format($"day", "yyyy-MM-dd").as("split_day"),
        $"t".as("split_t"), $"contrast")
      .orderBy($"event_type")
  }

  /** q197 oracle: the identical integer contrast argmax. */
  val q197Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |pre AS (
      |  SELECT event_type, day, x,
      |    CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS s1,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
      |         AS BIGINT) AS t
      |  FROM daily),
      |tot AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS s
      |  FROM daily GROUP BY 1),
      |obj AS (
      |  SELECT p.event_type, p.day, p.t,
      |    abs(p.s1 * (n.n - p.t) - (n.s - p.s1) * p.t) AS contrast
      |  FROM pre p JOIN tot n USING (event_type)
      |  WHERE p.t < n.n),
      |best AS (
      |  SELECT event_type, day, t, contrast,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY contrast DESC, day) AS rn
      |  FROM obj)
      |SELECT event_type, strftime(day, '%Y-%m-%d') AS split_day,
      |       t AS split_t, contrast
      |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q198

  /** q198_seasonal_profile — day-of-week seasonal decomposition with
    * residual outliers: per (type, dow) profile means, per-day
    * INTEGER-scaled residual n_d·x − S_d, and a |resid| > S_d/4 flag —
    * the weekly-seasonality baseline (staffing, capacity, anomaly
    * suppression) that q184/q133 treat as noise. The day-of-week is
    * computed as (epochDay + 3) % 7 — pure integer arithmetic both
    * engines share, sidestepping the engines' differing dayofweek()
    * conventions (0 = Monday).
    *
    * Scale shape: one map-side fold to |types|·|days| rows, a 7-row
    * profile join, and integer algebra — nothing downstream of the
    * fold sees corpus-sized input. */
  def q198SeasonalProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow",
        pmod(datediff($"day", lit("1970-01-01").cast("date")) + 3, lit(7))
          .cast("long"))
    val prof = daily.groupBy($"event_type", $"dow")
      .agg(count(lit(1)).as("nd"), sum($"x").as("sd"))
    daily.join(broadcast(prof), Seq("event_type", "dow"))
      .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
        $"dow", $"x", ($"nd" * $"x" - $"sd").as("resid_scaled"),
        when(abs($"nd" * $"x" - $"sd") > expr("sd div 4"), lit(1L))
          .otherwise(lit(0L)).as("outlier"))
      .orderBy($"event_type", $"day")
  }

  /** q198 oracle: identical integer profile algebra. */
  val q198Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |dw AS (
      |  SELECT event_type, day, x,
      |    (CAST(day - DATE '1970-01-01' AS BIGINT) + 3) % 7 AS dow
      |  FROM daily),
      |prof AS (
      |  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS nd,
      |         CAST(sum(x) AS BIGINT) AS sd
      |  FROM dw GROUP BY 1, 2)
      |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.dow, d.x,
      |  p.nd * d.x - p.sd AS resid_scaled,
      |  CAST(CASE WHEN abs(p.nd * d.x - p.sd) > p.sd // 4 THEN 1 ELSE 0 END
      |       AS BIGINT) AS outlier
      |FROM dw d JOIN prof p ON p.event_type = d.event_type AND p.dow = d.dow
      |ORDER BY d.event_type, day""".stripMargin

  // ---------------------------------------------------------------- q202

  /** q202_interpolate — linear gap interpolation over a sparse daily
    * series (the sensor/metrics-backfill operator: q140 zero-fills
    * missing buckets, this RECONSTRUCTS them from the neighbors —
    * what dashboards and feature pipelines actually want for sampled
    * series). The observation grid is structurally sparse by a
    * deterministic day pattern ((day² mod 5) < 2 — the q190/q199
    * synthesis discipline), so the operator is exercised identically
    * at every SF: 60 of 150 grid days interpolate.
    *
    * Exactness: the carried neighbors (pd, pv, nd, nv) come from
    * ffill/bfill windows both engines fold sequentially; the
    * interpolated value is pv + floor((nv−pv)·(day−pd) / (nd−pd)) with
    * the division as ONE double op — floor(double) agrees on negatives
    * where integer `div`/`//` would not (truncate vs floor, the
    * established rule).
    *
    * Scale shape: one map-side fold to |types|·|days| rows; the grid
    * and all four carry windows are calendar-bounded and
    * type-partitioned. */
  def q202Interpolate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.events(s, dir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(sum(floor($"value" * 100 + 0.5).cast("long")).as("v"))
      .filter(($"day" * $"day") % 5 < 2)
    val bounds = d.groupBy($"event_type")
      .agg(min($"day").as("lo"), max($"day").as("hi"))
    val grid = bounds.select($"event_type",
      explode(sequence($"lo", $"hi")).as("day"))
    val j = grid.join(d, Seq("event_type", "day"), "left")
    val wB = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(0, Window.unboundedFollowing)
    j.withColumn("pd", last(when($"v".isNotNull, $"day"), ignoreNulls = true).over(wB))
      .withColumn("pv", last(when($"v".isNotNull, $"v"), ignoreNulls = true).over(wB))
      .withColumn("nd", first(when($"v".isNotNull, $"day"), ignoreNulls = true).over(wF))
      .withColumn("nv", first(when($"v".isNotNull, $"v"), ignoreNulls = true).over(wF))
      .select($"event_type", $"day",
        when($"v".isNotNull, $"v")
          .otherwise($"pv" + floor((($"nv" - $"pv") * ($"day" - $"pd"))
            .cast("double") / ($"nd" - $"pd")).cast("long"))
          .as("v_interp_e2"),
        when($"v".isNull, lit(1L)).otherwise(lit(0L)).as("interpolated"))
      .orderBy($"event_type", $"day")
  }

  /** q202 oracle: identical carry windows and the one-division float
    * interpolation chain. */
  val q202Sql: String =
    """WITH d0 AS (
      |  SELECT event_type,
      |         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
      |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |           AS v
      |  FROM events GROUP BY 1, 2),
      |d AS (SELECT * FROM d0 WHERE (day * day) % 5 < 2),
      |bounds AS (SELECT event_type, min(day) AS lo, max(day) AS hi
      |           FROM d GROUP BY 1),
      |grid AS (SELECT b.event_type, b.lo + u.g AS day
      |         FROM bounds b CROSS JOIN unnest(range(0, 200)) AS u(g)
      |         WHERE b.lo + u.g <= b.hi),
      |j AS (SELECT grid.event_type, grid.day, d.v
      |      FROM grid LEFT JOIN d USING (event_type, day)),
      |seg AS (
      |  SELECT event_type, day, v,
      |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
      |    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY day
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
      |    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
      |      OVER (PARTITION BY event_type ORDER BY day
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
      |  FROM j)
      |SELECT event_type, day,
      |  CAST(CASE WHEN v IS NOT NULL THEN v
      |       ELSE pv + CAST(floor(CAST((nv - pv) * (day - pd) AS DOUBLE)
      |                 / (nd - pd)) AS BIGINT) END AS BIGINT) AS v_interp_e2,
      |  CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS interpolated
      |FROM seg ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q204

  /** q204_relative_risk — two-variant experiment readout as RELATIVE
    * RISK with the Katz log-normal 95% CI (the epidemiology/AB-test
    * statistic q148's CUPED means don't report): users hash-assigned
    * to variants (the established md5 idiom), conversion = any
    * high-value purchase, output = counts, RR on e6, and the ln-scale
    * CI bounds.
    *
    * Exactness: counts are exact; the RR and CI chains are shared-shape
    * float ops — one division inside ln, IEEE-exact sqrt (sqrt is
    * correctly rounded per IEEE 754, bit-identical cross-engine), the
    * e6 floor absorbing libm's ln ulp (the q180 rule).
    *
    * Scale shape: one user-keyed fold, a 2-row variant aggregate, and
    * scalar algebra on a 1-row relation. */
  def q204RelativeRisk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val u = Tables.events(s, dir).groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" && $"value" > 150.0, 1L)
        .otherwise(0L)).as("conv"))
      .withColumn("variant",
        when(conv(substring(md5($"user_id".cast("string")), 1, 15), 16, 10)
          .cast("long") % 2 === 0, "A").otherwise("B"))
    val v = u.groupBy($"variant").agg(count(lit(1)).as("n"), sum($"conv").as("x"))
    val ab = v.filter($"variant" === "A").select($"n".as("na"), $"x".as("xa"))
      .crossJoin(v.filter($"variant" === "B").select($"n".as("nb"), $"x".as("xb")))
    val lnRr = log($"xa".cast("double") * $"nb" / ($"xb" * $"na"))
    val se = sqrt(lit(1.0) / $"xa" - lit(1.0) / $"na" +
      lit(1.0) / $"xb" - lit(1.0) / $"nb")
    ab.select($"na", $"xa", $"nb", $"xb",
      floor($"xa".cast("double") * $"nb" / ($"xb" * $"na") * 1000000 + 0.5)
        .cast("long").as("rr_e6"),
      floor((lnRr - lit(1.96) * se) * 1000000 + 0.5).cast("long").as("lo_e6"),
      floor((lnRr + lit(1.96) * se) * 1000000 + 0.5).cast("long").as("hi_e6"))
  }

  /** q204 oracle: identical float chains (ln/sqrt shared shape). */
  val q204Sql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    CASE WHEN CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 2 = 0
      |         THEN 'A' ELSE 'B' END AS variant,
      |    max(CASE WHEN event_type = 'purchase' AND value > 150.0
      |             THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1),
      |v AS (
      |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(conv) AS BIGINT) AS x
      |  FROM u GROUP BY 1),
      |ab AS (
      |  SELECT a.n AS na, a.x AS xa, b.n AS nb, b.x AS xb
      |  FROM (SELECT * FROM v WHERE variant = 'A') a,
      |       (SELECT * FROM v WHERE variant = 'B') b)
      |SELECT na, xa, nb, xb,
      |  CAST(floor(CAST(xa AS DOUBLE) * nb / (xb * na) * 1000000 + 0.5)
      |       AS BIGINT) AS rr_e6,
      |  CAST(floor((ln(CAST(xa AS DOUBLE) * nb / (xb * na))
      |       - 1.96 * sqrt(1.0/xa - 1.0/na + 1.0/xb - 1.0/nb)) * 1000000
      |       + 0.5) AS BIGINT) AS lo_e6,
      |  CAST(floor((ln(CAST(xa AS DOUBLE) * nb / (xb * na))
      |       + 1.96 * sqrt(1.0/xa - 1.0/na + 1.0/xb - 1.0/nb)) * 1000000
      |       + 0.5) AS BIGINT) AS hi_e6
      |FROM ab""".stripMargin

  // ---------------------------------------------------------------- q205

  /** q205_attribution_models — three attribution models side by side
    * (first-touch / last-touch / linear) over pre-purchase journeys:
    * the model-comparison table marketing runs before standardizing on
    * one (q153 computes last-touch alone; the disagreement BETWEEN
    * models is the deliverable here). Linear credit is
    * floor(10⁶/m + 0.5) per touch — integer, defined identically in
    * both engines.
    *
    * Scale shape: first-purchase lookup and the journey windows all
    * ride ONE user_id partitioning; credit folds map-side to
    * |channels| rows. */
  def q205AttributionModels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, dir).filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"ts").as("pts"))
    val wU = Window.partitionBy($"user_id")
    val t = Tables.events(s, dir)
      .filter($"event_type".isin("view", "click", "signup"))
      .join(p, "user_id").filter($"ts" < $"pts")
      .select($"user_id", $"event_type".as("ch"), $"ts", $"event_id")
      .withColumn("i", row_number().over(wU.orderBy($"ts", $"event_id")))
      .withColumn("m", count(lit(1)).over(wU))
    t.groupBy($"ch").agg(
        sum(when($"i" === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when($"i" === $"m", 1L).otherwise(0L)).as("last_touch"),
        sum(floor(lit(1000000.0) / $"m" + 0.5).cast("long")).as("linear_e6"))
      .orderBy($"ch")
  }

  /** q205 oracle: identical journey windows and credit arithmetic. */
  val q205Sql: String =
    """WITH p AS (
      |  SELECT user_id, min(ts) AS pts FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |t AS (
      |  SELECT e.user_id, e.event_type AS ch, e.ts,
      |         row_number() OVER (PARTITION BY e.user_id
      |           ORDER BY e.ts, e.event_id) AS i,
      |         count(*) OVER (PARTITION BY e.user_id) AS m
      |  FROM events e JOIN p ON p.user_id = e.user_id
      |  WHERE e.event_type IN ('view', 'click', 'signup') AND e.ts < p.pts),
      |credit AS (
      |  SELECT ch,
      |    CAST(sum(CASE WHEN i = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS first_touch,
      |    CAST(sum(CASE WHEN i = m THEN 1 ELSE 0 END) AS BIGINT)
      |      AS last_touch,
      |    CAST(sum(CAST(floor(1000000.0 / m + 0.5) AS BIGINT)) AS BIGINT)
      |      AS linear_e6
      |  FROM t GROUP BY 1)
      |SELECT * FROM credit ORDER BY ch""".stripMargin

  // ---------------------------------------------------------------- q215

  /** q215_srm — sample-ratio-mismatch guardrail (the FIRST check every
    * experiment platform runs before reading any metric: do the
    * assignment counts match the designed 50/50 split?): the 1-df
    * chi-square (n_A − n_B)²/(n_A + n_B) on e6 with the 3.841 critical
    * value as an integer cross-multiplied flag. A hash split correctly
    * never flags — the gate proves the MECHANISM (an SRM here would
    * mean the md5 assignment itself is broken upstream of every
    * experiment readout q148/q204 produce).
    *
    * One distinct-user fold, a 1-row aggregate, integer flag algebra. */
  def q215Srm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val u = Tables.events(s, dir).select($"user_id").distinct()
      .withColumn("variant",
        when(conv(substring(md5($"user_id".cast("string")), 1, 15), 16, 10)
          .cast("long") % 2 === 0, "A").otherwise("B"))
    u.agg(
        sum(when($"variant" === "A", 1L).otherwise(0L)).as("na"),
        sum(when($"variant" === "B", 1L).otherwise(0L)).as("nb"))
      .select($"na", $"nb",
        floor((($"na" - $"nb") * ($"na" - $"nb")).cast("double")
          / ($"na" + $"nb") * 1000000 + 0.5).cast("long").as("chi2_e6"),
        when(($"na" - $"nb") * ($"na" - $"nb") * 1000000L >
          lit(3841459L) * ($"na" + $"nb"), lit(1L)).otherwise(lit(0L))
          .as("srm_flag"))
  }

  /** q215 oracle: identical integer flag and float chain. */
  val q215Sql: String =
    """WITH u AS (
      |  SELECT DISTINCT user_id,
      |    CASE WHEN CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 2 = 0
      |         THEN 'A' ELSE 'B' END AS variant
      |  FROM events),
      |v AS (SELECT
      |  CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |  CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM u)
      |SELECT na, nb,
      |  CAST(floor(CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb)
      |       * 1000000 + 0.5) AS BIGINT) AS chi2_e6,
      |  CAST(CASE WHEN (na - nb) * (na - nb) * 1000000
      |            > 3841459 * (na + nb) THEN 1 ELSE 0 END AS BIGINT)
      |    AS srm_flag
      |FROM v""".stripMargin

  // ---------------------------------------------------------------- q222

  /** q222_bot_score — automation/bot detection by inter-arrival
    * regularity (the traffic-quality gate every event pipeline runs
    * before analytics or training ever see the stream): per user, the
    * squared coefficient of variation of inter-event gaps. Humans are
    * bursty (cv² ≈ 1 for Poisson arrivals, higher for sessions); a
    * scripted client on a timer is metronomic (cv² → 0). Users with
    * ≥ 5 gaps and cv² < 0.3 flag as suspected bots.
    *
    * Exactness: cv² = (n·ΣΔ² − (ΣΔ)²) / (ΣΔ)² over INTEGER second
    * gaps — both sums are exact BIGINT folds (gaps ≤ ~10⁷ s, n ≤ 10³ ⇒
    * n·ΣΔ² ≤ 10¹⁷ < 2⁶³), so the only float op is the final division,
    * floored onto e6. No stddev_pop aggregate whose summation order
    * could wobble across engines.
    *
    * Scale shape: one user-keyed window for the lag, one user-keyed
    * fold — a single exchange on user_id; the flag arithmetic runs on
    * |users| rows. */
  def q222BotScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gaps = Tables.events(s, dir)
      .select($"user_id", (unix_millis($"ts") / lit(1000L)).cast("long").as("sec"),
        $"event_id")
      .withColumn("gap", $"sec" - lag($"sec", 1).over(
        Window.partitionBy($"user_id").orderBy($"sec", $"event_id")))
      .filter($"gap".isNotNull)
    gaps.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"gap").as("s"),
        sum($"gap" * $"gap").as("ss"))
      .filter($"n" >= 5 && $"s" > 0)
      .select($"user_id", $"n",
        floor(($"n" * $"ss" - $"s" * $"s").cast("double")
          / ($"s" * $"s") * 1000000 + 0.5).cast("long").as("cv2_e6"),
        when(($"n" * $"ss" - $"s" * $"s") * lit(10L)
          < $"s" * $"s" * lit(3L), lit(1L)).otherwise(lit(0L)).as("bot_flag"))
      .orderBy($"user_id")
  }

  /** q222 oracle: identical integer folds; the bot flag is the exact
    * integer cross-multiplication (cv²·10 < 3), not a float compare. */
  val q222Sql: String =
    """WITH e0 AS (
      |  SELECT user_id, epoch_ms(ts) // 1000 AS sec, event_id FROM events),
      |g0 AS (
      |  SELECT user_id, sec,
      |    sec - lag(sec) OVER
      |      (PARTITION BY user_id ORDER BY sec, event_id) AS gap
      |  FROM e0),
      |f AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(gap) AS BIGINT) AS s,
      |         CAST(sum(gap * gap) AS BIGINT) AS ss
      |  FROM g0 WHERE gap IS NOT NULL GROUP BY 1)
      |SELECT user_id, n,
      |  CAST(floor(CAST(n * ss - s * s AS DOUBLE) / (s * s) * 1000000 + 0.5)
      |       AS BIGINT) AS cv2_e6,
      |  CAST(CASE WHEN (n * ss - s * s) * 10 < s * s * 3 THEN 1 ELSE 0 END
      |       AS BIGINT) AS bot_flag
      |FROM f WHERE n >= 5 AND s > 0
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q228

  /** q228_holt — Holt double-exponential smoothing (level + trend,
    * α = β = ½) over the per-type daily series, with a 7-day-ahead
    * forecast: the capacity-planning / demand-forecast operator one
    * notch above q94's EWMA (which has no trend term and lags every
    * ramp). The recurrence
    *   l_t = (x_t + l_{t-1} + b_{t-1}) / 2,
    *   b_t = (l_t − l_{t-1} + b_{t-1}) / 2
    * is inherently sequential, so it runs as ONE ordered fold per
    * series (the q154/q184 Lindley discipline) — never an iterative
    * join chain.
    *
    * Exactness: values live on the e1 integer grid; the fold state
    * (level, trend) is bit-packed into one BIGINT
    * ((l + 2²¹)·2²² + (b + 2²¹), bounds documented: |l|,|b| < 2²¹ at
    * every SF including ×100), and each halving is floor(x / 2.0) — a
    * power-of-two double division, exact, with FLOOR semantics on
    * negatives where integer `div` vs `//` would diverge. Both engines
    * fold the LITERAL same arithmetic.
    *
    * Scale shape: one map-side fold to |types|·|days| cells, one
    * |types|-way ordered fold over calendar-bounded lists. Corpus size
    * only touches the first fold. */
  def q228Holt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val step = holtStep("div")
    val daily = Tables.events(s, dir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
          .cast("long").as("day"))
      .agg((count(lit(1)) * 10).as("x10"))
    daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        expr(s"aggregate(array_sort(collect_list(struct(day, x10))), " +
          s"CAST(-1 AS BIGINT), (acc, e) -> $step) ").as("enc"))
      .select($"event_type", $"n_days",
        (expr("enc div 4194304") - 2097152).as("level_e1"),
        ($"enc" % 4194304 - 2097152).as("trend_e1"))
      .withColumn("forecast7_e1", $"level_e1" + $"trend_e1" * 7)
      .orderBy($"event_type")
  }

  /** The shared Holt fold body — `divOp` is the only engine-specific
    * token (`div` in Spark, `//` in DuckDB); every other character of
    * the recurrence is identical in both engines. `e.x10` addresses the
    * struct field carrying the day's value. */
  private def holtStep(divOp: String): String = {
    val L = s"(acc $divOp 4194304 - 2097152)"
    val B = s"(acc % 4194304 - 2097152)"
    val lt = s"CAST(floor(CAST(e.x10 + $L + $B AS DOUBLE) / 2) AS BIGINT)"
    val bt = s"CAST(floor(CAST($lt - $L + $B AS DOUBLE) / 2) AS BIGINT)"
    s"CASE WHEN acc < 0 THEN (e.x10 + 2097152) * 4194304 + 2097152 " +
      s"ELSE ($lt + 2097152) * 4194304 + ($bt + 2097152) END"
  }

  /** q228 oracle: the identical fold via list_reduce (seed injected by
    * list_prepend, the q154 pattern), `//` for the decode division. */
  val q228Sql: String = {
    val step = holtStep("//").replace("e.x10", "e")
    s"""WITH daily AS (
       |  SELECT event_type,
       |         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
       |         CAST(count(*) * 10 AS BIGINT) AS x10
       |  FROM events GROUP BY 1, 2),
       |f AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |    list_reduce(list_prepend(CAST(-1 AS BIGINT),
       |        list(x10 ORDER BY day)),
       |      (acc, e) -> $step) AS enc
       |  FROM daily GROUP BY 1)
       |SELECT event_type, n_days,
       |  enc // 4194304 - 2097152 AS level_e1,
       |  enc % 4194304 - 2097152 AS trend_e1,
       |  (enc // 4194304 - 2097152) + (enc % 4194304 - 2097152) * 7
       |    AS forecast7_e1
       |FROM f ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------- q230

  /** q230_streaks — gaps-and-islands streak detection (the engagement
    * metric behind every "N-day streak" product surface, and the
    * canonical SQL islands idiom): per user, contiguous runs of active
    * days found by the day − dense_rank(day) constant-key trick — each
    * island of consecutive days shares one group key, with NO self-join
    * and NO iteration. Reported: longest streak, number of islands,
    * and total active days.
    *
    * Scale shape: one map-side distinct to (user, day), one user-keyed
    * window + fold — a single exchange on user_id; islands never
    * materialize as pairs. The 100 TB contract: everything after the
    * distinct is |users|·|active days|-sized. */
  def q230Streaks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val days = Tables.events(s, dir)
      .select($"user_id",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
          .cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    val isl = days.withColumn("grp", $"day" - dense_rank().over(w))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"))
    isl.groupBy($"user_id")
      .agg(max($"len").as("longest_streak"),
        count(lit(1)).as("n_islands"), sum($"len").as("active_days"))
      .orderBy($"user_id")
  }

  /** q230 oracle: the identical islands construction. */
  val q230Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day
      |  FROM events),
      |isl AS (
      |  SELECT user_id,
      |    day - dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS grp,
      |    day
      |  FROM days),
      |runs AS (
      |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
      |  CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(sum(len) AS BIGINT) AS active_days
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q236

  /** q236_json_robust — corrupt-record-tolerant JSON ingestion (the
    * malformed-payload reality of every wire feed): the props column
    * is parsed under a declared schema with PERMISSIVE semantics —
    * malformed documents yield NULL, never a failed job — and the gate
    * accounts for every row: parsed counts, corrupt counts, and the
    * sum over successfully-extracted values, per event type. Corruption
    * is PLANTED (event_id ≡ 0 mod 97 loses its closing brace — the
    * q218/q219 known-ground-truth discipline), so the tolerant path's
    * recall is provable, not assumed.
    *
    * Cross-engine contract: Spark's `from_json` PERMISSIVE mode nulls
    * the struct on malformed input; the oracle replays that as
    * json_valid() gating TRY_CAST extraction — the gate proves the two
    * strictness models agree row-for-row on this corpus.
    *
    * Scale shape: one narrow parse pass folding map-side to |types|
    * rows. At 100 TB: scan-bound; the corrupt rows cost one failed
    * parse each, not a dead-letter detour. */
  def q236JsonRobust(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = Tables.events(s, dir).select($"event_type",
      when($"event_id" % 97 === 0,
        $"props".substr(lit(1), length($"props") - 1))
        .otherwise($"props").as("p"))
    val parsed = planted.select($"event_type",
      from_json($"p", "k BIGINT", Map("mode" -> "PERMISSIVE")).getField("k")
        .as("k"))
    parsed.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"k".isNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum($"k").as("sum_k"))
      .orderBy($"event_type")
  }

  /** q236 oracle: json_valid-gated extraction — the PERMISSIVE
    * equivalence stated row-for-row. */
  val q236Sql: String =
    """WITH planted AS (
      |  SELECT event_type,
      |    CASE WHEN event_id % 97 = 0
      |         THEN substr(props, 1, len(props) - 1) ELSE props END AS p
      |  FROM events),
      |parsed AS (
      |  SELECT event_type,
      |    CASE WHEN json_valid(p)
      |         THEN TRY_CAST(json_extract_string(p, '$.k') AS BIGINT)
      |         END AS k
      |  FROM planted)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_corrupt,
      |  CAST(sum(k) AS BIGINT) AS sum_k
      |FROM parsed GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q238

  /** q238_markov_conversion — first-order Markov conversion model (the
    * chain-based attribution readout of Anderl et al. 2014's framework,
    * the step past q205's rule-based models): per-user journeys truncate
    * at the first purchase (absorbing CONV state; journeys that never
    * convert absorb at END), transitions count into a |states|² matrix,
    * and the probability of converting within 6 steps from every state
    * comes from 6 synchronous power-iteration rounds of the absorbing
    * chain — `p_{k+1}(s) = Σ_t cnt(s,t)·p_k(t) div tot(s)` on the e6
    * integer grid, exact floor arithmetic both engines replay
    * bit-for-bit.
    *
    * Scale shape: the corpus collapses in ONE user-partitioned pass
    * (two windows on the same partitioning + one fold) to a transition
    * matrix of at most (|event types|+1)² rows; the 6 chain rounds run
    * on that O(1) relation — corpus-size-independent, the q184/q197
    * "fold before you iterate" discipline applied to journey algebra. */
  def q238MarkovConversion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"user_id".as("u"),
      unix_millis($"ts").as("ms"), $"event_id",
      when($"event_type" === "purchase", lit("CONV"))
        .otherwise($"event_type").as("st"))
    val w = Window.partitionBy($"u").orderBy($"ms", $"event_id")
    val rn = ev.withColumn("rn", row_number().over(w))
    val cut = rn.groupBy($"u")
      .agg(min(when($"st" === "CONV", $"rn")).as("cut"))
    val kept = rn.join(cut, "u").filter($"cut".isNull || $"rn" <= $"cut")
    val w2 = Window.partitionBy($"u").orderBy($"rn")
    val steps = kept
      .withColumn("src", coalesce(lag($"st", 1).over(w2), lit("START")))
      .withColumn("mx", max($"rn").over(Window.partitionBy($"u")))
    // one pass over `steps` (r20, q139's union-duplication reasoning: the
    // union form re-evaluated the two-window chain once per branch): every
    // row emits its transition, and a journey's last non-converting row
    // additionally emits the absorbing END hop — a conditional explode
    val hop = struct($"src", $"st".as("dst"))
    val endHop = struct($"st".as("src"), lit("END").as("dst"))
    val tr = steps.select(explode(
        when($"rn" === $"mx" && $"st" =!= "CONV", array(hop, endHop))
          .otherwise(array(hop))).as("e"))
      .select($"e.src", $"e.dst")
    val cnt = tr.groupBy($"src", $"dst").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy($"src").agg(sum($"c").as("t"))
    def absorbing = Seq(("CONV", 1000000L), ("END", 0L))
      .toDF("state", "p")
    var p = tot.select($"src".as("state"), lit(0L).as("p"))
      .unionByName(absorbing)
    for (_ <- 1 to 6) {
      p = cnt.join(p, cnt("dst") === p("state"))
        .groupBy($"src").agg(sum($"c" * $"p").as("m"))
        .join(tot, "src")
        .select($"src".as("state"), expr("m div t").as("p"))
        .unionByName(absorbing)
    }
    p.select($"state", $"p".as("p_conv_e6")).orderBy($"state")
  }

  /** q238 oracle: journeys, the transition fold, and the six chain
    * rounds unrolled as CTEs — identical truncation rule, absorbing
    * states, and e6 floor arithmetic. */
  val q238Sql: String = {
    val step = (i: Int, prev: String) =>
      s"""p$i AS (
         |  SELECT c.src AS state,
         |    CAST(sum(c.c * p.p) // max(t.t) AS BIGINT) AS p
         |  FROM cnt c JOIN $prev p ON c.dst = p.state
         |  JOIN tot t ON t.src = c.src
         |  GROUP BY c.src
         |  UNION ALL SELECT 'CONV', 1000000 UNION ALL SELECT 'END', 0)"""
        .stripMargin
    s"""WITH ev AS (
       |  SELECT user_id AS u, epoch_ms(ts) AS ms, event_id,
       |    CASE WHEN event_type = 'purchase' THEN 'CONV'
       |         ELSE event_type END AS st
       |  FROM events),
       |rn AS (
       |  SELECT u, st,
       |    row_number() OVER (PARTITION BY u ORDER BY ms, event_id) AS rn
       |  FROM ev),
       |cut AS (
       |  SELECT u, min(CASE WHEN st = 'CONV' THEN rn END) AS cut
       |  FROM rn GROUP BY u),
       |kept AS (
       |  SELECT rn.u, rn.st, rn.rn,
       |    max(rn.rn) OVER (PARTITION BY rn.u) AS mx
       |  FROM rn JOIN cut ON rn.u = cut.u
       |  WHERE cut.cut IS NULL OR rn.rn <= cut.cut),
       |steps AS (
       |  SELECT coalesce(
       |      lag(st, 1) OVER (PARTITION BY u ORDER BY rn), 'START') AS src,
       |    st AS dst, rn, mx, st
       |  FROM kept),
       |tr AS (
       |  SELECT src, dst FROM steps
       |  UNION ALL
       |  SELECT st AS src, 'END' AS dst FROM steps
       |  WHERE rn = mx AND st <> 'CONV'),
       |cnt AS (SELECT src, dst, count(*) AS c FROM tr GROUP BY 1, 2),
       |tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
       |p0 AS (
       |  SELECT src AS state, CAST(0 AS BIGINT) AS p FROM tot
       |  UNION ALL SELECT 'CONV', 1000000 UNION ALL SELECT 'END', 0),
       |${step(1, "p0")},
       |${step(2, "p1")},
       |${step(3, "p2")},
       |${step(4, "p3")},
       |${step(5, "p4")},
       |${step(6, "p5")}
       |SELECT state, p AS p_conv_e6 FROM p6 ORDER BY state""".stripMargin
  }

  // ---------------------------------------------------------------- q239

  /** q239_ips_eval — offline (counterfactual) policy evaluation by
    * inverse propensity scoring over the logged event stream (the
    * Horvitz–Thompson estimator; Li et al. WSDM'11's replay setting):
    * context = user decile, logged action = event type, reward =
    * value ≥ 10, behavior propensities are the empirical action
    * frequencies per context, and the TARGET policy (even deciles →
    * click, odd → view) is evaluated without ever deploying it —
    * IPS = Σ_{a=π(x)} r·(n_x/n_xa) / n_x and the self-normalized
    * SNIPS variant, both on the e6 floor grid so the distributed fold
    * and DuckDB agree exactly. The estimator every recsys/RLHF data
    * pipeline runs before an online test.
    *
    * Scale shape: ONE (context, action) fold produces the propensity
    * and reward tables (≤ |deciles|·|types| rows); everything after is
    * algebra on that O(1) relation. A 100 TB log is one map-side
    * partial aggregation. */
  def q239IpsEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select(($"user_id" % 10).as("x"),
      $"event_type".as("a"),
      when($"value" >= 10.0, 1L).otherwise(0L).as("r"))
    val nxa = ev.groupBy($"x", $"a")
      .agg(count(lit(1)).as("n_xa"), sum($"r").as("r_xa"))
    val nx = nxa.groupBy($"x").agg(sum($"n_xa").as("n_x"))
    val m = nxa.join(nx, "x")
      .filter($"a" === when($"x" % 2 === 0, "click").otherwise("view"))
      .select($"x", $"n_x", $"n_xa", $"r_xa",
        expr("(1000000 * n_x) div n_xa").as("w_e6"))
    val per = m.select($"x", $"n_x", $"n_xa",
      expr("(r_xa * w_e6) div n_x").as("ips_e6"),
      expr("(r_xa * 1000000) div n_xa").as("snips_e6"))
    val overall = m.agg(sum($"n_x").as("n_x"), sum($"n_xa").as("n_xa"),
        sum(expr("r_xa * w_e6")).as("sw"),
        sum(expr("n_xa * w_e6")).as("tw"))
      .select(lit(-1L).as("x"), $"n_x", $"n_xa",
        expr("sw div n_x").as("ips_e6"),
        expr("(sw * 1000000) div tw").as("snips_e6"))
    per.unionByName(overall).orderBy($"x")
  }

  /** q239 oracle: identical propensity fold, target-policy match, and
    * e6 floor estimators. */
  val q239Sql: String =
    """WITH ev AS (
      |  SELECT user_id % 10 AS x, event_type AS a,
      |    CASE WHEN value >= 10.0 THEN 1 ELSE 0 END AS r
      |  FROM events),
      |nxa AS (
      |  SELECT x, a, CAST(count(*) AS BIGINT) AS n_xa,
      |    CAST(sum(r) AS BIGINT) AS r_xa
      |  FROM ev GROUP BY 1, 2),
      |nx AS (SELECT x, CAST(sum(n_xa) AS BIGINT) AS n_x FROM nxa GROUP BY 1),
      |m AS (
      |  SELECT nxa.x, n_x, n_xa, r_xa,
      |    CAST((1000000 * n_x) // n_xa AS BIGINT) AS w_e6
      |  FROM nxa JOIN nx ON nxa.x = nx.x
      |  WHERE a = CASE WHEN nxa.x % 2 = 0 THEN 'click' ELSE 'view' END),
      |per AS (
      |  SELECT x, n_x, n_xa,
      |    CAST((r_xa * w_e6) // n_x AS BIGINT) AS ips_e6,
      |    CAST((r_xa * 1000000) // n_xa AS BIGINT) AS snips_e6
      |  FROM m),
      |overall AS (
      |  SELECT CAST(-1 AS BIGINT) AS x,
      |    CAST(sum(n_x) AS BIGINT) AS n_x, CAST(sum(n_xa) AS BIGINT) AS n_xa,
      |    CAST(CAST(sum(r_xa * w_e6) AS BIGINT) // CAST(sum(n_x) AS BIGINT)
      |         AS BIGINT) AS ips_e6,
      |    CAST((CAST(sum(r_xa * w_e6) AS BIGINT) * 1000000)
      |         // CAST(sum(n_xa * w_e6) AS BIGINT) AS BIGINT) AS snips_e6
      |  FROM m)
      |SELECT * FROM per UNION ALL SELECT * FROM overall ORDER BY x"""
      .stripMargin

  // ---------------------------------------------------------------- q241

  /** q241_ohlc_bars — OHLC candlestick bars (the market-data / metrics
    * downsampling primitive): per (event type, hour) the open (first
    * value by event time), high, low, close (last value), trade count,
    * and volume — first/last resolved by the total order (ts,
    * event_id), so the bars are deterministic under any shuffle. Values
    * ride the e2 grid.
    *
    * Engine form: ONE (type, hour)-partitioned sort serves the
    * row_number that marks open and close rows (count-over-partition
    * finds the close without a second descending sort); the bar itself
    * is one fold over the marked relation — one exchange total.
    *
    * Scale shape: bars are |types|·|hours| — output is calendar-
    * bounded; per-partition input is an hour of one type's events, the
    * natural parallel unit at any corpus size. */
  def q241OhlcBars(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"event_type".as("tp"),
      expr("unix_millis(ts) div 3600000").as("hr"),
      floor($"value" * 100 + 0.5).cast("long").as("v_e2"),
      unix_millis($"ts").as("ms"), $"event_id")
    val w = Window.partitionBy($"tp", $"hr").orderBy($"ms", $"event_id")
    ev.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"tp", $"hr")))
      .groupBy($"tp", $"hr")
      .agg(max(when($"rn" === 1, $"v_e2")).as("open_e2"),
        max($"v_e2").as("high_e2"), min($"v_e2").as("low_e2"),
        max(when($"rn" === $"n", $"v_e2")).as("close_e2"),
        count(lit(1)).as("n_trades"), sum($"v_e2").as("vol_e2"))
      .orderBy($"tp", $"hr")
  }

  /** q241 oracle: identical bar grid, total order, and folds. */
  val q241Sql: String =
    """WITH ev AS (
      |  SELECT event_type AS tp, epoch_ms(ts) // 3600000 AS hr,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_e2,
      |    epoch_ms(ts) AS ms, event_id
      |  FROM events),
      |m AS (
      |  SELECT tp, hr, v_e2,
      |    row_number() OVER (PARTITION BY tp, hr ORDER BY ms, event_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY tp, hr) AS n
      |  FROM ev)
      |SELECT tp, hr, max(CASE WHEN rn = 1 THEN v_e2 END) AS open_e2,
      |  max(v_e2) AS high_e2, min(v_e2) AS low_e2,
      |  max(CASE WHEN rn = n THEN v_e2 END) AS close_e2,
      |  CAST(count(*) AS BIGINT) AS n_trades,
      |  CAST(sum(v_e2) AS BIGINT) AS vol_e2
      |FROM m GROUP BY tp, hr ORDER BY tp, hr""".stripMargin

  // ---------------------------------------------------------------- q243

  /** q243_variant_shred — semi-structured shredding through Spark 4's
    * VARIANT type (the open-format answer to BigQuery's JSON type the
    * reference's sink tables would hold): each event's `props` JSON
    * plus its relational columns compose into a NESTED document
    * (object-in-object + array), `parse_json` binary-encodes it, and
    * typed `variant_get` paths ($.u, $.m.t, $.m.v, $.tags[1], $.k)
    * shred it back to columns that a rollup hash-matches against
    * DuckDB's json_extract on the same documents. What the gate pins:
    * path navigation, array indexing, and typed extraction survive the
    * VARIANT encode/decode round-trip losslessly.
    *
    * Scale shape: compose/parse/extract are row-local codegen'd
    * expressions (VARIANT's binary encoding exists precisely so 100 TB
    * scans don't re-parse JSON text per path); the fold is map-side to
    * |types| rows. Zero shuffles before the final fold. */
  def q243VariantShred(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"user_id", $"event_type",
      $"props", floor($"value" * 100 + 0.5).cast("long").as("v_e2"))
    val doc = ev.withColumn("j", concat(
      lit("{\"u\":"), $"user_id",
      lit(",\"m\":{\"t\":\""), $"event_type",
      lit("\",\"v\":"), $"v_e2",
      lit("},\"tags\":[\""), $"event_type", lit("\",\"x\"],\"k\":"),
      expr("variant_get(parse_json(props), '$.k', 'long')"), lit("}")))
    val sh = doc.select(
      expr("variant_get(parse_json(j), '$.u', 'long')").as("u"),
      expr("variant_get(parse_json(j), '$.m.t', 'string')").as("t"),
      expr("variant_get(parse_json(j), '$.m.v', 'long')").as("v_e2"),
      expr("variant_get(parse_json(j), '$.tags[1]', 'string')").as("tag1"),
      expr("variant_get(parse_json(j), '$.k', 'long')").as("k"))
    sh.groupBy($"t")
      .agg(count(lit(1)).as("n"), sum($"v_e2").as("sum_v_e2"),
        sum($"k").as("sum_k"), max($"tag1").as("tag1"),
        sum($"u").as("sum_u"))
      .orderBy($"t")
  }

  /** q243 oracle: the same documents composed as text, shredded with
    * DuckDB's JSON path functions. */
  val q243Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_e2,
      |    CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |  FROM events),
      |doc AS (
      |  SELECT '{"u":' || user_id || ',"m":{"t":"' || event_type ||
      |    '","v":' || v_e2 || '},"tags":["' || event_type ||
      |    '","x"],"k":' || k || '}' AS j
      |  FROM ev),
      |sh AS (
      |  SELECT CAST(json_extract(j, '$.u') AS BIGINT) AS u,
      |    json_extract_string(j, '$.m.t') AS t,
      |    CAST(json_extract(j, '$.m.v') AS BIGINT) AS v_e2,
      |    json_extract_string(j, '$.tags[1]') AS tag1,
      |    CAST(json_extract(j, '$.k') AS BIGINT) AS k
      |  FROM doc)
      |SELECT t, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(v_e2) AS BIGINT) AS sum_v_e2,
      |  CAST(sum(k) AS BIGINT) AS sum_k, max(tag1) AS tag1,
      |  CAST(sum(u) AS BIGINT) AS sum_u
      |FROM sh GROUP BY t ORDER BY t""".stripMargin

  // ---------------------------------------------------------------- q258

  /** q258_range_interval_frame — RANGE frames bounded by CALENDAR
    * INTERVALS (`RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT
    * ROW` over a DATE ordering): the trailing-week rolling metric as
    * SQL text, the conformance corner q51's millisecond rangeBetween
    * can't reach — interval arithmetic against date ordering is its
    * own semantics (month/day boundaries, not fixed ms spans), and
    * both engines must draw identical frame edges for the hash to
    * meet. Window AND count run on the calendar-bounded daily table.
    *
    * Scale shape: the corpus folds map-side to |types|·|days| cells
    * before the window — the q184/q197 time-series discipline. */
  def q258RangeIntervalFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type".as("tp"), to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
      .createOrReplaceTempView("daily_q258")
    s.sql(
      """SELECT tp, CAST(day AS STRING) AS day, n,
        |  sum(n) OVER w AS n_7d,
        |  count(*) OVER w AS d_7d
        |FROM daily_q258
        |WINDOW w AS (PARTITION BY tp ORDER BY day
        |  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY tp, day""".stripMargin)
  }

  /** q258 oracle: the identical interval-bounded frame in DuckDB. */
  val q258Sql: String =
    """WITH daily AS (
      |  SELECT event_type AS tp, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT tp, CAST(day AS VARCHAR) AS day, n,
      |  CAST(sum(n) OVER w AS BIGINT) AS n_7d,
      |  CAST(count(*) OVER w AS BIGINT) AS d_7d
      |FROM daily
      |WINDOW w AS (PARTITION BY tp ORDER BY day
      |  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
      |ORDER BY tp, day""".stripMargin

  // ---------------------------------------------------------------- q262

  /** q262_asof_ttl — point-in-time lookup with a STALENESS BOUND (the
    * feature-store contract: "the feature value as of T, but only if
    * refreshed within the last 2 hours" — an unboundedly old value is
    * worse than none for training-serving parity): q44's single-shuffle
    * carry-forward AS-OF composition, with matches older than the TTL
    * nulled AFTER the carry — the carry itself must stay unbounded or
    * a fresh-enough click hiding behind a stale one would be missed
    * (there is none by construction: the carried click is the LATEST
    * ≤ T, so TTL-filtering after the carry is exact, not approximate).
    *
    * Scale shape: identical to q44 — ONE user-keyed exchange, linear
    * carry state; the TTL is a row-local predicate. */
  def q262AsofTtl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ttlMs = 7200000L
    val ev = Tables.events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", unix_millis($"ts").as("ms"), $"event_id")
      .groupBy($"user_id", $"ms").agg(max($"event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_millis($"ts").as("ms"),
        $"event_id".as("purchase_id"), $"value")
    val tagged = clicks.select($"user_id", $"ms", lit(0).as("side"),
        $"click_id", lit(null).cast("long").as("purchase_id"),
        lit(null).cast("double").as("value"))
      .unionByName(purchases.select($"user_id", $"ms", lit(1).as("side"),
        lit(null).cast("long").as("click_id"), $"purchase_id", $"value"))
    val carry = Window.partitionBy($"user_id").orderBy($"ms", $"side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("cid", last($"click_id", ignoreNulls = true).over(carry))
      .withColumn("cms",
        last(when($"click_id".isNotNull, $"ms"), ignoreNulls = true)
          .over(carry))
      .filter($"side" === 1)
      .withColumn("fresh", $"cms".isNotNull && $"ms" - $"cms" <= ttlMs)
      .select($"purchase_id", $"user_id", $"ms".as("purchase_ms"),
        when($"fresh", $"cid").as("click_id"),
        when($"fresh", $"cms").as("click_ms"),
        when($"fresh", $"ms" - $"cms").as("staleness_ms"), $"value")
      .orderBy($"purchase_id")
  }

  /** q262 oracle: DuckDB's native ASOF LEFT JOIN with the TTL applied
    * to the matched row. */
  val q262Sql: String =
    """WITH clicks AS (
      |  SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_ms(ts)),
      |purchases AS (
      |  SELECT user_id, epoch_ms(ts) AS ms, event_id AS purchase_id, value
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.purchase_id, p.user_id, p.ms AS purchase_ms,
      |    c.click_id, c.ms AS click_ms, p.value
      |  FROM purchases p ASOF LEFT JOIN clicks c
      |    ON p.user_id = c.user_id AND c.ms <= p.ms)
      |SELECT purchase_id, user_id, purchase_ms,
      |  CASE WHEN purchase_ms - click_ms <= 7200000 THEN click_id END
      |    AS click_id,
      |  CASE WHEN purchase_ms - click_ms <= 7200000 THEN click_ms END
      |    AS click_ms,
      |  CASE WHEN purchase_ms - click_ms <= 7200000
      |       THEN purchase_ms - click_ms END AS staleness_ms,
      |  value
      |FROM j ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------------------- q263

  /** q263_interval_coverage — merge overlapping intervals into coverage
    * spans (the classic islands-over-ranges problem: ad viewability,
    * machine uptime, incident windows — q191's day-grid concurrency
    * can't answer "how much time was covered at all" when intervals
    * overlap arbitrarily): per user, sessions [ms, ms + 1–30 min)
    * merge wherever they touch, via the cumulative-max-of-end rule —
    * a span breaks exactly where a start clears every previous end.
    * Output per user: span count, covered ms, longest span.
    *
    * Scale shape: TWO windows + two folds, all on ONE user_id
    * partitioning (running max-of-end, then the island prefix sum);
    * per-partition state is a scalar. Never an interval self-join —
    * the naive overlap join is quadratic per user. */
  def q263IntervalCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iv = Tables.events(s, dir).select($"user_id",
      unix_millis($"ts").as("st"),
      (unix_millis($"ts") + ($"event_id" % 30 + 1) * 60000L).as("en"),
      $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"st", $"event_id")
    val prevMax = max($"en").over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val marked = iv
      .withColumn("brk", when(prevMax.isNull || $"st" > prevMax, 1L)
        .otherwise(0L))
      .withColumn("island",
        sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy($"user_id", $"island")
      .agg(min($"st").as("s0"), max($"en").as("e1"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_spans"),
        sum($"e1" - $"s0").as("covered_ms"),
        max($"e1" - $"s0").as("max_span_ms"))
      .orderBy($"user_id")
  }

  /** q263 oracle: identical cumulative-max island rule. */
  val q263Sql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_ms(ts) AS st,
      |    epoch_ms(ts) + (event_id % 30 + 1) * 60000 AS en, event_id
      |  FROM events),
      |m AS (
      |  SELECT user_id, st, en, event_id,
      |    CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |         OR st > max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS brk
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, st, en,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY st, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM m),
      |spans AS (
      |  SELECT user_id, island, min(st) AS s0, max(en) AS e1
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_spans,
      |  CAST(sum(e1 - s0) AS BIGINT) AS covered_ms,
      |  CAST(max(e1 - s0) AS BIGINT) AS max_span_ms
      |FROM spans GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q264

  /** q264_iso_week — ISO-8601 week calendar conformance (the corner
    * q160's civil-calendar sweep leaves open: early-January days can
    * belong to the PREVIOUS iso-year's week 52/53, late-December days
    * to the NEXT year's week 1 — off-by-one-week bugs in weekly
    * reporting live exactly here): weekly order rollups keyed by
    * (iso_year, iso_week), with the iso-year derived by the Thursday
    * rule (the year of the week's Thursday) spelled identically in
    * both engines, and the week number from each engine's NATIVE ISO
    * week function — so a drift in either native implementation
    * breaks the hash.
    *
    * Scale shape: one map-side fold to |weeks| rows. */
  def q264IsoWeek(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.orders(s, dir).select(to_date($"o_orderdate").as("day"),
      floor($"o_totalprice" * 100 + 0.5).cast("long").as("p_e2"))
    // Thursday rule: ISO year = calendar year of this week's Thursday;
    // Monday-based dow via (dayofweek + 5) % 7 (Mon=0 … Sun=6)
    val thu = date_add($"day", (lit(3) - (dayofweek($"day") + 5) % 7)
      .cast("int"))
    d.select($"day", $"p_e2", year(thu).as("iso_year"),
        weekofyear($"day").cast("long").as("iso_week"))
      .groupBy($"iso_year", $"iso_week")
      .agg(count(lit(1)).as("n"), sum($"p_e2").as("sum_e2"),
        min($"day").cast("string").as("first_day"),
        max($"day").cast("string").as("last_day"))
      .orderBy($"iso_year", $"iso_week")
  }

  /** q264 oracle: DuckDB's native ISO week + the same Thursday rule. */
  val q264Sql: String =
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS p_e2
      |  FROM orders),
      |k AS (
      |  SELECT day, p_e2,
      |    CAST(year(day + INTERVAL (3 - CAST(isodow(day) - 1 AS INTEGER)) DAY)
      |         AS BIGINT) AS iso_year,
      |    CAST(weekofyear(day) AS BIGINT) AS iso_week
      |  FROM d)
      |SELECT iso_year, iso_week, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(p_e2) AS BIGINT) AS sum_e2,
      |  CAST(min(day) AS VARCHAR) AS first_day,
      |  CAST(max(day) AS VARCHAR) AS last_day
      |FROM k GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q263_interval_coverage" -> (q263IntervalCoverage _),
    "q264_iso_week" -> (q264IsoWeek _),
    "q262_asof_ttl" -> (q262AsofTtl _),
    "q258_range_interval_frame" -> (q258RangeIntervalFrame _),
    "q238_markov_conversion" -> (q238MarkovConversion _),
    "q239_ips_eval" -> (q239IpsEval _),
    "q241_ohlc_bars" -> (q241OhlcBars _),
    "q243_variant_shred" -> (q243VariantShred _),
    "q236_json_robust" -> (q236JsonRobust _),
    "q230_streaks" -> (q230Streaks _),
    "q228_holt" -> (q228Holt _),
    "q222_bot_score" -> (q222BotScore _),
    "q215_srm" -> (q215Srm _),
    "q204_relative_risk" -> (q204RelativeRisk _),
    "q205_attribution_models" -> (q205AttributionModels _),
    "q202_interpolate" -> (q202Interpolate _),
    "q197_changepoint" -> (q197Changepoint _),
    "q198_seasonal_profile" -> (q198SeasonalProfile _),
    "q195_cohort_ltv" -> (q195CohortLtv _),
    "q184_cusum" -> (q184Cusum _),
    "q185_acf" -> (q185Acf _),
    "q180_survival" -> (q180Survival _),
    "q177_rolling_actives" -> (q177RollingActives _),
    "q154_clamped_balance" -> (q154ClampedBalance _),
    "q153_attribution" -> (q153Attribution _),
    "q149_time_to_convert" -> (q149TimeToConvert _),
    "q148_cuped" -> (q148Cuped _),
    "q146_group_trend" -> (q146GroupTrend _),
    "q140_gap_fill" -> (q140GapFill _),
    "q138_scd2_join" -> (q138Scd2Join _),
    "q133_rate_anomaly" -> (q133RateAnomaly _),
    "q113_grouped_topk" -> (q113GroupedTopK _),
    "q101_salted_join" -> (q101SaltedJoin _),
    "q97_range_bin_join" -> (q97RangeBinJoin _),
    "q98_equidepth_hist" -> (q98EquidepthHist _),
    "q93_outliers" -> (q93Outliers _),
    "q94_ewma_trend" -> (q94EwmaTrend _),
    "q82_event_paths" -> (q82EventPaths _),
    "q83_cohort_retention" -> (q83CohortRetention _),
    "q44_asof_join"  -> (q44AsofJoin _),
    "cdc_unwrap"     -> (cdcUnwrap _),
    "cdc_conform"    -> (cdcConform _),
    "q14_events_json" -> (q14EventsJson _),
    "q15_time_window" -> (q15TimeWindow _),
    "q16_cdc_latest" -> (q16CdcLatest _),
    "q20_sessionize" -> (q20Sessionize _),
    "q39_percentile" -> (q39Percentile _),
    "q45_approx_stats" -> (q45ApproxStats _),
    "q76_funnel" -> (q76Funnel _),
    "q46_interval_join" -> (q46IntervalJoin _),
    "q56_outer_interval_join" -> (q56OuterIntervalJoin _),
    "q48_sliding_window" -> (q48SlidingWindow _),
    "q49_pivot" -> (q49Pivot _),
    "q50_stats_agg" -> (q50StatsAgg _),
    "q51_range_frame" -> (q51RangeFrame _),
  )

  val oracles: Map[String, String] = Map(
    "q263_interval_coverage" -> q263Sql,
    "q264_iso_week" -> q264Sql,
    "q262_asof_ttl" -> q262Sql,
    "q258_range_interval_frame" -> q258Sql,
    "q238_markov_conversion" -> q238Sql,
    "q239_ips_eval" -> q239Sql,
    "q241_ohlc_bars" -> q241Sql,
    "q243_variant_shred" -> q243Sql,
    "q236_json_robust" -> q236Sql,
    "q230_streaks" -> q230Sql,
    "q228_holt" -> q228Sql,
    "q222_bot_score" -> q222Sql,
    "q215_srm" -> q215Sql,
    "q204_relative_risk" -> q204Sql,
    "q205_attribution_models" -> q205Sql,
    "q202_interpolate" -> q202Sql,
    "q197_changepoint" -> q197Sql,
    "q198_seasonal_profile" -> q198Sql,
    "q195_cohort_ltv" -> q195Sql,
    "q184_cusum" -> q184Sql,
    "q185_acf" -> q185Sql,
    "q180_survival" -> q180Sql,
    "q177_rolling_actives" -> q177Sql,
    "q154_clamped_balance" -> q154Sql,
    "q153_attribution" -> q153Sql,
    "q149_time_to_convert" -> q149Sql,
    "q148_cuped" -> q148Sql,
    "q146_group_trend" -> q146Sql,
    "q140_gap_fill" -> q140Sql,
    "q138_scd2_join" -> q138Sql,
    "q133_rate_anomaly" -> q133Sql,
    "q113_grouped_topk" -> q113Sql,
    "q101_salted_join" -> q101Sql,
    "q97_range_bin_join" -> q97Sql,
    "q98_equidepth_hist" -> q98Sql,
    "q93_outliers" -> q93Sql,
    "q94_ewma_trend" -> q94Sql,
    "q82_event_paths" -> q82Sql,
    "q83_cohort_retention" -> q83Sql,
    "q44_asof_join"  -> q44Sql,
    "cdc_unwrap"     -> cdcUnwrapSql,
    "cdc_conform"    -> cdcConformSql,
    "q14_events_json" -> q14Sql,
    "q15_time_window" -> q15Sql,
    "q16_cdc_latest" -> q16Sql,
    "q20_sessionize" -> q20Sql,
    "q39_percentile" -> q39Sql,
    // q45: the raw sketch estimates are implementation-specific (never
    // hash-matchable), so the gated projection is exact stats + the
    // accuracy contract as BIGINT verdicts; see q45ApproxStats's scaladoc
    "q45_approx_stats" -> q45Sql,
    "q76_funnel" -> q76Sql,
    "q46_interval_join" -> q46Sql,
    "q56_outer_interval_join" -> q56Sql,
    "q48_sliding_window" -> q48Sql,
    "q49_pivot" -> q49Sql,
    "q50_stats_agg" -> q50Sql,
    "q51_range_frame" -> q51Sql,
  )
}
