package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

/** Streaming event-time operators: the STREAMING result must equal the
  * BATCH result of the same function over the same data — the operators are
  * mode-agnostic by design, so the batch run is the executable oracle. */
class EventStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Run `f` over the events table as a file STREAM (AvailableNow).
    * In append mode a window only emits once the WATERMARK passes its end,
    * and the watermark stops at the max seen event time — so the tail
    * window(s) would stay open forever. A far-future sentinel event is
    * appended as a SECOND micro-batch (maxFilesPerTrigger=1; watermark
    * advances between batches) to flush every real window, then filtered
    * back out of the result. */
  private val FlushSentinel =
    Seq("""{"event_id":-1,"ts":"2099-01-01T00:00:00.000Z","user_id":-1,"event_type":"__flush","value":0.0,"props":"{}"}""")

  private def streamed(f: DataFrame => DataFrame,
                       dropSentinel: DataFrame => DataFrame,
                       sentinels: Seq[String] = FlushSentinel): DataFrame = {
    val root = tmpDir("evstream")
    val ev = Tables.events(spark, sf)
    ev.select(to_json(struct(ev.columns.map(col): _*)).as("value"))
      .coalesce(1).write.mode("append").text(s"$root/src/b1")
    Thread.sleep(1100) // file source orders batches by modification time
    val s = spark
    import s.implicits._
    sentinels.toDF("value").coalesce(1).write.mode("append").text(s"$root/src/b2")
    // maxFilesPerTrigger is a file-SOURCE option: on writeStream it is
    // silently ignored, all mtime-pinned waves collapse into ONE
    // AvailableNow batch, and the cross-batch state-merge path these
    // tests exist to pin is never exercised
    val src = spark.readStream.schema("value STRING")
      .option("maxFilesPerTrigger", "1").text(s"$root/src/*")
      .select(from_json(col("value"), ev.schema).as("e")).select("e.*")
    val q = f(src).writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    dropSentinel(spark.read.parquet(s"$root/out"))
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("watermarked hourly window agg: stream ≡ batch (q15 twin)") {
    // watermark far beyond the data's time span -> no row is late; every
    // window finalizes when the AvailableNow stream drains
    val streamRes = streamed(EventStream.hourlyStats(_, watermarkDelay = "0 seconds"),
      _.filter(col("event_type") =!= "__flush"))
    val batchRes = EventStream.hourlyStats(Tables.events(spark, sf))
    assert(canon(streamRes) === canon(batchRes))
    assert(streamRes.count() > 0)
  }

  test("hopping 1h/15min window agg: stream ≡ batch (q48 twin)") {
    val streamRes = streamed(EventStream.slidingStats(_, watermarkDelay = "0 seconds"),
      _.filter(col("event_type") =!= "__flush"))
    val batchRes = EventStream.slidingStats(Tables.events(spark, sf))
    assert(canon(streamRes) === canon(batchRes))
    // each event is in exactly window/slide = 4 windows: total n is 4x rows
    val s = spark
    import s.implicits._
    val totalN = batchRes.agg(sum($"n")).collect()(0).getLong(0)
    assert(totalN === 4L * Tables.events(spark, sf).count())
  }

  test("session_window gap sessions: stream ≡ batch (q20 twin)") {
    val streamRes = streamed(EventStream.gapSessions(_, watermarkDelay = "0 seconds"),
      _.filter(col("user_id") =!= -1L))
    val batchRes = EventStream.gapSessions(Tables.events(spark, sf))
    assert(canon(streamRes) === canon(batchRes))
    assert(streamRes.count() > 0)
  }

  test("session_window agrees with the window-function formulation (q20) on counts") {
    val s = spark
    import s.implicits._
    val native = EventStream.gapSessions(Tables.events(spark, sf))
    val q20 = graft.queries.EventQueries.q20Sessionize(spark, sf)
    // same number of sessions and same total events per user
    val a = native.groupBy($"user_id").agg(count(lit(1)).as("n_sessions"),
      sum($"n_events").as("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = q20.groupBy($"user_id").agg(count(lit(1)).as("n_sessions"),
      sum($"n_events").as("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("stream-stream interval join: stream ≡ batch (purchases x preceding clicks)") {
    val streamRes = streamed(EventStream.purchasesWithRecentClicks(_),
      _.filter(col("user_id") =!= -1L))
    val batchRes = EventStream.purchasesWithRecentClicks(Tables.events(spark, sf))
    assert(canon(streamRes) === canon(batchRes))
    assert(streamRes.count() > 0)
  }

  test("stream-stream LEFT OUTER interval join: stream ≡ batch incl. watermark-driven nulls") {
    // the __flush sentinel is filtered out by event_type before the
    // branch watermarks, so it cannot advance them — outer null emission
    // needs BOTH branches' watermarks past the data. Inject a far-future
    // click AND purchase sentinel instead (user_id -1, dropped from the
    // result); delay 0s so the nulls flush when the sentinels arrive.
    val streamRes = streamed(
      EventStream.purchasesWithRecentClicksOuter(_, watermarkDelay = "0 seconds"),
      _.filter(col("user_id") =!= -1L),
      sentinels = Seq(
        """{"event_id":-1,"ts":"2099-01-01T00:00:00.000Z","user_id":-1,"event_type":"click","value":0.0,"props":"{}"}""",
        """{"event_id":-2,"ts":"2099-01-01T00:00:00.000Z","user_id":-1,"event_type":"purchase","value":0.0,"props":"{}"}"""))
    val batchRes = EventStream.purchasesWithRecentClicksOuter(Tables.events(spark, sf))
    assert(canon(streamRes) === canon(batchRes))
    // the outer join strictly extends the inner: same matches + null rows
    val inner = EventStream.purchasesWithRecentClicks(Tables.events(spark, sf))
    assert(batchRes.filter(col("click_id").isNotNull).count() === inner.count())
    assert(batchRes.filter(col("click_id").isNull).count() > 0,
      "corpus must exercise the unmatched-purchase path")
  }

  test("stream-static enrichment join broadcasts the dimension side") {
    val s = spark
    import s.implicits._
    val dim = Seq(("click", "engagement"), ("purchase", "revenue"),
      ("view", "engagement"), ("signup", "growth"), ("error", "ops"))
      .toDF("event_type", "category")
    val out = EventStream.enrich(Tables.events(spark, sf), dim, "event_type")
    assert(out.filter($"category" === "revenue").count() ===
      Tables.events(spark, sf).filter($"event_type" === "purchase").count())
    val plan = { out.collect(); out.queryExecution.executedPlan.toString }
    assert(plan.contains("Broadcast"), "dimension side should broadcast")
  }

  test("flatMapGroupsWithState: gap splits within a batch, watermark times out tails") {
    val s = spark
    import s.implicits._
    val root = tmpDir("fmgws")
    val min = 60000L
    // base offset: events AT epoch 0 would tie with the INITIAL watermark
    // (0 ms) and be dropped as late
    val base = 1700000000000L
    def write(name: String, rows: Seq[(Long, Long, String, Double)]): Unit = {
      rows.map { case (ms, uid, et, v) =>
        s"""{"ts_ms":$ms,"user_id":$uid,"event_type":"$et","value":$v}"""
      }.toDF("value").coalesce(1).write.mode("append").text(s"$root/src/$name")
      // the file source orders by modification time; keep phases distinct
      Thread.sleep(1100)
    }
    // phase 1: user 1 has a gap-split pair of sessions; user 2 one event
    write("b1", Seq(
      (base + 0 * min, 1L, "view", 1.0), (base + 10 * min, 1L, "view", 2.0),
      (base + 50 * min, 1L, "view", 4.0), (base + 55 * min, 1L, "buy", 8.0),
      (base + 0 * min, 2L, "view", 16.0)))
    // phase 2: a much later event pushes the watermark past every tail;
    // phase 3 runs one more batch AT that watermark so the timeouts fire
    // (the watermark used inside batch N reflects data through batch N-1)
    write("b2", Seq((base + 10000 * min, 99L, "view", 0.0)))
    write("b3", Seq((base + 20000 * min, 99L, "view", 0.0)))

    // maxFilesPerTrigger is a file-SOURCE option: on writeStream it is
    // silently ignored, all mtime-pinned waves collapse into ONE
    // AvailableNow batch, and the cross-batch state-merge path these
    // tests exist to pin is never exercised
    val src = spark.readStream.schema("value STRING")
      .option("maxFilesPerTrigger", "1").text(s"$root/src/*")
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType.fromDDL(
        "ts_ms LONG, user_id LONG, event_type STRING, value DOUBLE")).as("e"))
      .select(expr("timestamp_millis(e.ts_ms)").as("ts"),
        $"e.user_id", $"e.event_type", $"e.value")
      .withWatermark("ts", "0 seconds")
      .as[EventStream.EventRow]

    val q = EventStream.statefulSessions(src, gapMs = 30 * min).writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.read.parquet(s"$root/out")
      .as[EventStream.SessionOut].collect()
      .filter(_.user_id <= 2).sortBy(r => (r.user_id, r.start_ms))
    assert(out.length === 3, s"got: ${out.mkString(" / ")}")
    assert(out(0) === EventStream.SessionOut(1L, base, base + 10 * min, 2, 3.0))
    assert(out(1) === EventStream.SessionOut(1L, base + 50 * min, base + 55 * min, 2, 12.0))
    assert(out(2) === EventStream.SessionOut(2L, base, base, 1, 16.0))
  }

  test("streaming dedup by id: cross-batch replayed duplicates are dropped (effectively-once)") {
    val root = tmpDir("dedup")
    val ev = Tables.events(spark, sf)
    val asJson = (df: DataFrame) =>
      df.select(to_json(struct(df.columns.map(col): _*)).as("value")).coalesce(1)
    // batch 1: the full table; batch 2: the first 200 events REPLAYED —
    // the at-least-once duplicate window (checkpoint replay / unacked
    // redelivery) reproduced across micro-batch boundaries
    asJson(ev).write.mode("append").text(s"$root/src/b1")
    Thread.sleep(1100) // file source orders batches by modification time
    asJson(ev.orderBy("event_id").limit(200)).write.mode("append").text(s"$root/src/b2")

    // maxFilesPerTrigger is a file-SOURCE option: on writeStream it is
    // silently ignored, all mtime-pinned waves collapse into ONE
    // AvailableNow batch, and the cross-batch state-merge path these
    // tests exist to pin is never exercised
    val src = spark.readStream.schema("value STRING")
      .option("maxFilesPerTrigger", "1").text(s"$root/src/*")
      .select(from_json(col("value"), ev.schema).as("e")).select("e.*")
    EventStream.dedupById(src).writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val out = spark.read.parquet(s"$root/out")
    assert(out.count() === ev.count()) // every duplicate dropped
    // compare at ms precision: the JSON wire format truncates the µs digits
    val cols = Seq(col("event_id"), unix_millis(col("ts")).as("ms"),
      col("user_id"), col("event_type"), col("value"))
    assert(canon(out.select(cols: _*)) === canon(ev.select(cols: _*)))
  }

  test("streaming funnel progression: latest emission per user ≡ q76 batch verdict") {
    val s = spark
    import s.implicits._
    val root = tmpDir("funnel")
    val ev = Tables.events(spark, sf)
    val asJson = (df: DataFrame) =>
      df.select(to_json(struct(df.columns.map(col): _*)).as("value")).coalesce(1)
    // two micro-batches split at the event-time median — the in-order
    // arrival contract under which stream ≡ batch is guaranteed; stage
    // advances must then span the batch boundary for some users
    val mid = ev.agg(expr("percentile_approx(unix_millis(ts), 0.5)")).head().getLong(0)
    val t0 = System.currentTimeMillis() - 60000
    asJson(ev.filter(unix_millis(col("ts")) <= mid).orderBy("ts"))
      .write.mode("append").text(s"$root/src/b1")
    new java.io.File(s"$root/src/b1").listFiles().foreach(f =>
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(t0)))
    asJson(ev.filter(unix_millis(col("ts")) > mid).orderBy("ts"))
      .write.mode("append").text(s"$root/src/b2")
    new java.io.File(s"$root/src/b2").listFiles().foreach(f =>
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(t0 + 10000)))

    // maxFilesPerTrigger is a file-SOURCE option: on writeStream it is
    // silently ignored, all mtime-pinned waves collapse into ONE
    // AvailableNow batch, and the cross-batch state-merge path these
    // tests exist to pin is never exercised
    val src = spark.readStream.schema("value STRING")
      .option("maxFilesPerTrigger", "1").text(s"$root/src/*")
      .select(from_json(col("value"), ev.schema).as("e"))
      .select(col("e.ts"), col("e.user_id"), col("e.event_type"))
      .as[EventStream.FunnelEvent]
    EventStream.funnelProgress(src).writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val out = spark.read.parquet(s"$root/out")
    // stage is strictly monotone per user: emissions = advances only
    val perUser = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("stage")).as("d"),
        max(col("stage")).as("mx"))
    assert(perUser.filter(col("n") =!= col("d") || col("n") =!= col("mx")).count() === 0,
      "each user must emit exactly one row per stage reached, in order")
    // latest (= max-stage) emission per user equals the batch verdict for
    // every user who entered the funnel; stage-0 users never emit
    val last = out.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("stage").desc)))
      .filter(col("rn") === 1).drop("rn")
    val batch = graft.queries.EventQueries.q76Funnel(spark, sf)
      .filter(col("stage") >= 1)
    val cols = Seq("user_id", "stage", "t_view_ms", "t_click_ms", "t_purchase_ms")
      .map(col)
    assert(canon(last.select(cols: _*)) === canon(batch.select(cols: _*)),
      "stream funnel must converge to the batch verdict under in-order arrival")
    assert(batch.limit(1).count() === 1, "the funnel must be non-trivial at sf0.001")
  }

  test("funnel state TTL: an aged-out user restarts the funnel from stage 0") {
    val s = spark
    import s.implicits._
    val root = tmpDir("funnel-ttl")
    val ttlMs = 1000L
    val base = 1700000000000L
    def write(name: String, mtime: Long, rows: Seq[(Long, Long, String)]): Unit = {
      new java.io.File(s"$root/src").mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$root/src/$name"),
        rows.map { case (ms, uid, et) =>
          s"""{"ts":"${new java.sql.Timestamp(ms).toInstant}","user_id":$uid,"event_type":"$et"}"""
        }.mkString("\n"))
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(s"$root/src/$name"),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    def run(): Seq[(Long, Long)] = {
      // Trigger.Once per run: pending processing-time timeouts make
      // AvailableNow schedule no-data batches forever (the CorpusStream
      // TTL test's finding)
      spark.readStream.schema("ts TIMESTAMP, user_id LONG, event_type STRING")
        .json(s"$root/src/*")
        .as[EventStream.FunnelEvent]
        .transform(EventStream.funnelProgress(_, Some(ttlMs)))
        .writeStream.format("parquet").outputMode("append")
        .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.Once()).start().awaitTermination()
      spark.read.parquet(s"$root/out").as[EventStream.FunnelOut]
        .collect().map(o => (o.user_id, o.stage)).sorted.toSeq
    }
    val t0 = System.currentTimeMillis() - 60000
    write("b1.json", t0, Seq((base, 7L, "view"), (base + 1000, 7L, "click")))
    assert(run() === Seq((7L, 1L), (7L, 2L)))
    // horizon passes unseen; a batch WITHOUT user 7 fires the timeout...
    Thread.sleep(3 * ttlMs)
    write("b2.json", t0 + 10000, Seq((base + 2000, 8L, "view")))
    assert(run() === Seq((7L, 1L), (7L, 2L), (8L, 1L)))
    // ...so user 7's next purchase does NOT complete the old funnel — the
    // state was dropped and the purchase has no qualifying click before it
    write("b3.json", t0 + 20000, Seq((base + 3000, 7L, "purchase"), (base + 4000, 7L, "view")))
    val out = run()
    assert(out === Seq((7L, 1L), (7L, 1L), (7L, 2L), (8L, 1L)),
      s"got $out — after the TTL drop, user 7 restarts at a fresh stage-1 view")
  }

  test("coverageSpans: overlap/touch merges, cross-batch extension, watermark finalization") {
    val s = spark
    import s.implicits._
    val root = tmpDir("covspans")
    val min = 60000L
    val base = 1700000000000L
    def write(name: String, mtime: Long, rows: Seq[(Long, Long, Long)]): Unit = {
      rows.map { case (uid, st, en) =>
        s"""{"user_id":$uid,"st":$st,"en":$en}"""
      }.toDF("value").coalesce(1).write.mode("append").text(s"$root/src/$name")
      graft.util.FsUtil.pinMtimes(s"$root/src/$name", mtime)
    }
    // b1: user 1 — overlapping pair + a touching interval (one span), then
    // a disjoint later interval; user 2 — one interval. Deliberately NOT
    // sorted: coverage is a function of the interval SET.
    write("b1", 1000000L, Seq(
      (1L, base + 5 * min, base + 20 * min),
      (1L, base, base + 10 * min),
      (1L, base + 20 * min, base + 30 * min), // touch: [a,b) ∪ [b,c) merges
      (1L, base + 60 * min, base + 70 * min),
      (2L, base, base + 5 * min)))
    // b2: extends user 1's open second span ACROSS the batch boundary; its
    // own watermark (max b1 ts = base+60m) finalizes the earlier spans
    write("b2", 2000000L, Seq(
      (1L, base + 68 * min, base + 80 * min),
      (99L, base + 10000 * min, base + 10000 * min + 1)))
    // b3: pushes the watermark past b2's rows so the extended span flushes
    write("b3", 3000000L, Seq(
      (99L, base + 20000 * min, base + 20000 * min + 1)))

    // maxFilesPerTrigger is a file-SOURCE option: on writeStream it is
    // silently ignored, all mtime-pinned waves collapse into ONE
    // AvailableNow batch, and the cross-batch state-merge path these
    // tests exist to pin is never exercised
    val src = spark.readStream.schema("value STRING")
      .option("maxFilesPerTrigger", "1").text(s"$root/src/*")
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType.fromDDL(
        "user_id LONG, st LONG, en LONG")).as("e"))
      .select(expr("timestamp_millis(e.st)").as("ts"),
        $"e.user_id", $"e.st", $"e.en")
      .withWatermark("ts", "0 seconds")
      .as[EventStream.SpanRow]

    val q = EventStream.coverageSpans(src).writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.read.parquet(s"$root/out")
      .as[EventStream.SpanOut].collect()
      .filter(_.user_id <= 2).sortBy(r => (r.user_id, r.s0))
    assert(out.toSeq === Seq(
      EventStream.SpanOut(1L, base, base + 30 * min),
      EventStream.SpanOut(1L, base + 60 * min, base + 80 * min),
      EventStream.SpanOut(2L, base, base + 5 * min)),
      s"got: ${out.mkString(" / ")}")
  }
}
