package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.streaming.EventStream

/** Sustained-stream STATE soak for the stateful operators (r11 verdict #7):
  * the correctness gates run a handful of micro-batches; this drives each
  * operator through ~200 sequential micro-batches at a fixed per-batch
  * arrival rate and records the state store's row count after every batch,
  * so the O(open-state) bounds are demonstrated over TIME — state must
  * plateau once the watermark horizon starts evicting, not merely stay
  * small for one short run.
  *
  * Operators soaked (the three stateful gate families):
  *  - `sessions`   — [[EventStream.gapSessions]] (q103's operator): state =
  *    open session fragments; bounded by active users × delay;
  *  - `windows`    — [[EventStream.hourlyStats]] (q110's operator): state =
  *    open (window × type) groups within the watermark;
  *  - `dedup_ttl`  — [[EventStream.dedupById]] (q163's operator): state =
  *    ids within the duplicate horizon, EVICTED as the watermark passes;
  *  - `dedup_unbounded` — plain `dropDuplicates` (q107's operator), kept as
  *    the CONTRAST curve: state grows with every new key forever — the
  *    scale flaw q163 exists to fix, visible as the one monotone line.
  *
  * Feed: the full events table, globally ordered by event time and split
  * into `batches` equal-count slices written one file at a time (file mod
  * times make the source order deterministic), drained with
  * `maxFilesPerTrigger=1` under `Trigger.AvailableNow` — so event time
  * advances ~uniformly per batch (~span/batches of event time each) and
  * the watermark sweeps forward exactly as in a production stream.
  *
  * Output: `state_soak.json` in the CWD (per-operator per-batch curves:
  * batch id, input rows, state rows, watermark) plus one summary line per
  * operator with the flatness verdict: `flat` = the last-quarter state
  * maximum is within 20% of the mid-run maximum (the plateau), which the
  * three bounded operators must pass and the contrast curve must FAIL.
  *
  * Usage: `sbt "runMain graft.tools.StateSoak [sfDir] [batches]"`. */
object StateSoak {

  private final case class Tick(batch: Long, inputRows: Long, stateRows: Long,
                                stateBytes: Long, watermark: String)

  private def runOne(spark: SparkSession, name: String, feed: String,
                     batches: Int, op: DataFrame => DataFrame): Seq[Tick] = {
    val root = graft.util.HarnessDirs.newDir(s"soak-$name")
    val src = spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ms LONG")
      .option("maxFilesPerTrigger", "1")
      .json(feed)
      .withColumn("ts", timestamp_millis(col("ms")))
    val ticks = ArrayBuffer.empty[Tick]
    @volatile var runId: java.util.UUID = null
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.runId == runId) ticks.synchronized {
          ticks += Tick(e.progress.batchId,
            e.progress.numInputRows,
            e.progress.stateOperators.map(_.numRowsTotal).sum,
            e.progress.stateOperators.map(_.memoryUsedBytes).sum,
            Option(e.progress.eventTime.get("watermark")).getOrElse(""))
        }
    }
    spark.streams.addListener(listener)
    try {
      val q = op(src).writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      runId = q.runId
      q.awaitTermination()
      // listener events are async — drain the bus before reading the buffer
      spark.streams.resetTerminated()
      Thread.sleep(2000)
    } finally spark.streams.removeListener(listener)
    ticks.synchronized(ticks.sortBy(_.batch).toSeq)
  }

  /** `flat` = last-quarter max within 20% of the mid-run (2nd+3rd quarter)
    * max — the plateau bounded state must reach once eviction starts. */
  private def verdict(ticks: Seq[Tick]): (Long, Long, Long, Boolean) = {
    val n = ticks.size
    val mid = ticks.slice(n / 4, 3 * n / 4).map(_.stateRows)
    val last = ticks.drop(3 * n / 4).map(_.stateRows)
    val midMax = if (mid.isEmpty) 0L else mid.max
    val lastMax = if (last.isEmpty) 0L else last.max
    val peak = ticks.map(_.stateRows).max
    (peak, midMax, lastMax, lastMax <= (midMax * 1.2).toLong)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val batches = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = graft.GraftSession.local(appName = "graft-state-soak")
    import spark.implicits._

    val feed = graft.util.HarnessDirs.newDir("soak-feed")
    val sliced = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value",
        unix_millis($"ts").as("ms"))
      .withColumn("slice",
        ntile(batches).over(org.apache.spark.sql.expressions.Window
          .orderBy($"ms", $"event_id")))
      .cache()
    val total = sliced.count()
    // one file per slice, written in order so source mod-times are monotone
    for (i <- 1 to batches) {
      sliced.filter($"slice" === i).drop("slice")
        .coalesce(1).write.mode("append").json(feed)
    }
    sliced.unpersist()
    System.err.println(s"[soak] feed ready: $total rows in $batches slices")

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "sessions" -> (df => EventStream.gapSessions(df)),
      "windows" -> (df => EventStream.hourlyStats(df)),
      "dedup_ttl" -> (df => EventStream.dedupById(df)),
      "coverage" -> (df => {
        val ss = df.sparkSession; import ss.implicits._
        EventStream.coverageSpans(df
          .withColumn("st", col("ms"))
          .withColumn("en", col("ms") + (col("event_id") % 30 + 1) * 60000L)
          .withWatermark("ts", "2 hours")
          .select($"ts", $"user_id", $"st", $"en")
          .as[EventStream.SpanRow]).toDF()
      }),
      "dedup_unbounded" -> (df => df.dropDuplicates("event_id")))

    val results = ops.map { case (name, op) =>
      System.err.println(s"[soak] $name ...")
      val ticks = runOne(spark, name, feed, batches, op)
      val (peak, midMax, lastMax, flat) = verdict(ticks)
      System.err.println(f"[soak] $name%-16s batches=${ticks.size}%3d peak=$peak%9d " +
        f"midMax=$midMax%9d lastMax=$lastMax%9d flat=$flat")
      (name, ticks, peak, midMax, lastMax, flat)
    }

    val json = results.map { case (name, ticks, peak, midMax, lastMax, flat) =>
      val curve = ticks.map(t =>
        s"""{"batch":${t.batch},"input":${t.inputRows},"state":${t.stateRows},"state_bytes":${t.stateBytes},"wm":"${t.watermark}"}""")
        .mkString("[", ",", "]")
      s""""$name":{"peak":$peak,"mid_max":$midMax,"last_quarter_max":$lastMax,"flat":$flat,"curve":$curve}"""
    }.mkString("{", ",",
      s""","batches":$batches,"rows":$total,"sf":"$sfDir","state_store":"${
        sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "hdfs")}"}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("state_soak.json"), json)
    println(json.take(512) + (if (json.length > 512) "..." else ""))
    spark.stop()
  }
}
