package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{CdcIngest, Subscription, Topic}

/** Sustained CDC-pipeline throughput — grades the streaming core (O1–O14)
  * the way the bench grades the batch gates (r10 verdict #3): the
  * correctness gates prove the pipeline's RESULTS; this measures its RATE.
  *
  * Drives the FULL events table (not the gates' 1-in-20 subset) through the
  * real `CdcIngest → Topic → Subscription → parquet sink` runtime under
  * forced multi-batch cadence (change-log split into many files, ingest and
  * delivery capped at files-per-trigger), so the number includes the
  * per-micro-batch overhead a sustained stream pays — offset commits,
  * validate+stamp publish, conformance projection, sink append — not just
  * one giant batch's amortized cost.
  *
  * Reports one JSON line: envelope count, per-stage wall seconds and
  * rows/s (ingest = change-log → topic, deliver = topic → sink),
  * end-to-end rows/s, micro-batch counts, and the durable-state footprint
  * (bytes in the two checkpoints + the topic log — this pipeline's state
  * is offsets + the retained log, there is no keyed store).
  *
  * Usage: `sbt "runMain graft.tools.ThroughputBench [sfDir] [parts] [filesPerBatch]"`
  * (defaults sf0.1, 64 change-log files, 8 files per micro-batch ≈ 8
  * ingest batches and as many delivery batches as topic publishes).
  */
object ThroughputBench {

  private def dirBytes(p: String): Long = {
    val root = Paths.get(p)
    if (!Files.exists(root)) return 0L
    val it = Files.walk(root).iterator()
    var n = 0L
    while (it.hasNext) { val f: Path = it.next(); if (Files.isRegularFile(f)) n += Files.size(f) }
    n
  }

  private def countFiles(p: String, suffix: String): Int = {
    val root = Paths.get(p)
    if (!Files.exists(root)) return 0
    val it = Files.list(root).iterator()
    var n = 0
    while (it.hasNext) { if (it.next().getFileName.toString.endsWith(suffix)) n += 1 }
    n
  }

  /** Same envelope shape as the cdc gates (StreamQueries.cdcEnvelopes). */
  private def envelopes(s: SparkSession, ev: DataFrame): DataFrame = {
    import s.implicits._
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

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val parts = args.lift(1).map(_.toInt).getOrElse(64)
    val filesPerBatch = args.lift(2).map(_.toInt).getOrElse(8)

    val spark = graft.GraftSession.local(appName = "graft-throughput")
    import spark.implicits._
    val root = graft.util.HarnessDirs.newDir("throughput")

    val ev = graft.Tables.events(spark, sfDir)
    val n = ev.count()
    envelopes(spark, ev).repartition(parts)
      .write.mode("overwrite").json(s"$root/changelog")

    val rowSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, user_id LONG, etype STRING, val DOUBLE")
    val topicSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, user_id LONG, etype STRING, __deleted STRING")
    val sinkSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, user_id LONG, etype STRING, age LONG, __deleted STRING")

    val registry = new graft.schema.SchemaRegistry
    val topic = new Topic(spark, "tp-topic", s"$root/topic",
      registry.register("tp-topic", topicSchema))

    val t0 = System.nanoTime()
    CdcIngest.start(spark, s"$root/changelog", rowSchema, "debezium_test",
      "people", Seq("id"), topic, s"$root/ckpt-ingest",
      maxFilesPerBatch = Some(filesPerBatch)).awaitTermination()
    val tIngest = (System.nanoTime() - t0) / 1e9

    val topicFiles = countFiles(s"$root/topic", ".json")
    val t1 = System.nanoTime()
    new Subscription("tp-sub", topic, s"$root/ckpt-sub")
      .deliverTo(s"$root/sink", topicSchema, () => sinkSchema, s"$root/dlq",
        maxFilesPerBatch = Some(filesPerBatch))
      .awaitTermination()
    val tDeliver = (System.nanoTime() - t1) / 1e9

    val sinkRows = spark.read.parquet(s"$root/sink").count()
    require(sinkRows == n, s"sink rows $sinkRows != envelopes $n")
    val total = tIngest + tDeliver
    val state = Map(
      "ckpt_ingest" -> dirBytes(s"$root/ckpt-ingest"),
      "ckpt_sub" -> dirBytes(s"$root/ckpt-sub"),
      "topic_log" -> dirBytes(s"$root/topic"))
    println(f"""{"metric":"cdc_throughput","rows":$n,"ingest_s":$tIngest%.2f,"deliver_s":$tDeliver%.2f,"total_s":$total%.2f,"ingest_rows_per_s":${n / tIngest}%.0f,"deliver_rows_per_s":${n / tDeliver}%.0f,"e2e_rows_per_s":${n / total}%.0f,"changelog_files":$parts,"files_per_batch":$filesPerBatch,"topic_files":$topicFiles,"state_bytes":{${state.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},"sf":"$sfDir"}""")
    spark.stop()
  }
}
