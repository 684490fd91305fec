package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.Cdc

/** The Debezium-server analog (O1–O5 as ONE streaming query): tail a
  * change-log of Debezium-shaped envelope JSON, filter to the included
  * db/table, flatten with delete-rewrite, serialize to keyed JSON, and
  * publish to a [[Topic]].
  *
  * The reference declares this chain as SMT config
  * (`/root/reference/conf/debezium.properties:11-21`); here it is four
  * narrow Catalyst projections that fuse into one whole-stage-codegen span
  * over the streaming file source — per-record cost is a JSON parse plus a
  * JSON serialize, no shuffle, no state beyond source offsets in the
  * checkpoint (O6, the analog of `offset.flush.interval.ms`).
  *
  * The source is a directory of JSON lines (`{"value": "<envelope json>"}`
  * or raw envelope objects written as text) — in production this trait
  * would sit on a binlog connector; the transform chain is source-agnostic.
  */
object CdcIngest {

  /** Build the transform chain over any envelope-JSON frame with a `value`
    * column. Shared verbatim by the streaming path and the batch-twin
    * queries ([[graft.queries.EventQueries]]), so the oracle-checked
    * semantics are literally the deployed code. */
  def transform(raw: DataFrame, rowSchema: StructType,
                includeDb: String, includeTable: String,
                keyCols: Seq[String],
                deleteRewrite: Boolean = true): DataFrame = {
    val parsed = Cdc.parseEnvelope(raw, "value", rowSchema)
    val included = Cdc.includeFilter(parsed, includeDb, includeTable)
    val rows = if (deleteRewrite) Cdc.unwrapRewrite(included) else Cdc.unwrapDrop(included)
    Cdc.toKeyedJson(rows, keyCols)
  }

  /** O28 companion: start the ingest with every pipeline-shaping setting
    * taken from a RENDERED CONFIG ([[graft.config.PipelineConfig.cdcSpec]])
    * — include lists, delete handling, and the offset-flush cadence (which
    * maps onto micro-batch cadence: offsets commit per micro-batch, so
    * `offset.flush.interval.ms` becomes the processing trigger interval;
    * pass an explicit `trigger` to override, e.g. `AvailableNow` for a
    * bounded backfill). */
  def startFromConfig(spark: SparkSession,
                      changeLogDir: String,
                      rowSchema: StructType,
                      spec: graft.config.PipelineConfig.CdcPipelineSpec,
                      keyCols: Seq[String],
                      topic: Topic,
                      checkpointDir: String,
                      trigger: Option[Trigger] = None): StreamingQuery =
    start(spark, changeLogDir, rowSchema, spec.includeDb, spec.includeTable,
      keyCols, topic, checkpointDir,
      trigger.getOrElse(Trigger.ProcessingTime(math.max(0L, spec.offsetFlushMs))),
      spec.deleteRewrite)

  /** Start the ingest query: change-log dir → transform → topic publish. */
  def start(spark: SparkSession,
            changeLogDir: String,
            rowSchema: StructType,
            includeDb: String,
            includeTable: String,
            keyCols: Seq[String],
            topic: Topic,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            deleteRewrite: Boolean = true,
            // backpressure knob (the Subscription's twin): caps change-log
            // files per micro-batch, bounding executor memory per ingest
            // attempt — and giving AvailableNow real multi-batch drains
            maxFilesPerBatch: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream
      .schema(StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    maxFilesPerBatch.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader.json(changeLogDir)
    topic.publishStream(
      transform(raw, rowSchema, includeDb, includeTable, keyCols, deleteRewrite),
      checkpointDir)
      .trigger(trigger)
      .queryName(s"cdc-ingest-${topic.name}")
      .start()
  }
}
