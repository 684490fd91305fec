package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.SchemaRegistry
import graft.streaming.{CdcIngest, Subscription, Topic}

/** The ACTUAL streaming runtime under the correctness gate: q31 runs the
  * full change-log → CdcIngest → Topic → Subscription → parquet-sink
  * pipeline (two real StreamingQuery executions with checkpoints,
  * Trigger.AvailableNow) and returns the sink table. The DuckDB oracle
  * states the end-to-end contract directly over `events`.
  *
  * A 1-in-20 subset of events streams through (the pipeline's per-row work
  * is identical; the subset keeps the bench honest about runtime cost
  * without dominating it).
  */
object StreamQueries {

  def q31StreamE2e(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._

    // under the per-JVM harness root (shutdown-hook deleted): the sink is
    // read lazily after this function returns, so no in-function cleanup
    val root = graft.util.HarnessDirs.newDir("q31")
    val registry = new SchemaRegistry

    // the same envelope synthesis as the cdc_* batch twins, restricted to
    // the 1-in-20 subset
    val ev = graft.Tables.events(s, dir).filter($"event_id" % 20 === 0)
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
      .write.mode("overwrite").json(s"$root/changelog")

    val rowSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, user_id LONG, etype STRING, val DOUBLE")
    val topicSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, user_id LONG, etype STRING, __deleted STRING")
    val sinkSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, user_id LONG, etype STRING, age LONG, __deleted STRING")

    val topic = new Topic(s, "q31-topic", s"$root/topic",
      registry.register("q31-topic", topicSchema))
    CdcIngest.start(s, s"$root/changelog", rowSchema, "debezium_test", "people",
      Seq("id"), topic, s"$root/ckpt-ingest").awaitTermination()

    new Subscription("q31-sub", topic, s"$root/ckpt-sub")
      .deliverTo(s"$root/sink", topicSchema, () => sinkSchema, s"$root/dlq")
      .awaitTermination()

    // the swap-aware sink read surface (a no-op manifest check when no
    // compaction is in flight, a consistent snapshot when one is)
    graft.streaming.SinkMaintenance.read(s, s"$root/sink").orderBy($"id")
  }

  /** End-to-end contract over the streamed subset: unwrap + delete-rewrite
    * (rule applied by ingest), unknown-field drop (`val` is not in the
    * topic schema), sink-only NULL column (`age`). */
  val q31Sql: String =
    """SELECT event_id AS id, user_id, event_type AS etype,
      |  CAST(NULL AS BIGINT) AS age,
      |  CASE WHEN event_type = 'error' THEN 'true' ELSE 'false' END AS __deleted
      |FROM events
      |WHERE event_id % 20 = 0
      |ORDER BY id""".stripMargin

  /** q34_merge_upsert — the [[graft.merge.MergeSink]] latest-wins upsert
    * under the oracle gate: events applied in TWO batches (split by id
    * parity, so later batches overwrite earlier state for shared keys);
    * the final table state must equal the declarative latest-per-key SQL
    * the oracle states — the O26 convergence contract. */
  def q34MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.util.HarnessDirs.newDir("q34")
    val changes = graft.Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_millis($"ts").as("ms"))
    val sink = new graft.merge.MergeSink(s, s"$root/t", "user_id",
      Seq("ms", "event_id"), numBuckets = 32)
    sink.merge(changes.filter($"event_id" % 2 === 0))
    sink.merge(changes.filter($"event_id" % 2 === 1))
    sink.read()
      .select($"user_id", $"event_id", $"event_type", $"value")
      .orderBy($"user_id")
  }

  val q34Sql: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_stream_e2e"  -> (q31StreamE2e _),
    "q34_merge_upsert" -> (q34MergeUpsert _))

  val oracles: Map[String, String] = Map(
    "q31_stream_e2e"  -> q31Sql,
    "q34_merge_upsert" -> q34Sql)
}
