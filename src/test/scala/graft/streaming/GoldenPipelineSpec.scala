package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.schema.SchemaRegistry

/** End-to-end goldens G1–G6 (SURVEY.md §5), pinned to the reference lab's
  * documented outputs (`/root/reference/README.md:197-450`): the full
  * change-log → CDC ingest → topic → subscription → sink pipeline, with the
  * source, topic, and sink schemas drifting independently across phases.
  *
  * Runs as ONE ordered scenario because the phases share evolving state —
  * exactly like the reference lab's numbered steps.
  */
class GoldenPipelineSpec extends SparkSpec {

  import Fixtures._

  test("G1..G6: CDC pipeline with schema drift, retry, and dead-letter") {
    val s = spark
    import s.implicits._

    val changeLog  = tmpDir("changelog")
    val topicDir   = tmpDir("topic")
    val sinkDir    = tmpDir("sink")
    val dlqDir     = tmpDir("dlq")
    val ingestCkpt = tmpDir("ckpt-ingest")
    val subCkpt    = tmpDir("ckpt-sub")

    val registry = new SchemaRegistry
    val topicRev = registry.register("people-topic", topicSchema)
    registry.register("people-sink", sinkV1)

    val topic = new Topic(spark, "people-topic", topicDir, topicRev)
    var backoffs = 0
    val sub = new Subscription("bq-sub", topic, subCkpt,
      DeliveryPolicy(maxDeliveryAttempts = 5, minBackoffMs = 60000L))

    def runIngest(rowSchema: StructType): Unit = {
      val q = CdcIngest.start(spark, changeLog, rowSchema,
        "debezium_test", "people", Seq("id"), topic, ingestCkpt)
      q.awaitTermination()
    }
    def runDelivery(): Unit = {
      val q = sub.deliverTo(sinkDir, topicSchema,
        () => registry.latest("people-sink").schema, dlqDir,
        sleep = _ => backoffs += 1)
      q.awaitTermination()
    }
    def sink(): DataFrame =
      spark.read.option("mergeSchema", "true").parquet(sinkDir)

    // ---- G1: seed 3 rows -> 3 sink rows, __deleted=false -------------------
    appendEnvelopes(changeLog, Seq(
      insertV1(990, "Tom", "tom@corp.com"),
      insertV1(991, "Phil", "phil@corp.com"),
      insertV1(992, "Ted", "ted@corp.com")))
    runIngest(rowV1)
    runDelivery()

    assert(sink().count() === 3)
    assert(sink().columns.sorted === sinkV1.fieldNames.sorted)
    assert(sink().select("__deleted").as[String].collect().toSet === Set("false"))
    assert(sink().filter($"id" === 990).select("first_name", "zipcode")
      .as[(String, Long)].head() === ("Tom", 2174L))

    // ---- G3: source adds `phone` + row 994 ---------------------------------
    // Debezium would emit the new column automatically; we restart the ingest
    // query with the evolved source row schema (same checkpoint: only the new
    // change-log files are processed).
    appendEnvelopes(changeLog, Seq(insertV2(994, "Tim", "tim@corp.com")))
    runIngest(rowV2)
    runDelivery()

    // sink gained the row but NOT the phone column (not in topic schema)
    assert(sink().count() === 4)
    assert(!sink().columns.contains("phone"))
    assert(sink().filter($"id" === 994).select("first_name").as[String].head() === "Tim")

    // ---- G4: the raw topic message still carries phone + attributes --------
    val msg994 = topic.read.filter(get_json_object($"value", "$.id") === "994").head()
    val data = msg994.getAs[String]("value")
    assert(data.contains(""""phone":"508-555-1212""""))
    assert(data.contains(""""__deleted":"false""""))
    assert(msg994.getAs[String]("key") === """{"id":994}""")
    val attrs = msg994.getAs[Map[String, String]]("attributes")
    assert(attrs("googclient_schemaencoding") === "JSON")
    assert(attrs("googclient_schemarevisionid") === topicRev.revisionId)

    // ---- G5: sink adds `age` + row 995 -> age NULL everywhere --------------
    registry.register("people-sink", sinkV2)
    appendEnvelopes(changeLog, Seq(insertV2(995, "Kim", "kim@corp.com")))
    runIngest(rowV2)
    runDelivery()

    assert(sink().count() === 5)
    assert(sink().filter($"age".isNotNull).count() === 0)

    // ---- G6 (negative): sink drops zipcode -> retries -> DLQ, no new rows --
    registry.register("people-sink", sinkV3)
    appendEnvelopes(changeLog, Seq(insertV2(996, "Bob", "bob@corp.com")))
    runIngest(rowV2)
    backoffs = 0
    runDelivery() // must NOT throw: the query survives the schema mismatch

    assert(sink().filter($"id" === 996).count() === 0, "mismatched row must not land")
    assert(sink().count() === 5)
    assert(backoffs === 4, "4 backoffs between 5 delivery attempts")
    val dlq = spark.read.json(dlqDir)
    assert(dlq.count() === 1)
    val dead = dlq.head()
    assert(dead.getAs[String]("error").contains("zipcode"))
    assert(dead.getAs[Long]("delivery_attempts") === 5L)
    assert(dead.getAs[String]("value").contains(""""id":996"""))

    // ---- delete event round-trip: __deleted rewrite reaches the sink -------
    registry.register("people-sink", sinkV2) // restore a compatible sink
    appendEnvelopes(changeLog, Seq(deleteV2(991, "Phil", "phil@corp.com")))
    runIngest(rowV2)
    runDelivery()
    val del = sink().filter($"id" === 991 && $"__deleted" === "true")
    assert(del.count() === 1)

    // ---- DLQ replay: fixed sink schema -> dead letters deliver -------------
    val replayed = Subscription.replayDeadLetters(spark, dlqDir, sub, sinkDir,
      topicSchema, () => registry.latest("people-sink").schema, sleep = _ => ())
    assert(replayed === 1L)
    assert(sink().filter($"id" === 996).count() === 1, "replayed row lands after fix")
    assert(spark.read.parquet(sinkDir).count() === 7) // 5 + delete event + replay
    // a second replay is a no-op (DLQ was drained)
    assert(Subscription.replayDeadLetters(spark, dlqDir, sub, sinkDir,
      topicSchema, () => registry.latest("people-sink").schema, sleep = _ => ()) === 0L)

    // ---- retention: pruning every topic file empties the log ---------------
    assert(topic.pruneRetention(retentionSeconds = 0, nowMs = System.currentTimeMillis() + 10000) > 0)
    assert(topic.read.count() === 0)
  }

  test("excluded tables are filtered out before publish (O2)") {
    val changeLog  = tmpDir("changelog2")
    val topicDir   = tmpDir("topic2")
    val ingestCkpt = tmpDir("ckpt-ingest2")
    val registry = new SchemaRegistry
    val topic = new Topic(spark, "t2", topicDir, registry.register("t2", Fixtures.topicSchema))

    appendEnvelopes(changeLog, Seq(
      Fixtures.insertV1(1, "A", "a@x.com"),
      Fixtures.envelope(2, "B", "b@x.com", "c", db = "otherdb", table = "people"),
      Fixtures.envelope(3, "C", "c@x.com", "c", db = "debezium_test", table = "other")))
    CdcIngest.start(spark, changeLog, Fixtures.rowV1,
      "debezium_test", "people", Seq("id"), topic, ingestCkpt).awaitTermination()

    assert(topic.read.count() === 1)
  }

  test("publish rejects a payload that violates the topic schema (O7)") {
    val s = spark
    import s.implicits._
    val registry = new SchemaRegistry
    val topic = new Topic(spark, "t3", tmpDir("topic3"),
      registry.register("t3", Fixtures.topicSchema))
    val bad = Seq(("""{"id":1}""", "not json at all {{{"))
      .toDF("key", "value")
    assertThrows[IllegalArgumentException](topic.publish(bad))
  }

  /** Append one file of envelope messages to the change-log dir. */
  private def appendEnvelopes(dir: String, envelopes: Seq[String]): Unit = {
    val s = spark
    import s.implicits._
    envelopes.toDF("value").coalesce(1).write.mode("append").json(dir)
  }
}

/** Debezium-shaped fixtures for the reference's `people` table
  * (`/root/reference/sql/pubsub2bq.sql:3-13`; sink schemas
  * `/root/reference/terraform/main.tf:301-350`, `/root/reference/sql/bq_schemav2.json`). */
object Fixtures {
  private def f(n: String, t: DataType) = StructField(n, t)

  /** Source row schema v1 (MySQL people). */
  val rowV1: StructType = StructType(Seq(
    f("id", LongType), f("first_name", StringType), f("last_name", StringType),
    f("email", StringType), f("zipcode", LongType), f("city", StringType),
    f("country", StringType)))

  /** v2: source evolved with `phone` (README.md:228). */
  val rowV2: StructType = StructType(rowV1.fields :+ f("phone", StringType))

  /** Topic schema: v1 row + __deleted (STRING, pinned by goldens). */
  val topicSchema: StructType = StructType(rowV1.fields :+ f("__deleted", StringType))

  /** Sink v1 = topic schema (terraform/main.tf:301-350). */
  val sinkV1: StructType = topicSchema
  /** Sink v2: + age, NULL-filled (README.md:302-305). */
  val sinkV2: StructType = StructType(sinkV1.fields :+ f("age", LongType))
  /** Sink v3: zipcode dropped (sql/bq_schemav2.json) — the negative golden. */
  val sinkV3: StructType = StructType(sinkV1.fields.filterNot(_.name == "zipcode"))

  def envelope(id: Long, first: String, email: String, op: String,
               phone: Option[String] = None, db: String = "debezium_test",
               table: String = "people"): String = {
    val phoneField = phone.map(p => s""","phone":"$p"""").getOrElse("")
    val row = s"""{"id":$id,"first_name":"$first","last_name":"BagofDonuts","email":"$email","zipcode":2174,"city":"Arlington","country":"USA"$phoneField}"""
    val (before, after) = if (op == "d") (row, "null") else ("null", row)
    s"""{"before":$before,"after":$after,"source":{"db":"$db","table":"$table"},"op":"$op","ts_ms":1700000000000}"""
  }

  def insertV1(id: Long, first: String, email: String): String =
    envelope(id, first, email, "c")
  def insertV2(id: Long, first: String, email: String): String =
    envelope(id, first, email, "c", phone = Some("508-555-1212"))
  def deleteV2(id: Long, first: String, email: String): String =
    envelope(id, first, email, "d", phone = Some("508-555-1212"))
}
