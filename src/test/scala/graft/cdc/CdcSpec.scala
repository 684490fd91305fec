package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.Fixtures

/** Unit coverage for the envelope operators (O2–O5) against hand-built
  * Debezium-shaped JSON. */
class CdcSpec extends SparkSpec {

  private def parsed(envs: Seq[String]) = {
    val s = spark
    import s.implicits._
    Cdc.parseEnvelope(envs.toDF("value"), "value", Fixtures.rowV1)
  }

  test("unwrapRewrite projects after.* for inserts/updates, before.* for deletes") {
    val s = spark
    import s.implicits._
    val df = Cdc.unwrapRewrite(parsed(Seq(
      Fixtures.envelope(1, "A", "a@x.com", "c"),
      Fixtures.envelope(2, "B", "b@x.com", "u"),
      Fixtures.envelope(3, "C", "c@x.com", "d"))))
    val rows = df.select($"id", $"first_name", $"__deleted")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(rows === Seq((1L, "A", "false"), (2L, "B", "false"), (3L, "C", "true")))
    // __deleted stays a STRING — pinned by the reference goldens
    assert(df.schema("__deleted").dataType.typeName === "string")
  }

  test("includeFilter keeps only the configured db.table") {
    val df = Cdc.includeFilter(parsed(Seq(
      Fixtures.envelope(1, "A", "a@x.com", "c"),
      Fixtures.envelope(2, "B", "b@x.com", "c", db = "other"),
      Fixtures.envelope(3, "C", "c@x.com", "c", table = "other"))),
      "debezium_test", "people")
    assert(df.count() === 1)
  }

  test("toKeyedJson emits PK-struct key and full-row value") {
    val s = spark
    import s.implicits._
    val df = Cdc.toKeyedJson(
      Cdc.unwrapRewrite(parsed(Seq(Fixtures.envelope(994, "Tim", "tim@corp.com", "c")))),
      Seq("id"))
    val (key, value) = df.as[(String, String)].head()
    assert(key === """{"id":994}""")
    assert(value.contains(""""first_name":"Tim""""))
    assert(value.contains(""""__deleted":"false""""))
  }

  test("malformed envelope JSON parses to an all-null row (kept for DLQ, not a crash)") {
    val df = parsed(Seq("{{{not json"))
    assert(df.count() === 1)
    assert(df.filter(col("op").isNull).count() === 1)
  }
}
