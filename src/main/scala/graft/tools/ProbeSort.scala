package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporary measurement tool: cost of a trailing global orderBy over a
  * compute-heavy narrow pipeline (range-partitioner sampling re-executes the
  * child) vs sorting the cheap SOURCE scan first and letting narrow ops
  * preserve the order. */
object ProbeSort {

  private def envelopes(s: SparkSession, dir: String, sorted: Boolean): DataFrame = {
    import s.implicits._
    val ev0 = graft.Tables.events(s, dir)
    val ev = if (sorted) ev0.orderBy($"event_id") else ev0
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

  private val rowSchema = StructType.fromDDL("id LONG, user_id LONG, etype STRING, val DOUBLE")

  private def unwrap(env: DataFrame): DataFrame =
    graft.cdc.Cdc.unwrapRewrite(graft.cdc.Cdc.includeFilter(
      graft.cdc.Cdc.parseEnvelope(env, "value", rowSchema), "debezium_test", "people"))

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(cores = "32", appName = "probe-sort")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    unwrap(envelopes(spark, "/root/testdata/sf0.001", sorted = false))
      .write.format("noop").mode("overwrite").save() // warm
    for (i <- 1 to 2) {
      time("unwrap + trailing orderBy") {
        unwrap(envelopes(spark, dir, sorted = false)).orderBy($"id")
          .write.format("noop").mode("overwrite").save()
      }
      time("unwrap, no sort") {
        unwrap(envelopes(spark, dir, sorted = false))
          .write.format("noop").mode("overwrite").save()
      }
      time("unwrap, source pre-sorted") {
        unwrap(envelopes(spark, dir, sorted = true))
          .write.format("noop").mode("overwrite").save()
      }
      time("q21 as-is (trailing sort)") {
        graft.queries.TextQueries.q21TextStats(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
