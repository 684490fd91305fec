package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q133's detection contract on a constructed stream: a planted 10× spike
  * is flagged, steady hours are not, and the cold-start window is NULL.
  */
class RateAnomalySpec extends SparkSpec {

  test("a planted 10x spike is the only flagged hour; cold-start hours export NULL z") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("rate-anomaly")
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime

    // 48 steady hours of 100 events (jittered inside the hour), then hour 48
    // spikes to 1000 — everything from one event type
    val steady = spark.range(0, 48L * 100).select(
      $"id".as("event_id"),
      timestamp_millis(lit(base) + ($"id" / 100).cast("long") * 3600000L
        + ($"id" % 100) * 1000L).as("ts"),
      ($"id" % 7).as("user_id"), lit("view").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"))
    val spike = spark.range(0, 1000).select(
      ($"id" + 1000000L).as("event_id"),
      timestamp_millis(lit(base) + 48L * 3600000L + ($"id" % 3600) * 1000L).as("ts"),
      ($"id" % 7).as("user_id"), lit("view").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"))
    steady.unionByName(spike).write.parquet(s"$dir/events.parquet")

    val out = EventQueries.q133RateAnomaly(spark, dir).collect()
      .map(r => (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
      .sortBy(_._1)

    assert(out.length == 49)
    val firstHr = out.head._1
    // hours 0..11 have under 12 trailing baseline hours -> NULL z, flag 0
    out.take(12).foreach { case (_, z, a) => assert(z.isEmpty && a == 0L) }
    // steady hours 12..47: the variance floor gives z = 0, never NULL —
    // and never a flag
    out.slice(12, 48).foreach { case (_, z, a) => assert(z.contains(0L) && a == 0L) }
    // the spike hour is flagged with a huge positive z
    val (hr, z, a) = out.last
    assert(hr == firstHr + 48)
    assert(a == 1L && z.exists(_ > 3000000L))
  }

  test("a noisy but steady stream raises no flags") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("rate-steady")
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    // counts alternate 90/110 per hour — variance present, no outlier
    val ev = spark.range(0, 48L * 200).filter(
      ($"id" % 200 < 90) || (($"id" / 200) % 2 === 1 && $"id" % 200 < 110))
      .select($"id".as("event_id"),
        timestamp_millis(lit(base) + ($"id" / 200).cast("long") * 3600000L
          + ($"id" % 200) * 1000L).as("ts"),
        lit(1L).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
    ev.write.parquet(s"$dir/events.parquet")
    val flagged = EventQueries.q133RateAnomaly(spark, dir)
      .filter($"anomaly" === 1).count()
    assert(flagged == 0L)
  }
}
