package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q148's variance-reduction contract: when the post metric is EXACTLY
  * proportional to the pre covariate (y = k·x), θ recovers k and the
  * adjusted means of both variants collapse to the same pooled value —
  * any raw-mean gap was pure baseline imbalance, and CUPED removes it.
  */
class CupedSpec extends SparkSpec {

  test("adjusted means equalize a planted baseline imbalance; raw means do not") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("cuped")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val split = 1705363200000L
    // user u has pre-activity x = (u % 13) + 1 events and post value sum
    // y = 3·x exactly (value 1.5 per post event, 2x events -> y2 = 300x);
    // md5 assignment will split users with different x mixes per variant
    val rows = (0L until 240L).flatMap { u =>
      val x = (u % 13 + 1).toInt
      val pre = (0 until x).map(i =>
        (u * 1000 + i, new java.sql.Timestamp(base + i * 3600000L),
          u, "view", 0.0, "{}"))
      val post = (0 until 2 * x).map(i =>
        (u * 1000 + 500 + i, new java.sql.Timestamp(split + i * 3600000L),
          u, "purchase", 1.5, "{}"))
      pre ++ post
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val out = EventQueries.q148Cuped(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.length == 2)
    val Array(a, b) = out.toArray
    // theta_e6 = 300e6 exactly (y2 = 300·x)
    assert(a._3 == 300000000L && b._3 == 300000000L)
    // raw means differ (md5 split leaves an x imbalance on this corpus)…
    assert(a._2 != b._2)
    // …but adjusted means agree to the e6 floor (±1 ulp of the floor)
    assert(math.abs(a._4 - b._4) <= 1L)
  }
}
