package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hot-key skew posture check for the per-key window queries (q16/q20): one
  * user owns half the table. The window shuffle puts that whole key in one
  * partition — the documented skew note — and the queries must stay correct
  * and complete (AQE handles the partition-size imbalance; a per-key window
  * cannot be split without changing semantics). */
class SkewSpec extends SparkSpec {

  test("q16/q20 stay correct under a hot key owning half the events table") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("skew")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

    // hot user 1: 50k events, 1 min apart -> one 50k-event session;
    // alternating click/purchase so the interval join sees the hot key too
    val hot = spark.range(0, 50000).select(
      ($"id" + 1000000L).as("event_id"),
      timestamp_millis(lit(base) + $"id" * 60000L).as("ts"),
      lit(1L).as("user_id"),
      when($"id" % 2 === 0, lit("click")).otherwise(lit("purchase")).as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
    // cold users 2..101: 50 events each, 1 h apart -> 50 one-event sessions
    val cold = spark.range(0, 100 * 50).select(
      ($"id" + 2000000L).as("event_id"),
      timestamp_millis(lit(base) + ($"id" % 50) * 3600000L).as("ts"),
      (($"id" / 50) + 2L).cast("long").as("user_id"),
      lit("view").as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
    hot.unionByName(cold).write.parquet(s"$dir/events.parquet")

    val q20 = EventQueries.q20Sessionize(spark, dir)
    val hotRow = q20.filter($"user_id" === 1L).collect()
    assert(hotRow.length === 1, "hot user must collapse into ONE session")
    assert(hotRow(0).getLong(2) === 50000L)
    assert(q20.count() === 1L + 100L * 50L)

    val q16 = EventQueries.q16CdcLatest(spark, dir)
    assert(q16.count() === 101L) // one latest row per user
    val hotLatest = q16.filter($"user_id" === 1L).collect()(0).getLong(1)
    assert(hotLatest === 1000000L + 49999L) // the max-ts event wins

    // q46 interval join: the hot key's entire pair expansion lands in one
    // join partition. Purchase at odd minute i pairs with clicks (even j)
    // in [i-60, i]: 30 for i>=61, (i+1)/2 for i<60 ->
    // sum_{k=1..30} k + 24970*30 = 749565 pairs, all from user 1
    val q46 = EventQueries.q46IntervalJoin(spark, dir)
    assert(q46.filter($"click_ms" > $"purchase_ms" ||
      $"click_ms" < $"purchase_ms" - 3600000L).count() === 0L)
    assert(q46.count() === 749565L)

    // q51 range frame: one row per event; the hot user's steady-state
    // trailing-hour frame is 61 events (current + 60 preceding minutes)
    val q51 = EventQueries.q51RangeFrame(spark, dir)
    assert(q51.count() === 55000L)
    assert(q51.filter($"user_id" === 1L)
      .agg(max($"trailing_hour_n")).collect()(0).getLong(0) === 61L)
  }

  test("q101 salted join: hot key spreads across all R salts, result R-invariant") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("skewjoin")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // hot user 1 owns 50k of 55k events; customers 1..100
    val hot = spark.range(0, 50000).select(
      ($"id" + 1000000L).as("event_id"),
      timestamp_millis(lit(base) + $"id" * 1000L).as("ts"),
      lit(1L).as("user_id"),
      lit("click").as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
    val cold = spark.range(0, 100 * 50).select(
      ($"id" + 2000000L).as("event_id"),
      timestamp_millis(lit(base) + $"id" * 1000L).as("ts"),
      (($"id" % 100) + 1L).cast("long").as("user_id"),
      lit("view").as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
    hot.unionByName(cold).write.parquet(s"$dir/events.parquet")
    spark.range(1, 101).select(
      $"id".as("c_custkey"),
      concat(lit("Customer#"), $"id").as("c_name"),
      lit("addr").as("c_address"),
      ($"id" % 25).cast("long").as("c_nationkey"),
      lit("p").as("c_phone"),
      lit(0.0).as("c_acctbal"),
      element_at(array(lit("BUILDING"), lit("MACHINERY")),
        ($"id" % 2 + 1).cast("int")).as("c_mktsegment"),
      lit("c").as("c_comment"))
      .write.parquet(s"$dir/customer.parquet")

    // the exchange-splitting claim: the hot key's fact rows occupy ALL 8
    // (key, salt) groups, i.e. no single task owns user 1's row set
    val salted = graft.Tables.events(spark, dir)
      .select($"user_id", pmod(xxhash64($"event_id"), lit(8L)).as("salt"))
      .filter($"user_id" === 1L)
      .groupBy($"salt").count().collect()
    assert(salted.length === 8, "hot key must land in all 8 salt groups")
    // the per-row salt source is near-uniform: no salt group owns more
    // than 2x its fair share of the hot key
    assert(salted.map(_.getLong(1)).max <= 2L * 50000 / 8)

    // semantic gate: salted (R=8) == degenerate (R=1) == plain join
    val r8 = EventQueries.q101SaltedJoinWith(spark, dir, salts = 8).collect().toSeq
    val r1 = EventQueries.q101SaltedJoinWith(spark, dir, salts = 1).collect().toSeq
    assert(r8 === r1)
    // user 1 is odd -> MACHINERY; all 50k hot clicks survive the join intact
    val hotRow = r8.find(r => r.getString(1) == "click").get
    assert(hotRow.getString(0) === "MACHINERY")
    assert(hotRow.getLong(2) === 50000L)
  }

  test("q55/q57 stay correct under a hot stratum owning most of the corpus") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("skewdocs")
    // en owns 20k docs (10 tokens each); the other four strata 100 each
    val hot = spark.range(0, 20000).select(
      $"id".as("doc_id"),
      lit((1 to 10).map(i => s"w$i").mkString(" ")).as("text"),
      lit("en").as("lang"))
    val cold = spark.range(0, 400).select(
      ($"id" + 100000L).as("doc_id"),
      lit("x y z").as("text"),
      element_at(array(lit("zh"), lit("es"), lit("de"), lit("fr")),
        ($"id" % 4 + 1).cast("int")).as("lang"))
    hot.unionByName(cold).write.parquet(s"$dir/documents.parquet")

    // q55: the hot stratum's cumulative window lands in one partition but
    // must stay exact: 20k docs x 10 tokens / 2048-token shards
    val q55 = TextQueries.q55PackShards(spark, dir)
    val enShards = q55.filter($"lang" === "en")
      .agg(max($"shard_id"), count(lit(1))).collect()(0)
    assert(enShards.getLong(1) === 20000L)
    assert(enShards.getLong(0) === (20000L * 10 - 10) / 2048) // last doc's shard
    // q57: zh/es/de/fr bind at 100/0.125 = 800 -> en quota 400, others 100
    val q57 = TextQueries.q57MixtureSample(spark, dir)
    val byLang = q57.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("en" -> 400L, "zh" -> 100L, "es" -> 100L,
      "de" -> 100L, "fr" -> 100L))
  }
}
