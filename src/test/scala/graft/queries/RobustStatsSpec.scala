package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** Independent references for the late-round-12 statistics family:
  * q197 must LOCALIZE a planted level shift at exactly the planted day,
  * q201 must equal a brute-force weighted median, q202 must reproduce
  * hand-computed linear interpolation and pass observed days through
  * untouched, and q195's cohort curves must conserve total revenue.
  */
class RobustStatsSpec extends SparkSpec {

  test("q197 localizes a planted level shift at the planted day") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("chgpt")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 25 days at 20/day, then 35 days at 60/day: the optimal split of the
    // scaled contrast is the last quiet day (t = 25, day index 24)
    val counts = (0 until 60).map(d => if (d < 25) 20 else 60)
    val rows = for {
      (c, d) <- counts.zipWithIndex
      i <- 0 until c
    } yield (d * 1000L + i, new Timestamp(base + d * 86400000L + i * 1000L),
      i.toLong, "click", 0.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val out = EventQueries.q197Changepoint(spark, dir).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "2024-01-25") // the last quiet day: the split puts days 1..25 left, 26..60 right
    assert(out(0).getLong(2) == 25L)
  }

  test("q201 equals the brute-force weighted median") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("wmed")
    val rows = (1L to 500L).map { i =>
      (i, i % 7, (i % 13 + 1).toDouble, ((i * 31) % 997 + 1).toDouble,
        Seq("A", "N", "R")((i % 3).toInt), "O",
        new Timestamp(0L), 0.0, 0.0, "x")
    }
    rows.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_linestatus", "l_shipdate", "l_discount", "l_tax",
      "l_comment").write.parquet(s"$dir/lineitem.parquet")

    val out = CoreQueries.q201WeightedMedian(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // brute force: expand each (q, w) and walk the sorted list
    val expected = rows.groupBy(_._5).map { case (flag, rs) =>
      val cells = rs.groupBy(_._3.toLong).map { case (q, v) =>
        q -> v.map(r => math.floor(r._4 * 100 + 0.5).toLong).sum
      }.toSeq.sortBy(_._1)
      val tot = cells.map(_._2).sum
      var cum = 0L
      flag -> cells.collectFirst {
        case (q, w) if { cum += w; 2 * cum >= tot } => q
      }.get
    }
    assert(out == expected)
  }

  test("q202 reproduces hand-computed interpolation; observed days pass through") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("interp")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // observations only on days where (d*d) % 5 < 2: {0,1,4,5,6,9,10,11,...}
    // give day d the value 100·d so linearity is exact and checkable
    val rows = (0 until 15).filter(d => (d * d) % 5 < 2).map { d =>
      (d.toLong, new Timestamp(base + d * 86400000L), 0L, "click",
        d * 100.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val out = EventQueries.q202Interpolate(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // value(d) = 100·d·100 (e2); on a linear series interpolation is exact
    for ((day, v, _) <- out)
      assert(v == day * 10000L, s"day $day: $v")
    val interp = out.filter(_._3 == 1L).map(_._1)
    assert(interp.nonEmpty && interp.forall(d => (d * d) % 5 >= 2))
  }

  test("q195 cohort curves conserve total revenue") {
    val dir = "/root/testdata/sf0.001"
    val s = spark
    import s.implicits._
    val out = EventQueries.q195CohortLtv(spark, dir)
    val sumCurve = out.groupBy($"cohort").agg(
        org.apache.spark.sql.functions.max($"cum_rev_e2").as("m"))
      .agg(org.apache.spark.sql.functions.sum($"m")).collect()(0).getLong(0)
    val total = graft.Tables.orders(spark, dir)
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.floor($"o_totalprice" * 100 + 0.5)
          .cast("long"))).collect()(0).getLong(0)
    assert(sumCurve == total, s"$sumCurve != $total")
  }
}
