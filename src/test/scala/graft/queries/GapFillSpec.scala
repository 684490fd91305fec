package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q140's resample contract on a constructed sparse series: the grid is
  * dense over the GLOBAL bounds, fills carry the last observed value, and
  * staleness ages count from the last observation.
  */
class GapFillSpec extends SparkSpec {

  test("gaps fill forward with correct staleness; pre-first-observation hours stay null") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("gap-fill")
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime

    // type A observed in hours 0, 1, 5 (values 1.0, 2.0, 7.0);
    // type B observed in hour 2 only — the global grid is hours 0..5
    val rows = Seq(
      ("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 5L, 7.0), ("b", 2L, 3.5))
    rows.zipWithIndex.map { case ((t, h, v), i) =>
      (i.toLong, new java.sql.Timestamp(base + h * 3600000L), i.toLong % 3, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val out = EventQueries.q140GapFill(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1) - base / 3600000L, r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))

    assert(out.length == 12) // 2 types x 6 grid hours
    val a = out.filter(_._1 == "a").sortBy(_._2)
    // observed hours carry their own sum with age 0
    assert(a(0) == ("a", 0L, 1L, Some(100L), Some(0L)))
    assert(a(1) == ("a", 1L, 1L, Some(200L), Some(0L)))
    assert(a(5) == ("a", 5L, 1L, Some(700L), Some(0L)))
    // the hour-2..4 gap carries hour 1's value with growing staleness
    assert(a(2) == ("a", 2L, 0L, Some(200L), Some(1L)))
    assert(a(3) == ("a", 3L, 0L, Some(200L), Some(2L)))
    assert(a(4) == ("a", 4L, 0L, Some(200L), Some(3L)))
    val b = out.filter(_._1 == "b").sortBy(_._2)
    // before type B's first observation the fill and age are NULL
    assert(b(0) == ("b", 0L, 0L, None, None))
    assert(b(1) == ("b", 1L, 0L, None, None))
    assert(b(2) == ("b", 2L, 1L, Some(350L), Some(0L)))
    assert(b(5) == ("b", 5L, 0L, Some(350L), Some(3L)))
  }
}
