package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q145's boundary rule and q146's regression closed form on constructed
  * inputs with hand-computable answers.
  */
class SceneTrendSpec extends SparkSpec {

  test("scene cuts fire exactly at energy jumps; flat media yield none") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("scene-cuts")
    // sampled frames are 64-byte windows at indices 0, 4, 8, ... — 256
    // chars of 'z' (mean 122) then 256 of '!' (mean 33) puts the jump at
    // sampled frame 4; doc 1 is flat 'm' throughout (no cuts)
    val jump = "z" * 256 + "!" * 256
    val flat = "m" * 512
    Seq((0L, jump, "en", "spec", jump.length.toLong),
      (1L, flat, "en", "spec", flat.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = MultimodalQueries.q145SceneCuts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly one cut: media 0, sampled frame 4, |122 - 33| = 89/byte
    assert(out.toSeq == Seq((0L, 4L, 89000000L)))
  }

  test("grouped OLS recovers an exact linear series; singleton groups export NULL") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("group-trend")
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    // type "lin": hourly counts 3, 5, 7, 9 (y = 2x + 3 exactly);
    // type "one": a single observed hour -> NULL slope/intercept
    val lin = (0 until 4).flatMap(x => Seq.fill(3 + 2 * x)(x))
    val rows = lin.map(x => ("lin", x.toLong)) :+ (("one", 0L))
    rows.zipWithIndex.map { case ((t, h), i) =>
      (i.toLong, new java.sql.Timestamp(base + h * 3600000L + (i % 60) * 1000L),
        i.toLong % 5, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = EventQueries.q146GroupTrend(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out("lin") == ((4L, Some(2000000L), Some(3000000L))))
    assert(out("one") == ((1L, None, None)))
  }
}
