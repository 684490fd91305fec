package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The state-lifecycle behavior q163's long-delay gate deliberately
  * suppresses, demonstrated deterministically: a duplicate INSIDE the
  * watermark delay is dropped, a duplicate arriving AFTER its key's state
  * evicted re-emits (the bounded-state / at-least-once dedup contract).
  */
class StreamDedupTtlSpec extends SparkSpec {

  test("in-delay duplicates drop; post-eviction duplicates re-emit") {
    val s = spark
    import s.implicits._
    val root = tmpDir("dedup-ttl")
    val srcDir = s"$root/src"
    Files.createDirectories(Paths.get(srcDir))
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime

    def line(key: String, ms: Long): String =
      s"""{"ts":"${new java.sql.Timestamp(ms)}","k":"$key"}"""
    def writeBatch(name: String, mtime: Long, lines: Seq[String]): Unit = {
      val p = Paths.get(srcDir, name)
      Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val H = 3600000L
    // batch 1: A and B at t0
    writeBatch("b1.txt", 1000000L, Seq(line("A", t0), line("B", t0)))
    // batch 2: duplicate A inside the 2h delay (dropped — the access also
    // extends A's expiry to t0+3h, the TTL-on-last-occurrence rule) + C
    // far ahead so the NEXT batch runs with watermark t0+8h
    writeBatch("b2.txt", 2000000L, Seq(line("A", t0 + 1 * H), line("C", t0 + 10 * H)))
    // batch 3: filler D — this batch executes with watermark t0+8h, which
    // passes A's expiry; state eviction lands at the batch boundary
    writeBatch("b3.txt", 3000000L, Seq(line("D", t0 + 11 * H)))
    // batch 4: A again, above the watermark, state gone -> RE-EMITS
    writeBatch("b4.txt", 4000000L, Seq(line("A", t0 + 12 * H)))

    val src = s.readStream.schema("value STRING")
      .option("maxFilesPerTrigger", "1")
      .text(srcDir)
      .select(from_json($"value",
        org.apache.spark.sql.types.StructType.fromDDL("ts TIMESTAMP, k STRING")).as("e"))
      .select($"e.ts", $"e.k")
    src.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("k")
      .select($"k")
      .writeStream.format("parquet").outputMode("append")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()

    val out = s.read.schema("k STRING").parquet(s"$root/out")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("A", "A", "B", "C", "D"),
      s"expected A re-emitted after eviction, B/C/D once, A's in-delay dup dropped; got $out")
  }
}
