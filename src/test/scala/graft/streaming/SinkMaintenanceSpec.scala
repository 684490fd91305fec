package graft.streaming

import graft.SparkSpec

class SinkMaintenanceSpec extends SparkSpec {

  test("compaction merges per-batch small files, preserves rows, and is idempotent") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("compact") + "/sink"
    // simulate 20 micro-batch appends -> 20 small files
    for (b <- 1 to 20)
      Seq((b.toLong, s"batch-$b")).toDF("id", "tag")
        .coalesce(1).write.mode("append").parquet(dir)
    val before = spark.read.parquet(dir)
    assert(before.inputFiles.length === 20)
    val data = before.collect().map(_.toString).sorted

    val stats = SinkMaintenance.compact(spark, dir, targetFileBytes = 1024L * 1024)
    assert(stats.filesBefore === 20 && stats.filesAfter === 1 && stats.rows === 20L)
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length === 1)
    assert(after.collect().map(_.toString).sorted === data)

    // already compact -> no-op
    val again = SinkMaintenance.compact(spark, dir, targetFileBytes = 1024L * 1024)
    assert(again.filesBefore === 1 && again.filesAfter === 1)
  }
}
