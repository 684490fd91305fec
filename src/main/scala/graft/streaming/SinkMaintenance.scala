package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Maintenance for append sinks: micro-batch delivery produces one-file-
  * per-batch layouts, and at streaming cadence that means millions of tiny
  * files — the classic small-files problem. Compaction rewrites a sink
  * directory into ~`targetFileBytes` files.
  *
  * Scale/semantics notes:
  *  - the rewrite is a distributed read → repartition → write; only the
  *    final file swap is driver-side (renames, O(#files) metadata ops);
  *  - row count is verified BEFORE the swap — a failed compaction leaves
  *    the sink untouched;
  *  - the swap is not transactional for concurrent READERS (a real
  *    deployment puts a commit-log table format in front); run compaction
  *    on terminal sinks or in the consumer's maintenance window, and note
  *    that downstream streaming file-source checkpoints treat compacted
  *    files as new input.
  */
object SinkMaintenance {

  final case class CompactionStats(filesBefore: Int, filesAfter: Int, rows: Long)

  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    val root = new File(dir)
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    val totalBytes = parts.map(_.length()).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (parts.length <= targetFiles)
      return CompactionStats(parts.length, parts.length,
        spark.read.parquet(dir).count())

    val tmp = dir + ".compact-tmp"
    val df = spark.read.parquet(dir)
    val before = df.count()
    df.repartition(targetFiles).write.mode("overwrite").parquet(tmp)
    val after = spark.read.parquet(tmp).count()
    require(after == before, s"compaction row mismatch: $before -> $after; sink untouched")

    // swap: drop old part files, move compacted ones in
    parts.foreach(_.delete())
    val newParts = Option(new File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    newParts.foreach { f =>
      Files.move(f.toPath, Paths.get(dir, f.getName), StandardCopyOption.ATOMIC_MOVE)
    }
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(new File(tmp))
    CompactionStats(parts.length, newParts.length, before)
  }
}
