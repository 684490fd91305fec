package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *  - a directory listing taken mid-swap mixes OLD and NEW files; readers
  *    that may overlap a compaction must go through [[read]], which serves
  *    a consistent snapshot off the swap manifest (exactly-before or
  *    exactly-after, never a mix — a commit-log table format generalizes
  *    the same idea). Downstream streaming file-source checkpoints treat
  *    compacted files as new input either way.
  */
object SinkMaintenance {

  final case class CompactionStats(filesBefore: Int, filesAfter: Int, rows: Long)

  /** Name of the swap manifest written (underscore-prefixed, so Spark
    * readers ignore it) before any destructive step of the file swap. */
  private[streaming] val SwapManifest = "_graft_compaction_swap"

  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    recoverSwap(dir) // finish any swap a previous crash interrupted
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

    val newParts = Option(new File(tmp).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))

    // Crash-safe swap: write a manifest FIRST, then move the compacted
    // files in (their job-UUID names cannot collide with the old ones),
    // then delete the old parts, then drop the manifest. A crash at any
    // point leaves either the untouched sink (manifest not yet written) or
    // a state [[recoverSwap]] completes idempotently on the next call —
    // the sink is never left empty (the pre-fix ordering deleted the old
    // files before moving the new ones in, losing the sink if the process
    // died between the two steps).
    val manifest = Paths.get(dir, SwapManifest)
    val lines = Seq(s"TMP $tmp") ++
      newParts.map(f => s"NEW ${f.getName}") ++ parts.map(f => s"OLD ${f.getName}")
    // write-then-rename: the manifest appears ATOMICALLY complete or not at
    // all — a crash mid-write must not leave a truncated step list for
    // recovery to half-apply
    val staging = Paths.get(dir, SwapManifest + ".tmp")
    Files.writeString(staging, lines.mkString("\n"))
    Files.move(staging, manifest, StandardCopyOption.ATOMIC_MOVE)

    // moveIfPresent, not a bare move: a concurrent [[read]] that saw the
    // manifest may be completing these very steps (see recoverSwap)
    newParts.foreach(f => moveIfPresent(f.toPath, Paths.get(dir, f.getName)))
    parts.foreach(_.delete())
    Files.deleteIfExists(manifest)
    graft.util.FsUtil.deleteRecursively(new File(tmp))
    CompactionStats(parts.length, newParts.length, before)
  }

  /** Swap-consistent sink read: COMPLETE any visible swap, then read.
    *
    * A manifest is only ever written after the NEW file set is fully
    * staged and row-count verified, so a reader that observes one can
    * always roll the swap FORWARD itself ([[recoverSwap]] is idempotent
    * and, via [[moveIfPresent]], tolerant of a concurrent compactor
    * completing the same steps). After that the directory holds exactly
    * the after-files; before any manifest exists it holds exactly the
    * before-files — a reader therefore never observes a mixed or empty
    * half-swapped directory, whether the swap was abandoned by a crash or
    * is progressing concurrently. (A NEW compaction starting between this
    * call and the returned DataFrame's execution is the same exposure as
    * any listing-based reader; serial maintenance per sink is assumed.) */
  def read(spark: SparkSession, dir: String): DataFrame = {
    recoverSwap(dir)
    spark.read.parquet(dir)
  }

  /** Idempotently finish a swap interrupted by a crash: re-apply every step
    * recorded in the manifest (moves of staged files that still exist,
    * deletes of old files that still exist), then clear the manifest and
    * staging dir. Safe to call when no manifest exists (no-op). */
  private[streaming] def recoverSwap(dir: String): Boolean = {
    val manifest = Paths.get(dir, SwapManifest)
    if (!Files.exists(manifest)) return false
    val lines = Files.readAllLines(manifest)
    val tmp = lines.stream.filter(_.startsWith("TMP ")).findFirst.get.substring(4)
    lines.forEach { l =>
      if (l.startsWith("NEW ")) {
        val name = l.substring(4)
        moveIfPresent(Paths.get(tmp, name), Paths.get(dir, name))
      } else if (l.startsWith("OLD ")) {
        Files.deleteIfExists(Paths.get(dir, l.substring(4))); ()
      }
    }
    Files.deleteIfExists(manifest)
    graft.util.FsUtil.deleteRecursively(new File(tmp))
    true
  }

  /** Move `src` to `dst` if present; a concurrent actor having already
    * performed this exact move (src gone, dst in place) is success, any
    * other disappearance is a real error. */
  private def moveIfPresent(src: java.nio.file.Path, dst: java.nio.file.Path): Unit =
    try { if (Files.exists(src)) { Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE); () } }
    catch { case _: java.nio.file.NoSuchFileException if Files.exists(dst) => () }
}
