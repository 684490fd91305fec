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

    newParts.foreach { f =>
      Files.move(f.toPath, Paths.get(dir, f.getName), StandardCopyOption.ATOMIC_MOVE)
    }
    parts.foreach(_.delete())
    Files.deleteIfExists(manifest)
    graft.util.FsUtil.deleteRecursively(new File(tmp))
    CompactionStats(parts.length, newParts.length, before)
  }

  /** Swap-consistent sink read. With no manifest present this is a plain
    * parquet read of the listed part files. While a swap manifest exists,
    * the NEW file set is authoritative — every NEW file is verified
    * complete (row-count checked) before the manifest is written, and each
    * one lives either already in `dir` or still in the staging dir — so a
    * reader landing ANYWHERE between the manifest write and the final
    * cleanup sees exactly the after-rows; it never sees a mix of OLD and
    * NEW, and never an empty half-swapped directory. The manifest is
    * re-checked after listing so a swap that STARTS mid-listing triggers a
    * retry instead of serving a torn snapshot. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val manifest = Paths.get(dir, SwapManifest)
    def manifestLines(): Option[Seq[String]] =
      try { if (Files.exists(manifest)) Some(Files.readAllLines(manifest).toArray(Array.empty[String]).toSeq) else None }
      catch { case _: java.io.IOException => None } // deleted between check and read -> swap done
    var attempt = 0
    while (attempt < 8) {
      attempt += 1
      manifestLines() match {
        case Some(lines) =>
          val tmp = lines.find(_.startsWith("TMP ")).get.substring(4)
          val paths = lines.collect { case l if l.startsWith("NEW ") =>
            val name = l.substring(4)
            // moves go tmp -> dir only: a file seen in dir stays in dir
            val inDir = Paths.get(dir, name)
            if (Files.exists(inDir)) inDir.toString else Paths.get(tmp, name).toString
          }
          return spark.read.parquet(paths: _*)
        case None =>
          val parts = Option(new File(dir).listFiles()).getOrElse(Array.empty)
            .filter(f => f.isFile && f.getName.startsWith("part-"))
          if (manifestLines().isEmpty) // no swap began while we listed
            return if (parts.isEmpty) spark.read.parquet(dir)
            else spark.read.parquet(parts.map(_.getPath).toSeq: _*)
      }
    }
    throw new IllegalStateException(
      s"sink '$dir': swap manifest kept changing across $attempt read attempts")
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
        val staged = Paths.get(tmp, name)
        if (Files.exists(staged))
          Files.move(staged, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
      } else if (l.startsWith("OLD ")) {
        Files.deleteIfExists(Paths.get(dir, l.substring(4))); ()
      }
    }
    Files.deleteIfExists(manifest)
    graft.util.FsUtil.deleteRecursively(new File(tmp))
    true
  }
}
