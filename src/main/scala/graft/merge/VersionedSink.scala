package graft.merge

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned latest-wins merge sink with TIME-TRAVEL reads — the
  * point-in-time query capability of the reference's warehouse ("query a
  * table as of an earlier state") rebuilt on the [[MergeSink]] layout, in
  * the lakehouse-manifest style (Delta/Iceberg's public recipe): data
  * files are IMMUTABLE and manifests pin which files each version sees.
  *
  *  - Every merge writes its rewritten buckets into a FRESH version
  *    directory `data/v=<n>/__part=<p>/…` — never touching earlier
  *    versions' files (contrast MergeSink's dynamic overwrite, which
  *    reclaims space eagerly but forfeits history).
  *  - A manifest per version maps each bucket to the version that last
  *    rewrote it. `read(v)` unions, per writer version, only the buckets
  *    that version still owns at v — partition-pruned directory reads, no
  *    file listing of untouched history.
  *  - Crash safety: data first, manifest last via atomic rename — a crash
  *    between the two leaves an orphan data dir that the NEXT merge of the
  *    same version number simply overwrites; no manifest ever references
  *    half-written files.
  *  - `vacuum(retain)` deletes version directories no retained manifest
  *    references, making the storage cost a policy knob (the warehouse's
  *    time-travel window), not an unbounded tax.
  *
  * Scale shape: identical to MergeSink's — a merge reads and rewrites ONLY
  * the buckets its batch touches (change-volume cost at 100 TB); a
  * time-travel read costs the same as a current read (≤ numBuckets
  * directory reads either way); manifests are O(numBuckets) text lines.
  */
final class VersionedSink(
    spark: SparkSession,
    tableDir: String,
    keyCol: String,
    orderCols: Seq[String],
    numBuckets: Int = 64) {

  private val partCol = "__part"
  private def manifestDir: Path = Paths.get(tableDir, "_manifests")
  private def dataDir(v: Int): String = s"$tableDir/data/v=$v"

  private def withPart(df: DataFrame): DataFrame =
    df.withColumn(partCol, pmod(xxhash64(col(keyCol)), lit(numBuckets)))

  /** Newest committed version; 0 = empty table. */
  def currentVersion: Int =
    if (!Files.exists(manifestDir)) 0
    else Files.list(manifestDir).iterator().asScala
      .flatMap(p => "^v(\\d+)\\.manifest$".r.findFirstMatchIn(p.getFileName.toString))
      .map(_.group(1).toInt).foldLeft(0)(math.max)

  /** bucket → version that last rewrote it, as of `version`. */
  private def writers(version: Int): Map[Long, Int] = {
    require(version >= 1 && version <= currentVersion,
      s"version $version outside [1, $currentVersion]")
    require(Files.exists(manifestDir.resolve(f"v$version%05d.manifest")),
      s"version $version has been vacuumed (outside the retained window)")
    Files.readAllLines(manifestDir.resolve(f"v$version%05d.manifest")).asScala
      .filter(_.nonEmpty)
      .map { line =>
        val Array(b, w) = line.split(','); b.toLong -> w.toInt
      }.toMap
  }

  /** Merge one batch (latest row per key wins — MergeSink's exact winner
    * rule, content-hash tie-break included) into version
    * `currentVersion + 1`. Returns the new version number. */
  def merge(batch: DataFrame): Int = {
    val cur = currentVersion
    val next = cur + 1
    // A/B dial shared with MergeSink (default ON): the off leg is the r18
    // localCheckpoint path
    val stageSwap = spark.conf
      .getOption("spark.graft.merge.stageswap").forall(_.toBoolean)
    // two consumers (touched probe + merge union): persist so an expensive
    // batch source is evaluated once — see MergeSink.merge
    val newPart0 = withPart(batch)
    val persistBatch = spark.conf
      .getOption("spark.graft.merge.persistbatch").forall(_.toBoolean)
    val newPart = if (persistBatch)
      newPart0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else newPart0
    try {
      val touched = newPart.select(partCol).distinct()
        .collect().map(_.getLong(0)).toSet // bounded by numBuckets — driver-safe
      if (touched.isEmpty) return cur

      val existing =
        if (cur == 0) None
        else {
          val touchedWriters = writers(cur).filter { case (b, _) => touched(b) }
          readOwned(touchedWriters)
        }
      val all = existing.map(_.unionByName(newPart)).getOrElse(newPart)

      val hashable = all.schema.fields.toIndexedSeq
        .filter(f => !MergeSink.hasMap(f.dataType))
        .map(_.name).sorted.map(c => col(c))
      val contentHash =
        if (hashable.nonEmpty) xxhash64(hashable: _*) else lit(0L)
      // latest-wins as a COMBINABLE max_by aggregate — same winner as the
      // historical per-key window, pre-reduced map-side (see
      // MergeSink.merge for the ordering-equivalence argument)
      val ordKey = struct(orderCols.map(c => col(c)) :+ contentHash: _*)
      // no localCheckpoint (unlike MergeSink's historical need): every merge
      // writes a FRESH version directory, so the write target is never also
      // a read source of this plan — the winners stream straight to parquet,
      // computed exactly once
      val maxBy = spark.conf
        .getOption("spark.graft.merge.maxby").forall(_.toBoolean)
      val merged0 = if (maxBy)
        all.groupBy(col(keyCol))
          .agg(max_by(struct(all.columns.map(col): _*), ordKey).as("__w"))
          .select(col("__w.*"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))
          .orderBy(orderCols.map(c => col(c).desc) :+ contentHash.desc: _*)
        all.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
      val merged = if (stageSwap) merged0 else merged0.localCheckpoint(true)

      // data first (an orphan dir from a crashed attempt is overwritten),
      // manifest last and atomically — the commit point
      merged.write.partitionBy(partCol)
        .mode(SaveMode.Overwrite).parquet(dataDir(next))
      val newWriters =
        (if (cur == 0) Map.empty[Long, Int] else writers(cur)) ++
          touched.iterator.map(_ -> next)
      Files.createDirectories(manifestDir)
      val tmp = manifestDir.resolve(f".v$next%05d.tmp")
      Files.write(tmp, newWriters.toSeq.sortBy(_._1)
        .map { case (b, v) => s"$b,$v" }.mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, manifestDir.resolve(f"v$next%05d.manifest"),
        StandardCopyOption.ATOMIC_MOVE)
      next
    } finally if (persistBatch) newPart.unpersist(blocking = false)
  }

  /** Union of each writer version's still-owned buckets. */
  private def readOwned(byBucket: Map[Long, Int]): Option[DataFrame] = {
    if (byBucket.isEmpty) return None
    val parts = byBucket.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (writer, buckets) =>
        spark.read.parquet(dataDir(writer))
          .filter(col(partCol).isin(buckets.keys.toSeq: _*))
    }
    Some(parts.reduce(_ unionByName _))
  }

  /** The table AS OF `version` (time travel); `read()` = current state. */
  def read(version: Int): DataFrame =
    readOwned(writers(version))
      .getOrElse(spark.emptyDataFrame)
      .drop(partCol)

  def read(): DataFrame = read(currentVersion)

  /** Drop version directories referenced by NO manifest newer than
    * `currentVersion - retain` (the retained time-travel window). Deleted
    * versions' manifests go too — older reads then fail loudly instead of
    * returning partial data. Returns the dropped version numbers. */
  def vacuum(retain: Int): Seq[Int] = {
    val cur = currentVersion
    val keepFrom = math.max(1, cur - retain + 1)
    val live = (keepFrom to cur).flatMap(v => writers(v).values).toSet
    val dropped = (1 until keepFrom).filterNot(live)
    for (v <- dropped) {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).iterator().asScala.toSeq.foreach(rm)
        Files.deleteIfExists(p)
      }
      rm(Paths.get(dataDir(v)))
    }
    for (v <- 1 until keepFrom)
      Files.deleteIfExists(manifestDir.resolve(f"v$v%05d.manifest"))
    dropped
  }
}
