package graft.merge

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Datastream-parity merge path (SURVEY.md §2 O25/O26): batch backfill ∪
  * streaming CDC tail, applied to the sink as LATEST-CHANGE-WINS per key —
  * the sink table converges to the source (upsert), in contrast to the
  * append-only subscription sink.
  *
  * Layout: the merged table is hash-partitioned into `numBuckets` key
  * buckets (`part=pmod(xxhash64(key), n)` directory partitions). Each merge
  * batch rewrites ONLY the buckets its keys touch (dynamic partition
  * overwrite), reading back just those buckets for the merge — at 100 TB a
  * micro-batch touching 0.1% of keys rewrites ~0.1% of the table, not all
  * of it. Within a rewrite, the merge itself is one combinable per-key
  * `max_by` aggregate picking the same winner as the `row_number`
  * latest-wins window the batch-twin query q16 verifies against DuckDB.
  */
final class MergeSink(
    spark: SparkSession,
    tableDir: String,
    keyCol: String,
    orderCols: Seq[String],
    numBuckets: Int = 64,
    tombstoneCol: Option[String] = None) {

  private val partCol = "__part"

  private def withPart(df: DataFrame): DataFrame =
    df.withColumn(partCol, pmod(xxhash64(col(keyCol)), lit(numBuckets)))

  /** Merge one batch of change rows into the table: latest row per key wins,
    * ordering by `orderCols` (e.g. change timestamp, then a unique change id)
    * — all compared descending. When `orderCols` still tie (the caller has
    * no unique change id), a content hash of the FULL row breaks the tie, so
    * the winner is a pure function of row content — never of batch order or
    * partition layout. Idempotent AND deterministic: re-applying a batch, or
    * applying the same rows in any order, yields the identical table state.
    * (Two fully identical rows tie harmlessly: either one is the same row.) */
  def merge(batch: DataFrame): Unit = {
    val spark = this.spark
    // A/B dial for the staged-swap write path below (default ON); the off
    // leg is the r18 localCheckpoint + dynamic-partition-overwrite path
    val stageSwap = spark.conf
      .getOption("spark.graft.merge.stageswap").forall(_.toBoolean)
    // the batch has two consumers (the touched-bucket probe and the merge
    // union) — persist so an expensive batch source (a parsed JSON
    // micro-batch, a computed change set) is evaluated once, not twice
    val newPart0 = withPart(batch)
    val persistBatch = spark.conf
      .getOption("spark.graft.merge.persistbatch").forall(_.toBoolean)
    val newPart = if (persistBatch)
      newPart0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else newPart0
    try {
      val touched = newPart.select(partCol).distinct()
        .collect().map(_.getLong(0)) // bounded by numBuckets — driver-safe
      if (touched.isEmpty) return

      // existence through the Hadoop FileSystem for tableDir's scheme:
      // java.io.File is local-only and would report HDFS/S3 state absent
      val tablePath = new org.apache.hadoop.fs.Path(tableDir)
      val fs = tablePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val existingOpt =
        if (fs.exists(tablePath))
          // mergeSchema: earlier generations may lack columns a later batch
          // introduced (schema evolution on the merge path — q257's gate);
          // the footer-merged read null-fills them
          Some(spark.read.option("mergeSchema", "true").parquet(tableDir)
            .filter(col(partCol).isin(touched.toSeq: _*)))
        else None
      // allowMissingColumns both ways: a batch may ADD a column (old rows
      // null-fill) or OMIT one the table already has (new rows null-fill) —
      // the lakehouse evolution contract, never a hard failure mid-stream
      val all = existingOpt
        .map(_.unionByName(newPart, allowMissingColumns = true))
        .getOrElse(newPart)

      // column order fixed by name so the hash is layout-independent; map-typed
      // columns are excluded (unhashable — their iteration order is undefined,
      // which is also why they could never break ties deterministically)
      val hashable = all.schema.fields.toIndexedSeq
        .filter(f => !MergeSink.hasMap(f.dataType))
        .map(_.name).sorted.map(c => col(c))
      val contentHash =
        if (hashable.nonEmpty) xxhash64(hashable: _*) else lit(0L)
      // latest-wins as a COMBINABLE aggregate (r20, guide §2.3 "aggregate
      // before you shuffle"; the r19 verdict asked the batch side to be
      // pre-reduced before the per-key window — the max_by form gets that
      // for free as map-side partial aggregation, so a batch carrying many
      // changes per key ships one partial winner per key per map task
      // instead of every row into a per-key sort): the winner under
      // `row_number() OVER (PARTITION BY key ORDER BY orderCols DESC,
      // hash DESC) = 1` is exactly the row whose (orderCols, hash) tuple
      // is the lexicographic MAX — desc ordering puts NULL last, struct
      // comparison puts NULL first ascending, so the two agree on the
      // winner (identical full-row ties are the same row either way).
      val ordKey = struct(orderCols.map(c => col(c)) :+ contentHash: _*)
      // A/B dial (default ON, same discipline as stageswap): the off leg
      // is the r19 row_number window form — MergeSinkSpec pins the two
      // forms pick the same winner
      val maxBy = spark.conf
        .getOption("spark.graft.merge.maxby").forall(_.toBoolean)
      val merged = if (maxBy)
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

      // stage + swap instead of localCheckpoint + dynamic overwrite: the
      // checkpoint existed only because the table dir is also a read source
      // of the merge plan. Writing the winners to a SIBLING staging dir
      // computes the merge exactly once (no block materialization + block
      // re-read on the write path — one fewer job and one fewer pass over
      // the touched buckets), then each touched bucket dir swaps in with
      // filesystem renames. The staging dir carries a per-merge nonce:
      // foreachBatch serializes the streaming path, but nothing enforced
      // the single-writer assumption — two concurrent merges now cannot
      // overwrite each other's staged output mid-swap (r19 ADVICE).
      if (stageSwap) {
        val stagingPath = new org.apache.hadoop.fs.Path(
          tableDir + s"__staging-${java.lang.System.nanoTime()}")
        try {
          merged.write.partitionBy(partCol)
            .mode(SaveMode.Overwrite).parquet(stagingPath.toString)
          if (!fs.exists(tablePath)) fs.mkdirs(tablePath)
          // each bucket swaps RECOVERABLY (r19 ADVICE): the live bucket is
          // only touched when its staged replacement exists (a touched
          // bucket can be absent from a non-deterministic batch plan
          // evaluated twice — it must then be LEFT ALONE, not deleted),
          // and it moves ASIDE (outside tableDir, invisible to readers)
          // rather than being deleted before the rename — a crash between
          // the two renames leaves both the staged and the aside copy on
          // disk for recovery instead of neither.
          val asideRoot = new org.apache.hadoop.fs.Path(
            stagingPath.toString + "__aside")
          for (p <- touched) {
            val src = new org.apache.hadoop.fs.Path(stagingPath, s"$partCol=$p")
            val dst = new org.apache.hadoop.fs.Path(tablePath, s"$partCol=$p")
            if (fs.exists(src)) {
              if (fs.exists(dst)) {
                fs.mkdirs(asideRoot)
                fs.rename(dst, new org.apache.hadoop.fs.Path(asideRoot, s"$partCol=$p"))
              }
              fs.rename(src, dst)
            }
          }
          fs.delete(asideRoot, true)
        } finally fs.delete(stagingPath, true)
      } else {
        // dynamic overwrite: only the touched part= directories are replaced;
        // the checkpoint materializes because the table dir is also a read
        // source of this plan
        merged.localCheckpoint(true).write
          .partitionBy(partCol)
          .option("partitionOverwriteMode", "dynamic")
          .mode(SaveMode.Overwrite)
          .parquet(tableDir)
      }
    } finally if (persistBatch) newPart.unpersist(blocking = false)
  }

  /** Current table state (without the internal partition column). When a
    * `tombstoneCol` is configured (the O4 CDC `__deleted` STRING contract),
    * keys whose LATEST change is a delete are excluded — but the tombstone
    * row itself stays STORED, which is what keeps the merge idempotent
    * under replay: an upstream re-delivery of a pre-delete upsert loses to
    * the retained tombstone instead of resurrecting the key (the Kafka
    * log-compaction / Cassandra tombstone recipe).
    *
    * NULL-safe: only an EXPLICIT `"true"` tombstone excludes a row. Under
    * plain `=!=`, three-valued logic would also drop rows whose tombstone
    * column is NULL (a feed that only stamps deletes, a schema-evolved
    * union) — live rows silently hidden. `<=>` keeps them. */
  def read(): DataFrame = {
    // mergeSchema: generations written before a column was added lack it
    // in their footers — the merged read null-fills (q257's contract)
    val t = spark.read.option("mergeSchema", "true").parquet(tableDir)
      .drop(partCol)
    tombstoneCol.map(c => t.filter(!(col(c) <=> "true"))).getOrElse(t)
  }

  /** Physically drop tombstone rows — the compaction horizon decision.
    * Full-table rewrite (run rarely, like any compaction): after a purge,
    * a replay of a PRE-delete change would resurrect its key, so purge
    * only once the upstream replay window has passed. No-op without a
    * configured `tombstoneCol`, and no-op before the table exists (mirrors
    * merge()'s existence check). NULL-safe like read(): only explicit
    * `"true"` tombstones are purged. If EVERY row is a tombstone, the
    * overwrite is skipped — writing an empty partitioned dataset would
    * leave a directory with no part files, bricking read()/merge() with
    * 'unable to infer schema'; an all-tombstone table simply keeps its
    * tombstones until fresh live rows arrive. */
  def purgeTombstones(): Unit = tombstoneCol.foreach { c =>
    if (new java.io.File(tableDir).exists()) {
      val live = spark.read.parquet(tableDir)
        .filter(!(col(c) <=> "true")).localCheckpoint(true)
      if (!live.isEmpty) {
        live.write.partitionBy(partCol)
          .mode(SaveMode.Overwrite).parquet(tableDir)
      }
    }
  }

  /** O25: backfill-then-stream. The batch snapshot is merged first (the
    * `--backfill-all` initial load), then the change stream is applied per
    * micro-batch through the same idempotent merge. */
  def backfillThenStream(
      backfill: DataFrame,
      changes: DataFrame,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    merge(backfill)
    changes.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => merge(batch); () }
      .start()
  }
}

object MergeSink {
  /** Map-typed columns are unhashable (undefined iteration order) — shared
    * by MergeSink and [[VersionedSink]]'s content-hash tie-break. */
  private[merge] def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
    case _ => false
  }
}
