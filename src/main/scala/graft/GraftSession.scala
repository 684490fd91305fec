package graft

import org.apache.spark.sql.SparkSession

/** One place for session construction so Verify / Bench / tests / users all
  * run with the same scale-aware defaults. */
object GraftSession {

  /** Configs that must be on every session running this engine. */
  def tune(b: SparkSession.Builder, shufflePartitions: String): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.privacy.GraftExtensions")
    .config("spark.sql.shuffle.partitions", shufflePartitions)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // explicit, though default-on: hot join keys split at runtime — the
    // skew answer for the fact-table joins at 100x scale
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // keep observed metrics (Dataset.observe / CollectMetrics) trustworthy:
    // AQE's empty-relation propagation replaces an already-executed stage
    // subtree with an empty LocalRelation when its output turns out empty,
    // and any CollectMetrics node inside the replaced subtree vanishes
    // before metric harvest — so exactly the degenerate runs that shed work
    // (e.g. the LSH hot-bucket cap dropping everything) would lose their
    // "I shed work" counters. The rule only saves skipping already-cheap
    // downstream stages of an empty intermediate; observability wins.
    .config("spark.sql.adaptive.optimizer.excludedRules",
      "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
    // events.ts is ns-precision parquet; Spark only reads NANOS as long
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // events.ts has also shipped as µs-precision WITHOUT the UTC flag, which
    // Spark 4 would infer as TIMESTAMP_NTZ — a type unix_millis/window/
    // watermark all reject. Read it as plain TimestampType instead: the
    // session tz is UTC (above) so the stored micros are interpreted
    // unchanged, and DuckDB's naive reading of the same file stays
    // hash-identical. This also covers RAW parquet reads (q120's partition
    // derivation, spec fixtures) that bypass the Tables.events seam.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.ui.enabled", "false")

  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            appName: String = "graft"): SparkSession = {
    val spark = tune(SparkSession.builder().master(s"local[$cores]").appName(appName), cores)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
