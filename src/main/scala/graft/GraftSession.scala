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
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
    // events.ts is ns-precision parquet; Spark only reads NANOS as long
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")

  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            appName: String = "graft"): SparkSession = {
    val spark = tune(SparkSession.builder().master(s"local[$cores]").appName(appName), cores)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
