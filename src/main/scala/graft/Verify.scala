package graft
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Shared machinery
  * in [[graft.util.VerifyDump]] (also used by the RunOne dev loop). */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cores = cpus, appName = "graft-verify")
    graft.util.VerifyDump.dump(spark, SparkEntry.queries.keys.toSeq.sorted, sfDir, outDir)
    spark.stop()
  }
}
