package graft.tools

import graft.GraftSession

/** Dev loop: run a comma-separated subset of SparkEntry.queries exactly the
  * way `graft.Verify` does (same [[graft.util.VerifyDump]] machinery:
  * parquet dump + oracle_sql.json restricted to the subset), so
  * `tools/oracle_check.py` can gate one query in seconds instead of the
  * full sweep.
  *
  * {{{ sbt "runMain graft.tools.RunOne q52_ngram_jaccard /root/testdata/sf0.001 /tmp/one" }}}
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val wanted = names.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cores = cpus, appName = "graft-runone")
    graft.util.VerifyDump.dump(spark, wanted, sfDir, outDir)
    spark.stop()
  }
}
