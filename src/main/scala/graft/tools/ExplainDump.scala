package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dumps `.explain("formatted")` for the named queries to files, for the
  * optimization-round plan evidence (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Run: `sbt "runMain graft.tools.ExplainDump <outDir> <suffix> q1,q2,..."`
  * (data dir from SPARK_GRAFT_SF_DIR, default sf0.001 — plan SHAPE is the
  * evidence, so the smallest SF is enough and keeps the dump cheap).
  *
  * The dump runs the query once (collect) so AQE finalizes, then writes the
  * pre-execution formatted explain AND the executed (post-AQE) plan — the
  * formatted section carries PushedFilters/ReadSchema, the executed section
  * the final join strategies and exchange count. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names  = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(outDir)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "explain-dump")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sf)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.collect() // finalize AQE so the executed plan is the real one
      val executed = df.queryExecution.executedPlan.toString
      val body = s"== $name ($suffix, ${Paths.get(sf).getFileName}) ==\n\n" +
        "---- explain(\"formatted\") ----\n" + formatted +
        "\n---- executed plan (post-AQE) ----\n" + executed + "\n"
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), body)
      println(s"[explain] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
