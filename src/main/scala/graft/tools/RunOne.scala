package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dev loop: run a comma-separated subset of SparkEntry.queries exactly the
  * way `graft.Verify` does (parquet dump + oracle_sql.json restricted to the
  * subset), so `tools/oracle_check.py` can gate one query in seconds instead
  * of the full sweep.
  *
  * {{{ sbt "runMain graft.tools.RunOne q52_ngram_jaccard /root/testdata/sf0.001 /tmp/one" }}}
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val wanted = names.split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cores = cpus, appName = "graft-runone")
    new java.io.File(outDir).mkdirs()
    wanted.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view.filterKeys(wanted.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
