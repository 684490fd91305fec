package graft.util

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Shared dump machinery for the driver gate (`graft.Verify`) and the dev
  * loop (`graft.tools.RunOne`): one implementation of the per-query parquet
  * dump and of the oracle_sql.json emission, so the two gates cannot drift
  * (the escaper guards the driver's `json.load` from control chars in
  * builder-authored SQL). */
object VerifyDump {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20). */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Run each named query against `sfDir`, dump to `outDir/<name>`, emit
    * `outDir/oracle_sql.json` restricted to those names. A query failure
    * prints `[verify] <name> failed:` and continues (the driver greps for
    * exactly that marker). */
  def dump(spark: SparkSession, names: Seq[String], sfDir: String, outDir: String): Unit = {
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop any checkpoint blocks the query left behind (see Bench)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val json = SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
