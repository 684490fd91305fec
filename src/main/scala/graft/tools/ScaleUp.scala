package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence generator: replicates an sf directory N× with key-shifted
  * copies into a new directory, preserving join hit-rates and growing KEY
  * cardinality (not rows-per-key) — e.g. sf0.1 × 10 ≈ an sf1-equivalent —
  * so Bench can measure how every query's wall-time scales with data volume
  * beyond the largest driver-provided SF.
  *
  * Key-shifting: each copy `i` offsets every key column by `i × stride`
  * consistently on both sides of each foreign key (customer↔orders,
  * orders↔lineitem, part/supplier↔lineitem), so selectivities and join
  * fan-outs stay those of the base SF. Dimension tables `region`/`nation`
  * (O(1) size at every SF, like the real TPC-H) are copied unchanged.
  * `documents` copies share text → the dedup queries see each duplicate
  * group grow ×N, which is exactly what a crawl corpus does at scale.
  *
  * Entirely distributed: N unioned selects per table, one parquet write, no
  * driver-side rows.
  *
  * Usage: `sbt "runMain graft.tools.ScaleUp [inDir] [outDir] [copies]"`.
  */
object ScaleUp {

  private val KeyStride = 100000000L // far above any base-SF key

  /** key columns to shift per table (consistent across tables). */
  private val shifts: Map[String, Seq[String]] = Map(
    "region"     -> Nil,
    "nation"     -> Nil,
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def scaleTable(spark: SparkSession, inDir: String, name: String, copies: Int): DataFrame = {
    val base = spark.read.parquet(s"$inDir/$name.parquet")
    val keys = shifts(name)
    if (keys.isEmpty) base
    else (0 until copies).map { i =>
      keys.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * KeyStride)))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft-sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.local(appName = "graft-scaleup")
    graft.Tables.names.foreach { t =>
      scaleTable(spark, inDir, t, copies)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scaleup] $t x$copies -> $outDir/$t.parquet")
    }
    spark.stop()
  }
}
