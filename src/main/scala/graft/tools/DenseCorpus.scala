package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Duplicate-density STRESS corpus for the near-dup verdict operator
  * (r18 verdict ask #5): q271's linearity claim ("one verdict row per
  * media row at any duplicate density") rested on the ScaleUp corpus's
  * natural density; this tool plants the adversarial case — mega exact-
  * duplicate classes — so the claim becomes a measured number.
  *
  * Reads `<srcDir>/documents.parquet`, overwrites the TEXT of every
  * `densePct`-th doc with one of `nClasses` fixed ≥64-char ASCII
  * templates (chosen by doc_id, fully deterministic), writes
  * `<outDir>/documents.parquet`. With the defaults on the ×10 corpus
  * (50 k docs → 150 k media): 10% of docs across 5 templates ⇒ every
  * rendition of a template is one exact-hash class ⇒ 15 exact classes of
  * 1 000 media each — 10% of all media in 1 000-member classes, the
  * shape whose m²/2 pair enumeration killed q127's contract at ×100 in
  * r17 and which q271's one-group-by class collapse must absorb flat.
  *
  * Usage: runMain graft.tools.DenseCorpus <srcDir> <outDir>
  *          [nClasses=5] [everyNth=10] */
object DenseCorpus {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val nClasses = args.lift(2).map(_.toInt).getOrElse(5)
    val everyNth = args.lift(3).map(_.toInt).getOrElse(10)
    require(nClasses >= 1 && everyNth >= 1)
    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), appName = "graft-dense-corpus")
    // ≥64 chars (q127/q271's minimum media length), ASCII, deterministic
    // per class — concat pads each template well past the floor
    // class index from doc_id / everyNth (doc_id % nClasses would collide
    // with the every-Nth selection when everyNth and nClasses share factors)
    val template = concat(lit("dense-exact-class-"),
      ((col("doc_id") / everyNth).cast("long") % nClasses).cast("string"),
      lit("-" + ("the same bytes land in every rendition and hash " * 4)))
    spark.read.parquet(s"$srcDir/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % everyNth === 0, template).otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val planted = spark.read.parquet(s"$outDir/documents.parquet")
      .filter(col("doc_id") % everyNth === 0)
      .groupBy(((col("doc_id") / everyNth).cast("long") % nClasses).as("cls"))
      .count().collect()
    planted.sortBy(_.getLong(0)).foreach(r =>
      println(s"[dense-corpus] template ${r.getLong(0)}: ${r.getLong(1)} docs " +
        s"(x3 renditions = ${r.getLong(1)} media per exact class x 3 classes)"))
    spark.stop()
  }
}
