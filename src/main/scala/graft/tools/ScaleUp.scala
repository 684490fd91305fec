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
  *
  * CONTENT is salted per copy, not replicated verbatim — verbatim copies
  * would grow every duplicate group and every identical-vector clique ×N,
  * an artificial near-dup density no organic corpus has:
  *  - `documents.text`: every copy suffixes every token with a fixed-width
  *    copy-specific salt. Token renaming is BIJECTIVE, so all within-copy
  *    set relations — exact-dup groups, shingle/MinHash/SimHash/Jaccard
  *    similarities — are exactly the base corpus's, while cross-copy token
  *    sets are disjoint. Duplicate density therefore stays organic (the
  *    base corpus's) as the corpus grows ×N.
  *  - `embeddings.embedding`: each copy i>0 cyclically rotates the vector
  *    dimensions by i. Rotation preserves norms and within-copy dot
  *    products exactly (same ANN/near-dup structure per copy) while
  *    cross-copy vectors decorrelate.
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
      val shifted = keys.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * KeyStride)))
      name match {
        case "documents" =>
          // EVERY copy gets a FIXED-WIDTH suffix (z00, z01, ...): suffixes
          // of equal length can never make tokenA+salt_i == tokenB+salt_j
          // for i != j, even when a base token already ends in z<digits> —
          // cross-copy CONTENT token sets are provably disjoint. The
          // stopword/language-marker vocabulary is exempt (negative
          // lookahead): those are the corpus-wide shared function words the
          // scoring operators key on (stop ratio, langId) — salting them
          // would turn every scaled copy into unknown-language junk that
          // the q47 quality gates drop, leaving the downstream pipeline
          // unexercised at scale. Two copies of a doc then share only its
          // function words — far below any near-dup threshold. (Edge: a
          // doc consisting SOLELY of function words salts to itself — an
          // exact cross-copy duplicate; such no-content docs are precisely
          // what exact dedup collapses, and none exist in the testdata.)
          // ONE source of truth for the exempt vocabulary: the engine's own
          // scoring lists (a drift between them and this exemption would
          // silently break stop-ratio/langId preservation at scale).
          // Lookbehind, not \b: a leading \b would skip runs preceded by
          // '_' and leak unsalted content tokens across copies.
          val markers = (graft.functions.TextFunctions.EnStop ++
            graft.functions.TextFunctions.LangMarkers.flatMap(_._2))
            .distinct.mkString("|")
          shifted.withColumn("text",
            regexp_replace(col("text"),
              s"(?<![A-Za-z0-9])(?!(?:$markers)\\b)([A-Za-z0-9]+)", "$1" + f"z$i%02d"))
        case "embeddings" if i > 0 =>
          // distinct transform per copy: a cyclic rotation (i mod dim) for
          // the first 64 copies, COMPOSED with full-vector negation for
          // copies 64..99 (rotation indices wrap at the embedding
          // dimension). Both transforms preserve norms and within-copy dot
          // products EXACTLY — every copy's internal ANN/near-dup structure
          // is the base corpus's — while any two distinct copies differ by
          // a nonzero rotation or by sign, so cross-copy vectors stay
          // decorrelated (sign-flip pairs at the same rotation are
          // anti-correlated: cosine c becomes -c, maximally far from any
          // near-dup threshold). main enforces copies <= 100 (salt width).
          val rot = i % 64
          val rotExpr =
            if (rot == 0) "embedding"
            else s"concat(slice(embedding, $rot + 1, size(embedding) - $rot), " +
              s"slice(embedding, 1, $rot))"
          val full = if (i < 64) rotExpr
            else s"transform($rotExpr, x -> -x)"
          shifted.withColumn("embedding", expr(full))
        case "customer" =>
          // q226/q164 key on c_name CONTENT; verbatim copies would create
          // ×C(N,2) cross-copy distance-0 name pairs — an adversarial
          // duplicate density no organic corpus has. Fixed-width per-copy
          // prefix ("Custom<ii>#" for "Customer#"): length 18 and the '#'
          // at char 9 are preserved, within-copy blocks/tails/distances
          // are exactly the base corpus's (levenshtein(P+a, P+b) =
          // levenshtein(a, b) for a shared equal-length prefix), and
          // cross-copy q226 blocks are disjoint (the copy digits sit
          // inside the 16-char block key) — name-pair output scales ×N,
          // not ×N².
          // the %02d prefix is width-correct only for i < 100; at i >= 100
          // it widens to 3 digits and silently breaks the fixed-width-18 /
          // '#'-at-char-9 invariant the block keys depend on — fail loudly
          shifted.withColumn("c_name", {
            require(i < 100, s"c_name salt scheme supports copy index < 100, got $i")
            concat(lit(f"Custom$i%02d#"), substring(col("c_name"), 10, 9))
          })
        case _ => shifted
      }
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft-sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // documents salt is 2-digit (covers copy indices 0..99 at fixed width);
    // embeddings use rotation (i mod 64) composed with negation for i >= 64
    require(copies >= 1 && copies <= 100, s"copies must be in [1, 100], got $copies")
    val spark = graft.GraftSession.local(appName = "graft-scaleup")
    graft.Tables.names.foreach { t =>
      scaleTable(spark, inDir, t, copies)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scaleup] $t x$copies -> $outDir/$t.parquet")
    }
    spark.stop()
  }
}
