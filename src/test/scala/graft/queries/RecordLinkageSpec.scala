package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q164's scale contract: the digit-tail block key is WIDTH-PARAMETRIC in
  * registry size, and the parameterization is sound because
  *   (a) widening k only SPLITS blocks — equal last-(k+1) chars implies
  *       equal last-k chars — so candidate recall is monotone in k, and
  *   (b) the classified output is IDENTICAL at every k: true pairs share
  *       every tail width (the corruption model never touches the digit
  *       suffix) and spurious same-tail pairs cannot reach the `possible`
  *       threshold (max spurious score = -2000000 - 500000 + 1000000 +
  *       1000000 = -500000 < 500000).
  * This is what lets the DuckDB oracle block at a fixed k=3 while the
  * engine grows k with the registries.
  */
class RecordLinkageSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("classified output is invariant to the block-key width k") {
    val base = CoreQueries.q164RecordLinkageWithK(spark, sfDir, 3)
      .collect().map(_.toSeq).toSeq
    assert(base.nonEmpty)
    for (k <- Seq(4, 6, 9)) {
      val got = CoreQueries.q164RecordLinkageWithK(spark, sfDir, k)
        .collect().map(_.toSeq).toSeq
      assert(got === base, s"k=$k diverged from k=3")
    }
    // and the production entry (registry-size-derived k) agrees too
    assert(CoreQueries.q164RecordLinkage(spark, sfDir)
      .collect().map(_.toSeq).toSeq === base)
  }

  test("auto width: measured probe picks the heuristic width on the gate " +
    "corpus — byte-identical to the explicit path — and cap<=0 falls back") {
    val key = "spark.graft.linkage.maxPairsPerRecord"
    val explicit3 = CoreQueries.q164RecordLinkageWithK(spark, sfDir, 3)
      .collect().map(_.toSeq).toSeq
    try {
      // gate registry (150 records): heuristic k = 3, and the measured
      // volume clears the default cap at 3, so auto must equal explicit
      assert(CoreQueries.q164RecordLinkage(spark, sfDir)
        .collect().map(_.toSeq).toSeq === explicit3, "auto diverged from explicit k=3")
      spark.conf.set(key, "-1")
      assert(CoreQueries.q164RecordLinkage(spark, sfDir)
        .collect().map(_.toSeq).toSeq === explicit3, "disabled-cap fallback diverged")
      spark.conf.set(key, "not-a-number")
      val bad = intercept[IllegalArgumentException](
        CoreQueries.q164RecordLinkage(spark, sfDir).collect())
      assert(bad.getMessage.contains(key))
    } finally spark.conf.unset(key)
  }

  test("block-volume guard: a registry whose tails no width can split " +
    "trips fail-loud instead of running the within-block N^2") {
    val s = spark
    import s.implicits._
    // planted skew: every record carries the SAME tail, so every width
    // from 3 to 9 digits leaves one mega-block (200 x ~171 pairs/record)
    val dir = java.nio.file.Files.createTempDirectory("q164skew").toString
    (1 to 200).map(i => (i.toLong, "Customer#000000042", i % 25, i * 1.5))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .withColumn("c_mktsegment", lit("BUILDING"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val ex = intercept[graft.GuardTripException](
      CoreQueries.q164RecordLinkage(spark, dir).collect())
    assert(ex.getMessage.contains("maxPairsPerRecord=64"), ex.getMessage)
    assert(ex.getMessage.contains("9 digits:"),
      "the trail must show the probe exhausted the widest tail")
    assert(ex.getMessage.contains("spark.graft.linkage.maxPairsPerRecord"))
    // the cap override consciously pays the mega-block and still classifies
    try {
      spark.conf.set("spark.graft.linkage.maxPairsPerRecord", "200")
      val rows = CoreQueries.q164RecordLinkage(spark, dir).collect()
      assert(rows.nonEmpty, "override must run the join")
    } finally spark.conf.unset("spark.graft.linkage.maxPairsPerRecord")
  }

  test("forced widening: when the heuristic width overflows the cap but a " +
    "wider tail clears it, the probe widens and runs (no trip)") {
    val s = spark
    import s.implicits._
    // 200 records whose 3-digit tail is one mega-block ("042" shared by
    // all: 171 candidate pairs/record > cap 64) but whose 4-digit tail
    // splits into 10 blocks of 20 (~17 pairs/record < 64). The heuristic
    // for n=200 starts at k=3, so the entry can only run by MEASURING
    // that 4 digits clears the cap — the exploded-width pre-agg's
    // nesting is what this exercises.
    val dir = java.nio.file.Files.createTempDirectory("q164widen").toString
    (1 to 200).map(i => (i.toLong,
        "Customer#" + "%09d".format((i % 10) * 1000L + 42L), i % 25, i * 1.5))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .withColumn("c_mktsegment", lit("BUILDING"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val auto = CoreQueries.q164RecordLinkage(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(auto.nonEmpty, "the widened block join must run and classify")
    // k-invariance holds on this corpus too: the measured pick (4) and
    // the overflowing width (3) classify identically
    assert(auto === CoreQueries.q164RecordLinkageWithK(spark, dir, 4)
      .collect().map(_.toSeq).toSeq, "auto diverged from explicit k=4")
    assert(auto === CoreQueries.q164RecordLinkageWithK(spark, dir, 3)
      .collect().map(_.toSeq).toSeq, "k-invariance broke on the planted corpus")
  }

  test("widening k only splits blocks (never merges): candidate pairs shrink monotonically") {
    val s = spark
    import s.implicits._
    val names = graft.Tables.customer(spark, sfDir).select($"c_name")
    // every k+1 block nests inside a single k block: grouping by the wider
    // tail yields exactly one distinct narrower tail per group
    for (k <- 3 to 8) {
      val merges = names
        .groupBy(expr(s"right(c_name, ${k + 1})").as("wide"))
        .agg(countDistinct(expr(s"right(c_name, $k)")).as("narrow"))
        .filter($"narrow" > 1).count()
      assert(merges === 0L, s"widening $k -> ${k + 1} merged a block")
    }
    // candidate-pair volume is non-increasing in k (the scale property the
    // parameterization exists to buy)
    def candidates(k: Int): Long = names.as("a")
      .join(names.as("b"),
        expr(s"right(a.c_name, $k)") === expr(s"right(b.c_name, $k)"))
      .count()
    val counts = Seq(3, 4, 5).map(candidates)
    assert(counts.sliding(2).forall { case Seq(x, y) => y <= x })
  }

  test("derived k grows with the registry: blocks stay ~constant-population") {
    def kFor(n: Long): Int =
      math.min(9, math.max(3, math.ceil(math.log10(n / 1.5)).toInt))
    assert(kFor(1500L) === 3)      // sf0.01
    assert(kFor(15000L) === 4)     // sf0.1
    assert(kFor(150000L) === 5)    // x10
    assert(kFor(15000000L) === 7)  // x1000
    assert(kFor(Long.MaxValue / 2) === 9) // clamped: tails are 9 digits
    // expected per-block population n / 10^k stays in a constant band
    for (n <- Seq(1500L, 15000L, 150000L, 1500000L, 150000000L)) {
      val pop = n.toDouble / math.pow(10, kFor(n))
      assert(pop <= 15.0, s"n=$n k=${kFor(n)} pop=$pop")
    }
  }
}
