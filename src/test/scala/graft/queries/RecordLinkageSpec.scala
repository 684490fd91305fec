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
