package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.CoreQueries

/** The Bloom runtime filter's contracts: membership is complete (NO false
  * negatives — the exactness of q59 rests on it), false positives are rare
  * enough to matter (measured, not assumed), and the pre-filtered query is
  * row-identical to the plain semi-join. */
class BloomFilterSpec extends SparkSpec {

  private val NumBits = 1 << 20
  private val NumHashes = 5

  test("no false negatives: every inserted key passes the probe") {
    val s = spark
    import s.implicits._
    // adversarial-ish keys: dense range, powers of two, negatives
    val keys = ((1L to 2000L) ++ (0 to 62).map(1L << _) ++ Seq(-1L, -42L, Long.MinValue + 1))
      .toDF("k")
    val bf = BloomFilter.build(keys, $"k", NumBits, NumHashes)
    val misses = keys.filter(!BloomFilter.mightContain(bf, $"k", NumBits, NumHashes)).count()
    assert(misses === 0L)
  }

  test("false-positive rate on disjoint keys is within an order of magnitude of theory") {
    val s = spark
    import s.implicits._
    val n = 30000L
    val bf = BloomFilter.build((1L to n).toDF("k"), $"k", NumBits, NumHashes)
    val probes = 200000L
    val fp = (n + 1 to n + probes).toDF("k")
      .filter(BloomFilter.mightContain(bf, $"k", NumBits, NumHashes)).count()
    // theory: (1 - e^(-k n / m))^k ≈ 4e-5 → expect ~8 of 200k; allow 10×
    assert(fp < 80L, s"false positives: $fp of $probes")
  }

  test("q59 with the bloom pre-filter is row-identical to the plain semi-join") {
    val dir = "/root/testdata/sf0.001"
    val withBloom = CoreQueries.q59WithBloom(spark, dir, useBloom = true).collect().toSeq
    val plain = CoreQueries.q59WithBloom(spark, dir, useBloom = false).collect().toSeq
    assert(withBloom === plain)
    assert(withBloom.nonEmpty)
  }

  test("the pre-filter actually filters: passes are bounded by matches + fpp slack") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val keys = graft.Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val bf = BloomFilter.build(keys, $"o_orderkey", NumBits, NumHashes)
    val li = graft.Tables.lineitem(s, dir)
    val total = li.count()
    val pass = li.filter(BloomFilter.mightContain(bf, $"l_orderkey", NumBits, NumHashes)).count()
    val exact = li.join(keys, li("l_orderkey") === keys("o_orderkey"), "left_semi").count()
    assert(pass >= exact, "completeness: the filter may never drop a matching row")
    assert(pass <= exact + (total - exact) / 100,
      s"selectivity: pass=$pass exact=$exact total=$total — fpp should be ≪ 1%")
    assert(pass < total, "the filter must cut something on a ~20%-selective key set")
  }
}
