package graft.queries

import graft.SparkSpec

/** q90 A-ES weighted-sample contracts: fixed size, dense ranks, negative
  * log-priorities, and — the property the hash-derived uniform exists
  * for — bit-identical picks across independent evaluations (rerun /
  * retry stability a seeded RNG sample cannot give). */
class WeightedSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sample is 50 rows, ranks dense, priorities strictly ordered") {
    val rows = TextQueries.q90WeightedSample(spark, dir).collect()
    assert(rows.length === 50)
    assert(rows.map(_.getLong(3)).toSeq === (1L to 50L))
    val keys = rows.map(r => (r.getLong(2), r.getLong(0))) // (key_e6, doc_id)
    // ln(u) < 0 and w > 0, so every priority is negative
    assert(keys.forall(_._1 < 0L))
    // the (key desc, doc_id asc) order is strict — no accidental dup docs
    assert(rows.map(_.getLong(0)).distinct.length === 50)
    keys.sliding(2).foreach { case Array((k1, d1), (k2, d2)) =>
      assert(k1 > k2 || (k1 == k2 && d1 < d2))
    }
  }

  test("picks are rerun-stable (hash-derived, not RNG)") {
    val a = TextQueries.q90WeightedSample(spark, dir).collect().map(_.toSeq).toSeq
    val b = TextQueries.q90WeightedSample(spark, dir).collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
