package graft.queries

import graft.SparkSpec

/** Measures what the q70 `verifyPrefixChars` dial costs in result quality:
  * recall (and precision) of the capped verify against the uncapped sf0.01
  * ground truth at three cap settings. The dial exists because the verify is
  * O(len²) per candidate pair — the suite's worst ×10 wall ratio — and at
  * 100 TB you cap verified length rather than pay quadratic text cost; this
  * spec turns "a dial, not a redesign" from an assertion into a measurement.
  *
  * Expectations encode the measured sf0.01 behavior: pairs that survive
  * SimHash blocking are near-identical texts, so their prefixes agree long
  * before the median text length (306 chars) and recall at practical caps
  * (≥128) is total. The floor at cap 64 is deliberately loose — an eighth of
  * the max text length is far below any cap you'd run in production; the
  * point of measuring it is to see the dial's failure direction. */
class Q70PrefixCapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def pairs(cap: Option[Int]): Set[(Long, Long)] =
    TextQueries.q70FuzzyMatchWith(spark, dir, cap)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("capped verify recall vs uncapped ground truth at caps 256/128/64") {
    val exact = pairs(None)
    assert(exact.nonEmpty, "ground truth must be non-empty for recall to mean anything")

    val results = Seq(256, 128, 64).map { c =>
      val got = pairs(Some(c))
      val recall = (exact & got).size.toDouble / exact.size
      val precision = if (got.isEmpty) 1.0 else (exact & got).size.toDouble / got.size
      info(f"cap=$c%3d  recall=$recall%.3f  precision=$precision%.3f  " +
        f"pairs=${got.size}%d (exact=${exact.size}%d)")
      (c, recall, precision)
    }

    val byCap = results.map { case (c, r, _) => c -> r }.toMap
    // practical caps (>= half the median text length) must be lossless here
    assert(byCap(256) == 1.0, s"cap 256 lost pairs: recall ${byCap(256)}")
    assert(byCap(128) >= 0.95, s"cap 128 recall ${byCap(128)} below floor")
    // the aggressive cap may diverge, but must still find most true pairs
    assert(byCap(64) >= 0.8, s"cap 64 recall ${byCap(64)} below floor")
    // recall must not INCREASE as the cap shrinks the verified evidence
    // in a way that breaks monotone intuition only mildly: allow ties
    assert(byCap(256) >= byCap(128) - 1e-9 || byCap(128) >= byCap(64) - 1e-9,
      "recall ordering collapsed entirely")
  }

  test("gated defaults: q70 = dial at 256, q70_uncapped = dial at None") {
    val viaDial256 = TextQueries.q70FuzzyMatchWith(spark, dir, Some(256)).collect().toSeq
    val gated = TextQueries.q70FuzzyMatch(spark, dir).collect().toSeq
    assert(viaDial256 == gated,
      "the default gate must BE the certified cap=256 setting")
    val viaDialNone = TextQueries.q70FuzzyMatchWith(spark, dir, None).collect().toSeq
    val uncapped = TextQueries.q70Uncapped(spark, dir).collect().toSeq
    assert(viaDialNone == uncapped)
  }
}
