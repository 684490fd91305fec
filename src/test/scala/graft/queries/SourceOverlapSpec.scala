package graft.queries

import graft.SparkSpec

/** q124 — the per-source MinHash overlap estimator, calibrated against the
  * exact q112 matrix (the q45 sketch-contract discipline: the oracle gate
  * hash-pins every signature lane and verdict; this spec keeps the
  * aggregate accuracy picture visible and pins the exact-side equivalence
  * that makes q112 the calibration target rather than a parallel truth).
  */
class SourceOverlapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("exact columns agree with q112 on its pairs; all verdicts hold; MAE logged") {
    val est = TextQueries.q124SourceOverlapMinhash(spark, dir).collect()
    val exact = TextQueries.q112SourceOverlap(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    // q124's exact side IS q112 (plus zero-overlap pairs q112's inner
    // join elides — none on this corpus, every source pair shares types)
    val estPairs = est.map { r =>
      ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    }.toMap
    exact.foreach { case (k, v) =>
      assert(estPairs(k) == v, s"exact columns diverged from q112 at $k")
    }

    assert(est.forall(_.getLong(8) == 1L),
      "every pair must satisfy the 2/H + 3sigma contract (the gate pins this too)")

    val diffs = est.map(r => math.abs(r.getLong(7) - r.getLong(5)))
    info(f"pairs=${est.length} MAE_e6=${diffs.sum / est.length}%d " +
      f"max_e6=${diffs.max}%d (H=64, granularity_e6=15625)")
    // H=64 granularity alone is 15625; a mean error past ~4 lanes means
    // the lane hashing itself broke, not just sketch noise
    assert(diffs.sum / est.length < 4 * 15625, "mean error beyond sketch noise")
  }
}
