package graft.vector

import java.nio.file.Files

import graft.SparkSpec
import graft.queries.VectorQueries

/** Sign-LSH contracts: colinear vectors land in identical buckets in EVERY
  * band (θ=0 agrees on every hyperplane sign), so scaled copies of a query
  * are guaranteed candidates and surface with cos_r = 1.0; the plane family
  * itself is frozen and deterministic. */
class LshSpec extends SparkSpec {

  test("frozen planes: deterministic, right shape, non-degenerate") {
    val p = LshPlanes.planes
    assert(p.length === LshPlanes.Planes)
    assert(p.forall(_.length === LshPlanes.Dims))
    assert(p.flatten.forall(x => x >= -1.0 && x < 1.0))
    // distinct planes (a collapsed PRNG would repeat rows)
    assert(p.map(_.toSeq).distinct.length === p.length)
    // independent replay of the generator (SplitMix64 from the documented
    // seed): a PRNG, seed, or mapping change breaks the q54 oracle
    // literals, so it must break THIS spec first
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    var state = 0x5eed5eedL
    for (b <- 0 until LshPlanes.Planes; d <- 0 until LshPlanes.Dims) {
      state += 1
      val expected = 2.0 * ((mix(state) >>> 11) * (1.0 / (1L << 53))) - 1.0
      assert(p(b)(d) === expected, s"plane $b dim $d")
    }
  }

  test("scaled copies are guaranteed LSH candidates with cos_r = 1.0") {
    val s = spark
    import s.implicits._
    // base vectors with components away from any hyperplane (random-ish,
    // nonzero); vec 100+q = 2× copy of query vec q (same direction)
    def base(seed: Long): Seq[Float] =
      (0 until LshPlanes.Dims).map(d =>
        (math.sin(seed * 31 + d * 7).toFloat + 0.01f)).toSeq
    val rows =
      (0L until 5L).map(q => (q, base(q), "q")) ++
      (0L until 5L).map(q => (100L + q, base(q).map(x => 2.0f * x), "copy")) ++
      (200L until 230L).map(i => (i, base(i), "noise"))
    val dir = tmpDir("lsh")
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = VectorQueries.q54AnnLsh(spark, dir).collect()
    val byQ = out.groupBy(_.getLong(0))
    (0L until 5L).foreach { q =>
      val top = byQ(q).minBy(_.getLong(1)) // rank 1
      assert(top.getLong(2) === 100L + q, s"query $q top-1 should be its 2x copy")
      assert(top.getDouble(3) === 1.0)
    }
  }
}
