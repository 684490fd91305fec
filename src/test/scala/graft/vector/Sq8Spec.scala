package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.VectorQueries

/** q67 SQ8 contracts: the affine int8 quantizer's reconstruction error is
  * bounded by half a step per element (the property that makes SQ8 usable
  * at all), constant vectors survive the scale-0 guard, and the quantized
  * search's recall against the exact q25 ranks is measured — not assumed. */
class Sq8Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sq8 reconstruction error is <= scale/2 per element; constant vectors are exact") {
    val s = spark
    import s.implicits._
    val vecs = graft.Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      val mn = v.min; val mx = v.max; val sc = (mx - mn) / 255.0
      v.foreach { x =>
        val dq = if (sc == 0.0) mn else mn + math.round((x - mn) / sc) * sc
        val bound = if (sc == 0.0) 0.0 else sc / 2 + 1e-12
        assert(math.abs(dq - x) <= bound, s"vec $id: |$dq - $x| > step/2")
      }
    }
    // constant vector: scale 0 must reproduce the constant exactly (guard path)
    val const = Array.fill(8)(0.25)
    val sc = (const.max - const.min) / 255.0
    assert(sc === 0.0 && const.forall(x => math.abs(const.min - x) == 0.0))
  }

  test("quantized top-3 recalls most of the exact top-3 (measured, deterministic)") {
    val exact = VectorQueries.q25AnnTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val sq8 = VectorQueries.q67AnnSq8(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    assert(exact.keySet === sq8.keySet)
    val hits = exact.keys.toSeq.map(q => (exact(q) intersect sq8(q)).size).sum
    val total = exact.values.map(_.size).sum
    // deterministic corpus + deterministic quantizer -> this is a fixed
    // number; the assertion records the measured recall floor (14/15 here)
    // so a quantizer regression (wrong scale, wrong rounding) trips it
    assert(hits * 15 >= total * 14 - 1, s"sq8 recall dropped: $hits/$total")
  }
}
