package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.VectorQueries

/** q92 PQ contracts: every reconstruction is made of actual codebook rows
  * (the structural definition of product quantization), codes stay in
  * [0, k), and the quantized search's recall against the exact q25 ranks
  * is measured — not assumed (the Sq8Spec pattern). */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("PQ codes are in [0,k) and each reconstructed subspace is a codebook row") {
    val s = spark
    import s.implicits._
    val model = PqFrozen.model
    val rows = graft.Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .select($"vec_id", Pq.codesOf($"v", model).as("codes"),
        Pq.reconstruct($"v", model).as("r"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val codes = row.getSeq[Int](1)
      val recon = row.getSeq[Double](2)
      assert(codes.length === model.m)
      assert(recon.length === model.dim)
      codes.zipWithIndex.foreach { case (c, sub) =>
        assert(c >= 0 && c < model.k, s"code $c out of range in sub $sub")
        val expect = model.codebooks(sub)(c)
        val got = recon.slice(sub * model.subDim, (sub + 1) * model.subDim)
        assert(got === expect.toSeq,
          s"vec ${row.getLong(0)} sub $sub: reconstruction is not codebook row $c")
      }
    }
  }

  test("PQ encoding picks the NEAREST codebook row per subspace (argmin replay)") {
    val s = spark
    import s.implicits._
    val model = PqFrozen.model
    val sample = graft.Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .filter($"vec_id" < 50)
      .select($"vec_id", $"v", Pq.codesOf($"v", model).as("codes"))
      .collect()
    sample.foreach { row =>
      val v = row.getSeq[Double](1)
      val codes = row.getSeq[Int](2)
      (0 until model.m).foreach { sub =>
        val sv = v.slice(sub * model.subDim, (sub + 1) * model.subDim)
        def d2(c: Array[Double]): Double =
          sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        val best = model.codebooks(sub).zipWithIndex
          .map { case (c, i) => (d2(c), i) }.min._2
        assert(codes(sub) === best,
          s"vec ${row.getLong(0)} sub $sub: code ${codes(sub)} != argmin $best")
      }
    }
  }

  test("PQ top-3 recall against exact q25 ranks is measured and recorded") {
    val exact = VectorQueries.q25AnnTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val pq = VectorQueries.q92AnnPq(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    assert(exact.keySet === pq.keySet)
    val hits = exact.keys.toSeq.map(q => (exact(q) intersect pq(q)).size).sum
    val total = exact.values.map(_.size).sum
    // deterministic corpus + frozen codebooks -> a fixed number: 1/15 at
    // the round-8 freeze. 4-bit PQ (4 bytes/vector, a 64× compression)
    // over a NEAR-UNIFORM random 64-dim corpus is ANN's worst case — with
    // no cluster structure, 16 centroids per 8-dim subspace reconstruct
    // coarsely and rank-3 precision mostly dissolves, exactly like the
    // measured IVF nprobe floors (SCALE.md): a property of the synthetic
    // corpus, not the operator. Production recall comes from byte codes
    // (k=256) and IVF-PQ composition; what this spec pins is that the
    // encode/decode/score path stays EXACTLY the frozen one — the oracle
    // hash (q92 rows at every SF) is the bit-level gate, and this measured
    // value is the recall tripwire: it may only move if the codebooks are
    // deliberately re-frozen.
    assert(hits === 1, s"pq recall moved from the frozen measurement: $hits/$total")
  }
}
