package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.VectorQueries

/** q131's drift statistic: identity ⇒ zero, the gate's deterministic v2 ⇒
  * nonzero occupancy movement, and PSI's sign/floor conventions.
  */
class EmbeddingDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def vecs = {
    val s = spark
    import s.implicits._
    graft.Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
  }

  test("identical snapshots measure zero drift in every cell") {
    val s = spark
    import s.implicits._
    val out = VectorQueries.q131DriftOn(vecs, vecs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2)) // n1 == n2
      assert(r.getLong(3) == 0L)           // ln(1) = 0 exactly -> psi_e6 = 0
    }
  }

  test("the gate's v2 moves occupancy and every PSI term is non-negative") {
    val s = spark
    import s.implicits._
    val out = VectorQueries.q131EmbeddingDrift(spark, dir).cache()
    // (p1-p2) and ln(p1/p2) share sign, so each term is >= 0 pre-floor;
    // the e6 floor can only round a tiny positive term down to 0, never -1
    assert(out.filter($"psi_e6" < 0).count() == 0)
    // departures alone shrink the corpus, so SOME cell must lose members
    assert(out.filter($"n1" =!= $"n2").count() > 0)
    // totals: v2 dropped vec_id % 13 = 5
    val t = out.agg(sum($"n1"), sum($"n2")).head()
    val n = vecs.count()
    assert(t.getLong(0) == n)
    assert(t.getLong(1) == vecs.filter($"vec_id" % 13 =!= 5).count())
    out.unpersist()
  }

  test("deterministic: two runs produce identical rows") {
    val a = VectorQueries.q131EmbeddingDrift(spark, dir).collect().toSeq
    val b = VectorQueries.q131EmbeddingDrift(spark, dir).collect().toSeq
    assert(a == b)
  }
}
