package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.VectorQueries

/** q64 semantic-dedup contracts, checked as PROPERTIES against the frozen
  * quantizer on real sf data (the oracle checks the exact values; this spec
  * pins the semantics that must survive any threshold/model change):
  * the verdict is complete, canonical representatives are self-kept, and
  * every drop is justified by a lower-id cluster-mate at/above the
  * threshold under the shared round-then-compare cosine convention. */
class SemDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q64: verdicts are total, drops point at a lower-id near-dup in the same cell") {
    val s = spark
    import s.implicits._
    val out = VectorQueries.q64SemDedup(s, dir).collect()
    val n = graft.Tables.embeddings(s, dir).count()
    assert(out.length === n, "one verdict per vector — dedup must never lose rows")

    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toMap
    // kept <-> no dup_of, and a drop's canonical id is strictly lower
    byId.foreach { case (id, (_, dupOf, kept)) =>
      assert(kept === (if (dupOf.isEmpty) 1L else 0L), s"vec $id")
      dupOf.foreach(lo => assert(lo < id, s"vec $id: canonical must be the lower id"))
    }
    // every named canonical is in the same cell, and the pair really is a
    // near-duplicate: recompute the rounded cosine for each dropped pair
    val vecs = graft.Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosR(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val dropped = byId.collect { case (id, (cell, Some(lo), _)) => (id, cell, lo) }
    assert(dropped.nonEmpty, "sf0.001 embeddings contain semantic dups — a no-op run means the query broke")
    dropped.foreach { case (id, cell, lo) =>
      assert(byId(lo)._1 === cell, s"pair ($lo,$id) must share a cell")
      assert(cosR(vecs(id), vecs(lo)) >= 0.40, s"pair ($lo,$id) below threshold")
    }
    // dup_of is the MINIMUM qualifying id — no qualifying cluster-mate below it
    dropped.foreach { case (id, cell, lo) =>
      val below = byId.collect { case (other, (c, _, _))
        if c == cell && other < lo && cosR(vecs(id), vecs(other)) >= 0.40 => other }
      assert(below.isEmpty, s"vec $id: dup_of=$lo but ${below.headOption} also qualifies")
    }
  }

  test("q64: cell-population guard fails loudly when a cell exceeds the cap, silent when satisfied") {
    val s = spark
    // sf0.001 cells hold more than one vector, so cap=1 must trip
    s.conf.set("spark.graft.semdedup.maxCellRows", "1")
    try {
      val ex = intercept[graft.GuardTripException] {
        VectorQueries.q64SemDedup(s, dir).collect()
      }
      assert(ex.getMessage.contains("maxCellRows=1"), ex.getMessage)
      assert(ex.getMessage.contains("FreezeIvf"), "the error must name the re-freeze recipe")
      // a generous cap passes through to the normal result
      s.conf.set("spark.graft.semdedup.maxCellRows", "1000000")
      assert(VectorQueries.q64SemDedup(s, dir).collect().nonEmpty)
    } finally s.conf.unset("spark.graft.semdedup.maxCellRows")
    // unset (the gate's default since r17): guard ON at 32 x model.k —
    // the frozen k=45 model's hottest sf cell is 89 rows vs the 1440 cap
    assert(VectorQueries.q64SemDedup(s, dir).collect().nonEmpty)
  }

  test("q64: guard is ON by default — an undersized quantizer trips with no config set") {
    val s = spark
    import s.implicits._
    assert(s.conf.getOption("spark.graft.semdedup.maxCellRows").isEmpty)
    // k=1 pools all 500 sf0.001 vectors in one cell; default cap = 32*1 = 32
    val e0 = graft.Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val tiny = graft.vector.Ivf.train(e0, k = 1, iterations = 1)
    val ex = intercept[graft.GuardTripException] {
      VectorQueries.semDedup(s, dir, tiny).collect()
    }
    assert(ex.getMessage.contains(s"maxCellRows=${VectorQueries.SemDedupGuardFactor}"), ex.getMessage)
    // explicit <= 0 disables the guard: the same undersized model runs
    s.conf.set("spark.graft.semdedup.maxCellRows", "-1")
    try {
      val out = VectorQueries.semDedup(s, dir, tiny).collect()
      assert(out.length === 500, "disabled guard must run the full dedup")
    } finally s.conf.unset("spark.graft.semdedup.maxCellRows")
  }

  test("q64: the re-frozen remedy path is a valid dedup — verdicts total, drops justified, guard satisfied") {
    val s = spark
    import s.implicits._
    // the k ~ sqrt(N) re-freeze (the measured scale-safe path) run through
    // the SAME gated operator, as SemDedupRefreeze does at x100
    val e0 = graft.Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val n = e0.count()
    val k = math.round(math.sqrt(n.toDouble)).toInt
    val refrozen = graft.vector.Ivf.train(e0, k = k, iterations = 2)
    val out = VectorQueries.semDedup(s, dir, refrozen).collect()
    assert(out.length === n, "one verdict per vector under any quantizer")
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toMap
    byId.foreach { case (id, (_, dupOf, kept)) =>
      assert(kept === (if (dupOf.isEmpty) 1L else 0L), s"vec $id")
      dupOf.foreach { lo =>
        assert(lo < id, s"vec $id: canonical must be the lower id")
        assert(byId(lo)._1 === byId(id)._1, s"pair ($lo,$id) must share a re-frozen cell")
      }
    }
    // deterministic: the same freeze re-trained yields the same verdicts
    val again = VectorQueries.semDedup(s, dir,
      graft.vector.Ivf.train(e0, k = k, iterations = 2)).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q64: malformed maxCellRows names the config key") {
    val s = spark
    s.conf.set("spark.graft.semdedup.maxCellRows", "lots")
    try {
      val ex = intercept[IllegalArgumentException] {
        VectorQueries.q64SemDedup(s, dir).collect()
      }
      assert(ex.getMessage.contains("spark.graft.semdedup.maxCellRows"), ex.getMessage)
    } finally s.conf.unset("spark.graft.semdedup.maxCellRows")
  }
}
