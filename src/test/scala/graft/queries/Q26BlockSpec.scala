package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Measures what q26's composed (label × quantizer-cell) blocking key costs
  * in pair recall. Two measurements:
  *
  *  1. PLANTED near-dups (the metric that matters): clone 100 corpus
  *     vectors with a tiny perturbation (cos ≈ 0.999 to the original, same
  *     label) — every planted pair must survive the cell blocking, because
  *     a near-identical vector quantizes to the same nearest centroid.
  *     This is LshSpec's scaled-copy recipe applied to the IVF key.
  *  2. The sf0.01 corpus's own gate-passing pairs (reported, not floored):
  *     the synthetic corpus has no true near-dups — its strongest same-
  *     label pair is cos ≈ 0.475, random coincidence territory — so
  *     cross-cell losses there bound the dial's failure direction, not its
  *     quality.
  */
class Q26BlockSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("every planted near-dup pair survives the composed blocking") {
    val s = spark
    import s.implicits._
    val out = tmpDir("q26block")

    val base = Tables.embeddings(s, dir)
    // clone vec_ids 0..99 at vec_id+10000 with one component nudged: cosine
    // to the original stays ≈ 0.999 and the L2 argmin over centroids is
    // unchanged for all but boundary-straddling vectors
    val clones = base.filter($"vec_id" < 100)
      .select(($"vec_id" + 10000L).as("vec_id"), $"label",
        transform($"embedding",
          (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)).as("embedding"))
    base.unionByName(clones).write.parquet(s"$out/embeddings.parquet")

    val pairs = VectorQueries.q26EmbedNearDup(s, out)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 100L).map(i => (i, i + 10000L)).toSet
    val found = planted & pairs
    info(f"planted near-dup recall: ${found.size}/100")
    assert(found.size >= 98,
      s"cell blocking lost ${100 - found.size}/100 planted near-dup pairs")
  }

  test("corpus gate-passing pairs: composed key is a subset of label-only exact") {
    val s = spark
    import s.implicits._

    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"label",
        transform($"embedding", x => x.cast("double")).as("v"))
      .select($"vec_id", $"label", $"v",
        sqrt(call_function("graft_dot", $"v", $"v")).as("nrm"))
    val cosR = round(call_function("graft_dot", col("a.v"), col("b.v"))
      / (col("a.nrm") * col("b.nrm")), 4)
    val exact = e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosR.as("cos_r"))
      .filter($"cos_r" >= 0.30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val blocked = VectorQueries.q26EmbedNearDup(s, dir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // the composed key can only REMOVE pairs, never invent them
    assert(blocked.subsetOf(exact.keySet),
      s"composed blocking produced pairs outside the exact set: ${blocked -- exact.keySet}")
    val maxCos = if (exact.isEmpty) 0.0 else exact.values.max
    info(f"corpus pairs: exact=${exact.size} blocked=${blocked.size} " +
      f"strongest exact pair cos=$maxCos%.3f")
    // no true near-dups exist in the corpus (strongest pair is weak), so
    // only the failure DIRECTION is pinned here, not a recall floor
    assert(maxCos < 0.60, "corpus grew a genuine near-dup; revisit this spec's premise")
  }
}
