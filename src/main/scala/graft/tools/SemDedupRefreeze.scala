package graft.tools

import org.apache.spark.sql.functions._

/** Measures the q64_semdedup remedy prescribed in SCALE.md: the SAME
  * operator ([[graft.queries.VectorQueries.semDedup]] — assignment,
  * within-cell self-join on lower-id mates, min-dup verdict, final
  * vec_id sort, default-on cell-population guard), but under a quantizer
  * re-frozen at k ≈ √N for the corpus actually being deduped, instead of
  * the small-SF frozen model whose fixed cell count makes the pair space
  * grow quadratically in the scale factor (measured 136.7× on 100× work,
  * `SCALE_TIMINGS_x100ann4_r16.json`).
  *
  * Since r17 this is not a parallel copy of the dedup shape: it calls the
  * gated operator with a re-frozen model, so the timed pipeline is
  * pixel-identical to what Bench times under the gate default — including
  * the final orderBy and the guard pre-agg (which the re-frozen model must
  * PASS: cap = 32 × k(√N) ≫ the ≈√N healthy cell).
  *
  * Usage: `tools/run_graft.sh graft.tools.SemDedupRefreeze [sfDir] [k]`
  * (k defaults to round(√N) — FreezeIvf's sizing rule). Prints one JSON
  * line with the train and dedup wall seconds so the re-frozen dedup cost
  * can sit next to the fixed-k number in SCALE.md.
  */
object SemDedupRefreeze {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10")
    val spark = graft.GraftSession.local(appName = "graft-semdedup-refreeze")
    import spark.implicits._

    val e0 = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val n = e0.count()
    val k = args.lift(1).map(_.toInt)
      .getOrElse(math.round(math.sqrt(n.toDouble)).toInt.max(2))

    val t0 = System.nanoTime()
    val model = graft.vector.Ivf.train(e0, k = k, iterations = 2)
    val trainS = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val out = graft.queries.VectorQueries.semDedup(spark, dir, model).persist()
    out.write.format("noop").mode("overwrite").save()
    val dedupS = (System.nanoTime() - t1) / 1e9
    // kept from the persisted result — no second dedup execution
    val keptN = out.filter($"kept" === 1L).count()
    out.unpersist()

    println(f"""{"metric":"semdedup_refreeze","sf":"$dir","n":$n,"k":$k,"train_s":$trainS%.1f,"dedup_s":$dedupS%.1f,"kept":$keptN}""")
    spark.stop()
  }
}
