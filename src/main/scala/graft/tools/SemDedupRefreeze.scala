package graft.tools

import org.apache.spark.sql.functions._

/** Measures the q64_semdedup remedy prescribed in SCALE.md: the SAME
  * within-cell dedup join, but under a quantizer re-frozen at k ≈ √N for
  * the corpus actually being deduped, instead of the small-SF frozen model
  * whose fixed cell count makes the pair space grow quadratically in the
  * scale factor (measured 136.7× on 100× work,
  * `SCALE_TIMINGS_x100ann4_r16.json`).
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

    // q64SemDedup's exact dedup shape (assignment, within-cell self-join on
    // lower-id mates, min-dup verdict), under the re-frozen model
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b)
    val e = e0.select($"vec_id", graft.vector.Ivf.cellOf($"v", model).as("cell"),
      $"v", sqrt(dot($"v", $"v")).as("nrm"))
    val cosR = round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4)
    val t1 = System.nanoTime()
    val dups = e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("b.vec_id") < col("a.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("lo"), cosR.as("cos_r"))
      .filter($"cos_r" >= 0.40)
      .groupBy($"vec_id").agg(min($"lo").as("dup_of"))
    val out = e.select($"vec_id", $"cell".cast("long").as("cell"))
      .join(dups, Seq("vec_id"), "left")
      .select($"vec_id", $"cell", $"dup_of",
        when($"dup_of".isNull, 1L).otherwise(0L).as("kept"))
    out.write.format("noop").mode("overwrite").save()
    val dedupS = (System.nanoTime() - t1) / 1e9
    val keptN = out.filter($"kept" === 1L).count()

    println(f"""{"metric":"semdedup_refreeze","sf":"$dir","n":$n,"k":$k,"train_s":$trainS%.1f,"dedup_s":$dedupS%.1f,"kept":$keptN}""")
    spark.stop()
  }
}
