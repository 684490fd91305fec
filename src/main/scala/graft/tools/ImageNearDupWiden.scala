package graft.tools

import org.apache.spark.sql.functions._

/** Measures the q127_image_neardup remedy: the SAME gated operator
  * ([[graft.queries.MultimodalQueries.imageNearDup]] — hash, band
  * blocking, default-on pair-volume guard, band join, Hamming verify,
  * final sort) under a band width appropriate for the corpus, instead of
  * the 16-bit gate geometry whose fixed 2^16 bucket vocabulary makes the
  * candidate-pair space grow quadratically in the corpus (the r17 family
  * sweep's finding — q127's analogue of q64's fixed-k quantizer).
  *
  * Usage: `tools/run_graft.sh graft.tools.ImageNearDupWiden [sfDir] [bandBits]`
  * (bandBits defaults to 32 — bucket vocabulary 2^32, which keeps the
  * ×100 corpus's expected bucket population below 1). Prints one JSON
  * line with the wall seconds and result count; the guard must PASS at
  * the widened geometry, which is itself part of what this measures.
  */
object ImageNearDupWiden {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10")
    val bits = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = graft.GraftSession.local(appName = "graft-imageneardup-widen")
    import spark.implicits._

    val t0 = System.nanoTime()
    val out = graft.queries.MultimodalQueries.imageNearDup(spark, dir, bits).persist()
    out.write.format("noop").mode("overwrite").save()
    val wallS = (System.nanoTime() - t0) / 1e9
    val pairs = out.count()
    val exact = out.filter($"ham_a" === 0L).count()
    out.unpersist()

    println(f"""{"metric":"imageneardup_widen","sf":"$dir","band_bits":$bits,"wall_s":$wallS%.1f,"dup_pairs":$pairs,"exact_pairs":$exact}""")
    spark.stop()
  }
}
