package graft.tools

/** Profiles q127's band-blocking geometry without running the pair join:
  * for each requested band width, prints the candidate-pair count the
  * band self-join WOULD generate (Σ pop·(pop−1)/2 over buckets), the
  * hottest bucket, and the pairs/media ratio the default guard compares
  * against `ImageNearDupGuardPairsPerMedia`. This is how the band-width
  * dial is chosen for a corpus (the q127 analogue of q64's k ≈ √N rule:
  * widen bandBits with log₂N).
  *
  * Usage: `tools/run_graft.sh graft.tools.BandPairProfile <sfDir> [bits,bits...]`
  */
object BandPairProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val widths = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(16, 32))
    val spark = graft.GraftSession.local(appName = "graft-bandpair-profile")
    for (bits <- widths) {
      val (pairs, hottest, media) =
        graft.queries.MultimodalQueries.bandPairStats(spark, dir, bits)
      val ratio = if (media > 0) pairs.toDouble / media else 0.0
      println(f"""{"metric":"band_pair_profile","sf":"$dir","band_bits":$bits,"media":$media,"cand_pairs":$pairs,"pairs_per_media":$ratio%.2f,"hottest_bucket":$hottest}""")
    }
    spark.stop()
  }
}
