package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.MultimodalQueries

/** q132's segmentation invariants on the real corpus: runs tile the sampled
  * frame grid exactly, alternate in class, and conserve energy.
  */
class AudioSegmentsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("runs partition each media's sampled frames with alternating classes") {
    val s = spark
    import s.implicits._
    val runs = MultimodalQueries.q132AudioSegments(spark, dir).cache()

    // both classes occur corpus-wide (threshold is live at every SF)
    assert(runs.filter($"silent" === 1).count() > 0)
    assert(runs.filter($"silent" === 0).count() > 0)

    // per media: run lengths sum to the sampled frame count, and
    // consecutive runs alternate silent/voiced (else the fuse missed)
    val frames = Multimodal
      .sampleFrames(Multimodal.fromDocuments(spark, graft.Tables.documents(spark, dir)),
        frameBytes = 64, everyK = 4)
      .groupBy($"media_id").agg(count(lit(1)).as("n_frames"),
        sum(call_function("graft_byte_energy", $"frame")).as("tot_energy"))
    val perMedia = runs.groupBy($"media_id")
      .agg(sum($"n_frames").as("run_frames"), sum($"energy_sum").as("run_energy"))
    val mismatch = frames.join(perMedia, "media_id")
      .filter($"n_frames" =!= $"run_frames" || $"tot_energy" =!= $"run_energy")
      .count()
    assert(mismatch == 0L)

    val alternations = runs
      .withColumn("prev", lag($"silent", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"media_id").orderBy($"start_frame")))
      .filter($"prev".isNotNull && $"prev" === $"silent").count()
    assert(alternations == 0L)
    runs.unpersist()
  }

  test("native graft_byte_energy equals the composable char-code sum") {
    val s = spark
    import s.implicits._
    val diff = graft.Tables.documents(spark, dir)
      .filter(length($"text") > 0)
      .select(
        call_function("graft_byte_energy", $"text".cast("binary")).as("native"),
        aggregate(transform(split($"text", ""), c => ascii(c).cast("long")),
          lit(0L), (acc, x) => acc + x).as("composed"))
      .filter($"native" =!= $"composed").count()
    assert(diff == 0L)
  }
}
