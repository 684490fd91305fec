package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for the training-data pipeline: media as
  * opaque `binary` content + typed metadata, with feature extraction as a
  * partition-batched pass.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (`StubCodec`):
  * real image/audio codecs are not available in this environment. What IS
  * real — and tested — is everything Spark-side: the media schema, the
  * binary column handling, the `mapPartitions` batch shape (one codec
  * instance per partition, streamed row batches — the Scala analog of a
  * Pandas-UDF `mapInPandas`), and the fixed-width feature-vector contract.
  * Swapping `StubCodec` for a JNI/FFI codec changes no plan shape.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque content bytes. */
  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 feature: Array[Float])

  val FeatureDim = 32

  /** STUB decoder — deterministic fake in place of a real codec.
    * "Decodes" content into a [[FeatureDim]]-dim float vector from a byte
    * histogram; one instance per partition (mirrors per-batch model/codec
    * initialization cost in a real pipeline). */
  final class StubCodec {
    def features(content: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < content.length) {
        acc((content(i) & 0xff) % FeatureDim) += 1f
        i += 1
      }
      val n = math.max(content.length, 1).toFloat
      var j = 0
      while (j < FeatureDim) { acc(j) /= n; j += 1 }
      acc
    }

    /** STUB resize: a real implementation would decode, scale, re-encode;
      * the fake truncates/pads content to the "resized" byte budget. */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(content, math.max(w * h, 1))
  }

  /** Feature extraction: one codec per PARTITION, rows streamed through it
    * — the batch shape a Pandas UDF / mapInPandas pipeline has, so executor
    * memory holds one batch of decoded media, never the partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new StubCodec // per-partition init (model load, in real life)
      rows.map(r => MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
        codec.features(r.content)))
    }
  }

  /** Frame sampling for "video" content: every k-th fixed-size byte window
    * as one frame row (explode keeps it distributed; no driver collects). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.content.grouped(frameBytes).zipWithIndex
        .collect { case (frame, idx) if idx % everyK == 0 =>
          (r.media_id, idx.toLong, frame)
        }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Test/demo adapter: synthesize media rows from the `documents` table
    * (text bytes as content; metadata derived deterministically). The
    * testdata ships no true binary table — this is the documented seam. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        concat(lit("img-"), col("source")).as("kind"),
        col("text").cast("binary").as("content"),
        struct(
          (length(col("text")) % 640 + 1).cast("int").as("width"),
          (length(col("text")) % 480 + 1).cast("int").as("height"),
          lit(0).as("sampleRate"),
          lit(0L).as("durationMs")).as("meta"))
      .as[MediaRow]
  }
}
