package graft.multimodal

import graft.{SparkSpec, Tables}

/** The real part of the multimodal plumbing: schema, partition-batched
  * extraction, frame sampling. (The codec itself is a documented stub.) */
class MultimodalSpec extends SparkSpec {

  private def media() =
    Multimodal.fromDocuments(spark, Tables.documents(spark, "/root/testdata/sf0.001"))

  test("media schema: opaque binary content + typed metadata") {
    val m = media()
    val f = m.schema
    assert(f("content").dataType.typeName === "binary")
    assert(f("meta").dataType.typeName === "struct")
    val row = m.head()
    assert(row.content.nonEmpty)
    assert(row.meta.width >= 1 && row.meta.width <= 640)
  }

  test("extractFeatures: fixed-width vectors, deterministic, distributed") {
    val feats = Multimodal.extractFeatures(media())
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.feature.length === Multimodal.FeatureDim))
    // histogram features sum to ~1 (normalized by content length)
    assert(rows.forall(r => math.abs(r.feature.map(_.toDouble).sum - 1.0) < 1e-3))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media()).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("sampleFrames: every k-th fixed-size window, no driver collect") {
    val frames = Multimodal.sampleFrames(media(), frameBytes = 64, everyK = 2)
    val one = frames.filter("media_id = 0").orderBy("frame_idx").collect()
    assert(one.nonEmpty)
    assert(one.map(_.getLong(1)).forall(_ % 2 === 0))
    assert(one.init.forall(_.getAs[Array[Byte]]("frame").length === 64))
  }

  test("stub resize honors the byte budget") {
    val codec = new Multimodal.StubCodec
    assert(codec.resize(Array.fill(100)(1.toByte), 8, 4).length === 32)
    assert(codec.resize(Array.fill(10)(1.toByte), 8, 8).length === 64)
  }
}
