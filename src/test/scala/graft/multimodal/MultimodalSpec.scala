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

  test("q127: pair-volume guard is ON by default, trips on a low cap, <= 0 disables") {
    import graft.queries.MultimodalQueries
    val s = spark
    val dir = "/root/testdata/sf0.001"
    assert(s.conf.getOption("spark.graft.imageneardup.maxPairsPerMedia").isEmpty)
    // default cap passes the gate corpus
    assert(MultimodalQueries.q127ImageNearDup(s, dir).collect().nonEmpty)
    // every rendition trio shares band buckets by construction, so
    // pairs/media > 1 at any SF and cap=1 must trip
    s.conf.set("spark.graft.imageneardup.maxPairsPerMedia", "1")
    try {
      val ex = intercept[IllegalStateException] {
        MultimodalQueries.q127ImageNearDup(s, dir).collect()
      }
      assert(ex.getMessage.contains("maxPairsPerMedia=1"), ex.getMessage)
      assert(ex.getMessage.contains("bandBits=32"), "the error must name the wider-band remedy")
      // <= 0 disables: the same corpus runs
      s.conf.set("spark.graft.imageneardup.maxPairsPerMedia", "-1")
      assert(MultimodalQueries.q127ImageNearDup(s, dir).collect().nonEmpty)
      // malformed value names the key
      s.conf.set("spark.graft.imageneardup.maxPairsPerMedia", "many")
      val bad = intercept[IllegalArgumentException] {
        MultimodalQueries.q127ImageNearDup(s, dir).collect()
      }
      assert(bad.getMessage.contains("spark.graft.imageneardup.maxPairsPerMedia"))
    } finally s.conf.unset("spark.graft.imageneardup.maxPairsPerMedia")
  }

  test("q127: wider bands (the scale path) keep every exact-hash duplicate pair") {
    import graft.queries.MultimodalQueries
    val dir = "/root/testdata/sf0.001"
    def ham0(bits: Int) = MultimodalQueries.imageNearDup(spark, dir, bits)
      .filter("ham_a = 0").select("media_a", "media_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val at16 = ham0(16)
    val at32 = ham0(32)
    assert(at16.nonEmpty, "the rendition fixture guarantees exact-hash dups")
    // identical hashes share every band at any width — invariant recall
    assert(at16 === at32,
      "band widening may only shed the far tail (ham > nBands-1), never exact dups")
    intercept[IllegalArgumentException](MultimodalQueries.imageNearDup(spark, dir, 24))
  }
}
