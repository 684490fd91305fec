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
    // every rendition trio shares band buckets by construction (at ANY
    // width — exact-hash dups share all bands), so pairs/media > 1 at any
    // SF and cap=1 must exhaust the auto-width ladder and trip
    s.conf.set("spark.graft.imageneardup.maxPairsPerMedia", "1")
    try {
      val ex = intercept[graft.GuardTripException] {
        MultimodalQueries.q127ImageNearDup(s, dir).collect()
      }
      assert(ex.getMessage.contains("maxPairsPerMedia=1"), ex.getMessage)
      assert(ex.getMessage.contains("imageNearDupVerdicts"),
        "the exhausted auto path must steer to the verdict-shaped operator")
      // the EXPLICIT-width path at 16-bit names the wider-band remedy
      val ex16 = intercept[graft.GuardTripException] {
        MultimodalQueries.imageNearDup(s, dir, 16).collect()
      }
      assert(ex16.getMessage.contains("bandBits=32"), ex16.getMessage)
      // ... and at maximum width it steers to verdicts too
      val ex32 = intercept[graft.GuardTripException] {
        MultimodalQueries.imageNearDup(s, dir, 32).collect()
      }
      assert(ex32.getMessage.contains("imageNearDupVerdicts"), ex32.getMessage)
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

  test("q127 auto width: gate corpus picks 16-bit — byte-identical to the explicit path") {
    import graft.queries.MultimodalQueries
    val dir = "/root/testdata/sf0.001"
    val auto = MultimodalQueries.imageNearDupAuto(spark, dir).collect().map(_.toString)
    val at16 = MultimodalQueries.imageNearDup(spark, dir, 16).collect().map(_.toString)
    assert(auto.toSeq === at16.toSeq,
      "at gate density the auto path must choose the 16-bit geometry")
  }

  test("q127 auto width: widens to 32-bit when 16-bit overflows the cap — byte-identical to explicit 32-bit") {
    import graft.queries.MultimodalQueries
    val s = spark
    val dir = "/root/testdata/sf0.001"
    // sf0.001 geometry (tools/BandPairProfile): 16-bit reads 4.28 band-pair
    // rows/media, 32-bit reads 1.87 — cap=3 forces exactly one widening step
    s.conf.set("spark.graft.imageneardup.maxPairsPerMedia", "3")
    try {
      val auto = MultimodalQueries.imageNearDupAuto(s, dir).collect().map(_.toString)
      val at32 = MultimodalQueries.imageNearDup(s, dir, 32).collect().map(_.toString)
      assert(auto.toSeq === at32.toSeq,
        "auto must take the 32-bit path when 16-bit trips the cap")
    } finally s.conf.unset("spark.graft.imageneardup.maxPairsPerMedia")
  }

  test("q271 verdicts: total, linear-shaped, consistent with q127's pair list") {
    import graft.queries.MultimodalQueries
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalQueries.q271ImageNearDupVerdicts(s, dir).collect()
    val pairs = MultimodalQueries.q127ImageNearDup(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // totality: one verdict per media row (3 renditions per qualifying doc)
    val nMedia = graft.Tables.documents(s, dir)
      .filter("length(text) >= 64").count() * 3
    assert(out.length.toLong === nMedia, "one verdict per media row, always")
    val byId = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)), r.getLong(3))).toMap
    byId.foreach { case (id, (dupOf, kind, kept)) =>
      assert(kept === (if (dupOf.isEmpty) 1L else 0L), s"media $id")
      assert(dupOf.isEmpty === kind.isEmpty, s"media $id: dup_kind iff dup_of")
      dupOf.foreach(lo => assert(lo < id, s"media $id: canonical must be the lower id"))
    }
    assert(byId.values.exists(_._2.contains("exact")),
      "the rendition fixture guarantees exact-hash classes")
    // every NEAR verdict names a canonical that q127's 16-bit pair list
    // confirms at ham_a <= 6 (reps are media rows; same geometry at gate)
    val nearVerdicts = byId.collect { case (id, (Some(lo), Some("near"), _)) => (lo, id) }
    assert(nearVerdicts.nonEmpty, "sf0.001 contains near (non-exact) canonical pairs")
    nearVerdicts.foreach { p =>
      assert(pairs.contains(p), s"near verdict $p must be a q127-confirmed pair")
    }
    // an exact member's canonical shares its hash class: ham 0 pair in q127
    val exactVerdicts = byId.collect { case (id, (Some(lo), Some("exact"), _)) => (lo, id) }
    exactVerdicts.foreach { p =>
      assert(pairs.contains(p), s"exact verdict $p must be a q127-confirmed pair")
    }
    // keep rule completeness: a KEPT canonical has no lower-id canonical
    // near-dup in q127's pair list (members can't witness against a rep)
    val canonicals = byId.collect { case (id, (dupOf, kind, _))
      if !kind.contains("exact") => id }.toSet
    byId.collect { case (id, (None, None, 1L)) => id }.foreach { id =>
      val witnesses = pairs.collect { case (a, b) if b == id && canonicals(a) => a }
      assert(witnesses.isEmpty,
        s"media $id kept, but canonical ${witnesses.headOption} collides in q127")
    }
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
