package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column query surface (oracle-checkable slice): binary content
  * + metadata column algebra. The partition-batched stub-decode path lives
  * in [[graft.multimodal.Multimodal]] (mapPartitions is not
  * SQL-expressible, so it is covered by unit tests instead of the oracle).
  */
object MultimodalQueries {

  /** q28_media_meta — media table synthesized from documents (text bytes as
    * opaque content), then pure binary/metadata column algebra: byte
    * length, content digest, stub "dimensions". Everything here runs in one
    * codegen pass over the scan — the shape a metadata-pruning pass over
    * 100 TB of media has (never decode to answer metadata queries). */
  def q28MediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id".as("media_id"),
        $"text".cast("binary").as("content"),
        $"source")
      .select(
        $"media_id",
        concat(lit("img-"), $"source").as("kind"),
        length($"content").cast("long").as("n_bytes"),
        md5($"content").as("content_md5"),
        (length($"content") % 640 + 1).cast("int").as("width"),
        (length($"content") % 480 + 1).cast("int").as("height"))
      .orderBy($"media_id")
  }

  val q28Sql: String =
    """SELECT doc_id AS media_id,
      |  'img-' || source AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
      |  CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** q29_clustered_scan — O21 end to end: clustered bulk load of lineitem
    * (repartition + sortWithinPartitions on the cluster key), then a
    * key-range scan against the clustered table. The sorted layout gives
    * parquet row-group min/max pruning on exactly this predicate shape; the
    * oracle runs the same range scan on the raw table — identical rows
    * prove the load was lossless. */
  def q29ClusteredScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sql.CleanRoom.loadClustered(
      s, s"$dir/lineitem.parquet", "q29_lineitem_clustered", "l_orderkey")
    s.table("q29_lineitem_clustered")
      .filter($"l_orderkey" >= 100 && $"l_orderkey" <= 200)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q29Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem
      |WHERE l_orderkey BETWEEN 100 AND 200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q60_zorder_scan — multi-dimensional clustering end to end: bulk load
    * lineitem Z-ORDERED on (l_orderkey, l_partkey)
    * ([[graft.sql.CleanRoom.loadZOrdered]]), then a two-dimensional range
    * scan against the clustered table. Because the Morton sort makes every
    * file cover a small range of BOTH keys, parquet min/max stats prune
    * this predicate shape on either column — where q29's linear clustering
    * only ever prunes its one leading key. The oracle runs the same 2-D
    * range scan on the raw table: identical rows prove the z layout is a
    * pure reorganization. ZOrderSpec measures the pruning claim (scan rows
    * under a trailing-key predicate: z-layout ≪ linear layout); PlanSpec
    * pins both predicates pushed to the scan. */
  def q60ZOrderScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sql.CleanRoom.loadZOrdered(
      s, s"$dir/lineitem.parquet", "q60_lineitem_zorder",
      "l_orderkey", "l_partkey", numFiles = 32)
    s.table("q60_lineitem_zorder")
      .filter($"l_orderkey".between(1, 3000) && $"l_partkey".between(1, 150))
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus and
      // the z-rewrite destroys source order, so the sort must be total over
      // every emitted column for the row-order-strict compare
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
  }

  val q60Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem
      |WHERE l_orderkey BETWEEN 1 AND 3000 AND l_partkey BETWEEN 1 AND 150
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin

  /** q69_bucketed_join — co-located join via bucketing, end to end: load
    * customer and orders into 8-bucket tables hashed on the join key
    * ([[graft.sql.CleanRoom.loadBucketed]]), then join + aggregate. The
    * bucket layout carries the hash distribution in table metadata, so the
    * join runs with NO exchange on either side — the shuffle was paid once
    * at load, and every subsequent custkey-join against either table rides
    * it free. PlanSpec pins the no-exchange claim with auto-broadcast
    * disabled (the 100 TB shape — nothing looks broadcastable there).
    * Revenue sums ride the scale-2 integer grid (exact under any partial-
    * aggregation order). The oracle runs the same join on the raw tables:
    * identical results prove bucketing is pure layout, not semantics. */
  def q69BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sql.CleanRoom.loadBucketed(
      s, s"$dir/customer.parquet", "q69_customer_bkt", "c_custkey", 8)
    graft.sql.CleanRoom.loadBucketed(
      s, s"$dir/orders.parquet", "q69_orders_bkt", "o_custkey", 8)
    s.table("q69_customer_bkt")
      .join(s.table("q69_orders_bkt"), $"c_custkey" === $"o_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Grid.sum2($"o_totalprice").as("revenue"))
      .orderBy($"c_mktsegment")
  }

  val q69Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  (CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q120_partition_prune — directory-partition pruning end to end: bulk
    * load events partitioned on a derived `day` column
    * ([[graft.sql.CleanRoom.loadPartitioned]]), then a 7-day range
    * aggregate against the partitioned table. The day predicate is a
    * PARTITION filter — whole directories are eliminated at plan time
    * (PartitionFilters in the scan, pinned by PlanSpec together with a
    * files-read < total-files metric check), before a single row group is
    * opened. This is the #1 scan lever at 100 TB: q29/q60 skip row groups
    * WITHIN files via min/max stats, bucketing (q69) pre-pays the join
    * exchange — partition elimination skips the files themselves, so a
    * day-range query over years of data touches only its days' directories.
    * The oracle runs the same range aggregate over the raw table: layout
    * is pure reorganization (q60's recipe). Counts and the grid sum are
    * partition-order-independent; `day` exports as its ISO string (q94's
    * DATE convention). */
  def q120PartitionPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the raw read bypasses Tables.events, so the partition derivation must
    // dispatch on the shipped encoding exactly as that loader does: nanos
    // land as long (nanosAsLong), µs as timestamp (inferTimestampNTZ off) —
    // either way the derived civil day matches Tables.events + to_date
    val tsIsLong = s.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val dayExpr =
      if (tsIsLong) expr("to_date(timestamp_micros(ts div 1000))")
      else expr("to_date(cast(ts as timestamp))")
    graft.sql.CleanRoom.loadPartitioned(
      s, s"$dir/events.parquet", "q120_events_daypart", dayExpr, "day")
    s.table("q120_events_daypart")
      .filter($"day".between(lit("2024-01-08").cast("date"),
                             lit("2024-01-14").cast("date")))
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Grid.sum2($"value").as("sum_value"))
      .select($"day".cast("string").as("day"), $"event_type", $"n", $"sum_value")
      .orderBy($"day", $"event_type")
  }

  val q120Sql: String =
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
      |  count(*) AS n,
      |  (CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) AS sum_value
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  // ---------------------------------------------------------------- q84

  /** q84_frame_sample — frame sampling under the oracle gate: the REAL
    * [[graft.multimodal.Multimodal.sampleFrames]] pass (every 4th 64-byte
    * window of each media object's content as one frame row — the stub
    * stand-in for every-k-th-video-frame extraction) over the synthesized
    * media table, exporting per frame its index, byte length and content
    * digest. q28 gates the metadata pass; this gates the CONTENT
    * windowing: offsets, tail-frame truncation, empty-content elision and
    * the bytes themselves (via md5) all hash-checked. The oracle replays
    * the windows with VARCHAR substrings — byte-identical on this ASCII
    * corpus (the q28 digest convention; a multi-byte corpus would need the
    * BLOB path and the gate would catch the divergence).
    *
    * Scale shape: flatMap row → its own frames only (distributed explode,
    * no driver collects, no shuffle before the output sort); frame count
    * is content-proportional and each frame carries ≤ 64 bytes + fixed
    * columns. A real codec swaps into the same per-partition batch shape
    * ([[graft.multimodal.Multimodal.StubCodec]]'s documented seam). */
  def q84FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.multimodal.Multimodal.fromDocuments(
      s, Tables.documents(s, dir))
    graft.multimodal.Multimodal.sampleFrames(media, frameBytes = 64, everyK = 4)
      .select($"media_id", $"frame_idx",
        length($"frame").cast("long").as("n_frame_bytes"),
        md5($"frame").as("frame_md5"))
      .orderBy($"media_id", $"frame_idx")
  }

  val q84Sql: String =
    """SELECT doc_id AS media_id, CAST(u.i AS BIGINT) AS frame_idx,
      |  CAST(len(substring(text, CAST(u.i * 64 + 1 AS INT), 64)) AS BIGINT)
      |    AS n_frame_bytes,
      |  md5(substring(text, CAST(u.i * 64 + 1 AS INT), 64)) AS frame_md5
      |FROM documents,
      |  UNNEST(range(0, (len(text) + 63) // 64)) AS u(i)
      |WHERE u.i % 4 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- q127

  /** q127_image_neardup — perceptual-hash image near-dup, completing the
    * multimodal family (metadata q28, content windowing q84, now content
    * near-dup): 64-bit aHash/dHash over each media object's stub-decoded
    * thumbnail ([[graft.functions.expressions.PerceptualHash]] — integer
    * average-pool into 64 cells; the public aHash/dHash recipe with the
    * byte stream standing in for decoded pixels), 4×16-bit band blocking
    * (q119's SimHash discipline — candidates ONLY from equal band buckets,
    * never all pairs), Hamming verify at τ = 6.
    *
    * Fixture: each qualifying document yields THREE media rows via
    * [[graft.functions.expressions.MediaRendition]] — the original, a
    * re-exposure (every byte +1; aHash/dHash are EXACTLY invariant: pooled
    * values and threshold shift together), and a quantization-noise
    * re-encode (+1 every 16th byte; lands a small nonzero Hamming away).
    * The gate therefore checks, at every SF: exact hash computation (a
    * one-bit error splits every rendition pair), the invariance property
    * (ham_a = 0 for all re-exposure pairs), band-blocking replay, and the
    * Hamming arithmetic (ham_d exported unfiltered as the dHash witness).
    *
    * Scale shape: hashes are one codegen pass over the scan (no decode —
    * 64 longs of state per row); banding emits 64/bandBits int rows per
    * media object; the band self-join shuffles only (band_idx, band_val,
    * ids, hashes) — expected bucket population N/2^bandBits per band, the
    * same corpus-growing blocking-cardinality story as q119: a FIXED band
    * width means bucket populations grow with the corpus and the Σ pop²
    * pair space outruns it (the r17 family sweep measured the 16-bit gate
    * geometry super-proportional at ×100 — see SCALE.md). The scale path
    * is the scaladoc's own prescription made a parameter: widen bandBits
    * with log₂N ([[imageNearDup]]; 32-bit bands keep the ×100 corpus
    * linear). Pigeonhole: ham ≤ (64/bandBits − 1) is GUARANTEED a shared
    * band; beyond that recall is the standard LSH band trade — widening
    * bands trades guaranteed-recall radius for bucket sparsity, exactly
    * like raising MinHash band size. A pair-volume guard runs BY DEFAULT
    * ([[ImageNearDupGuardPairsPerMedia]] candidate band-pairs per media
    * row): one cheap pre-agg computes Σ pop·(pop−1)/2 over the band
    * buckets and fails loudly — naming the ratio, the hottest bucket and
    * this remedy — before the join can run quadratically.
    * `spark.graft.imageneardup.maxPairsPerMedia` overrides; ≤ 0 disables.
    * Bytes ≥ 0xff would wrap (`& 0xff`) where the oracle's codepoint
    * arithmetic doesn't — ASCII-corpus precondition, as q84. */
  def q127ImageNearDup(s: SparkSession, dir: String): DataFrame =
    imageNearDup(s, dir, bandBits = 16)

  /** Candidate band-pairs per media row above which [[imageNearDup]]'s
    * default guard trips. Gate reality (measured r17): the 16-bit geometry
    * reads ~2–4 pairs/media at the gate SFs; the cap leaves ~16× headroom
    * for dup-dense corpora while catching the ×100 blowup (hundreds+). */
  val ImageNearDupGuardPairsPerMedia = 64L

  /** The q127 near-dup, parameterized on the band width so a corpus that
    * outgrows the 2^bandBits bucket vocabulary runs the measured
    * scale-safe wider-band path through the SAME operator the gate
    * checks. bandBits must divide 64 (8/16/32; the gate default is 16). */
  def imageNearDup(s: SparkSession, dir: String, bandBits: Int): DataFrame = {
    import s.implicits._
    val bands = mediaBands(s, dir, bandBits)
    val nBands = 64 / bandBits
    val capKey = "spark.graft.imageneardup.maxPairsPerMedia"
    val cap = s.conf.getOption(capKey) match {
      case Some(v) =>
        try v.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$capKey must be a long (<= 0 disables the guard), got '$v'")
        }
      case None => ImageNearDupGuardPairsPerMedia
    }
    if (cap > 0) {
      val (pairs, hottest, nMedia) = bandPairStats(s, dir, bandBits)
      if (nMedia > 0 && pairs > cap * nMedia) {
        val remedy =
          if (bandBits < 32)
            "Widen the bands (imageNearDup(bandBits=32)) before running near-dup at this scale"
          else
            "Bands are already at maximum width, so the excess is genuine duplicate-class " +
              "density - pair ENUMERATION is quadratic in class size by definition; emit " +
              "verdicts instead (the q64/q40 keep-one-per-class shape)"
        throw new IllegalStateException(
          s"image-neardup pair-volume guard: the ${bandBits}-bit band join would generate " +
            s"$pairs candidate pairs for $nMedia media rows (${pairs / nMedia}/media > " +
            s"maxPairsPerMedia=$cap; hottest bucket holds $hottest) - the bucket vocabulary " +
            s"(${nBands}x2^$bandBits) is too small for this corpus. $remedy, " +
            s"or override/disable the cap via $capKey.")
      }
    }
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.ah").as("ah_a"), col("b.ah").as("ah_b"),
        col("a.dh").as("dh_a"), col("b.dh").as("dh_b"))
      .distinct()
    cand.select($"media_a", $"media_b",
        bit_count($"ah_a".bitwiseXOR($"ah_b")).cast("long").as("ham_a"),
        bit_count($"dh_a".bitwiseXOR($"dh_b")).cast("long").as("ham_d"))
      .filter($"ham_a" <= 6)
      .orderBy($"media_a", $"media_b")
  }

  /** The (media_id, ah, dh, band_idx, band_val) relation the q127 band
    * join runs on — hashes in one codegen pass, bands by shift+mask. */
  private def mediaBands(s: SparkSession, dir: String, bandBits: Int) = {
    import s.implicits._
    require(Seq(8, 16, 32).contains(bandBits),
      s"bandBits must be 8, 16 or 32 (got $bandBits): bands must tile the 64-bit hash")
    val nBands = 64 / bandBits
    val mask = (1L << bandBits) - 1L
    val media = Tables.documents(s, dir)
      .filter(length($"text") >= 64)
      .select($"doc_id", explode(array(lit(0), lit(1), lit(2))).as("rend"),
        $"text".cast("binary").as("content"))
      .select(($"doc_id" * 10 + $"rend").as("media_id"),
        call_function("graft_media_rendition", $"content", $"rend").as("content"))
    val hashed = media.select($"media_id",
      call_function("graft_ahash", $"content").as("ah"),
      call_function("graft_dhash", $"content").as("dh"))
    hashed.select($"media_id", $"ah", $"dh",
      posexplode(array((0 until nBands).map(k =>
        shiftrightunsigned($"ah", bandBits * k).bitwiseAND(lit(mask))): _*))
        .as(Seq("band_idx", "band_val")))
  }

  /** (candidate band-pairs, hottest bucket population, media rows) for the
    * q127 band geometry — the guard's pre-agg, exposed so the band-width
    * decision is profilable without running the join (tools/BandPairProfile). */
  def bandPairStats(s: SparkSession, dir: String, bandBits: Int): (Long, Long, Long) = {
    import s.implicits._
    val nBands = 64 / bandBits
    val r = mediaBands(s, dir, bandBits)
      .groupBy($"band_idx", $"band_val").agg(count(lit(1)).as("pop"))
      .agg(coalesce(sum($"pop" * ($"pop" - 1)), lit(0L)).as("pairs2"),
        coalesce(max($"pop"), lit(0L)).as("hottest"),
        coalesce(sum($"pop"), lit(0L)).as("bandRows"))
      .collect()(0)
    (r.getLong(0) / 2, r.getLong(1), r.getLong(2) / nBands)
  }

  /** The oracle never reconstructs rendition STRINGS: the hash depends only
    * on per-position byte values, so the rendition transform is applied
    * directly to the codepoint inside the position CTE. */
  val q127Sql: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents WHERE len(text) >= 64
      |),
      |pos AS (
      |  SELECT doc_id, r.r AS rend,
      |    CAST(p.p * 64 // len(text) AS INT) AS cell,
      |    ord(substring(text, CAST(p.p + 1 AS INT), 1))
      |      + CASE WHEN r.r = 1 OR (r.r = 2 AND p.p % 16 = 0) THEN 1 ELSE 0 END AS b
      |  FROM base, UNNEST(range(0, len(text))) AS p(p), UNNEST(range(0, 3)) AS r(r)
      |),
      |cellavg AS (
      |  SELECT doc_id, rend, cell, SUM(b) // COUNT(*) AS v
      |  FROM pos GROUP BY doc_id, rend, cell
      |),
      |thresh AS (
      |  SELECT doc_id, rend, SUM(v) // 64 AS t FROM cellavg GROUP BY doc_id, rend
      |),
      |bits AS (
      |  SELECT c.doc_id, c.rend, c.cell,
      |    CASE WHEN c.v > t.t THEN 1 ELSE 0 END AS bit_a,
      |    CASE WHEN c.v > coalesce(lead(c.v) OVER w, first_value(c.v) OVER w)
      |      THEN 1 ELSE 0 END AS bit_d
      |  FROM cellavg c JOIN thresh t ON c.doc_id = t.doc_id AND c.rend = t.rend
      |  WINDOW w AS (PARTITION BY c.doc_id, c.rend ORDER BY c.cell)
      |),
      |bands AS (
      |  SELECT doc_id * 10 + rend AS media_id, cell // 16 AS band_idx,
      |    SUM(bit_a * (1 << (cell % 16))) AS aband,
      |    SUM(bit_d * (1 << (cell % 16))) AS dband
      |  FROM bits GROUP BY doc_id, rend, cell // 16
      |),
      |cand AS (
      |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.aband = b.aband
      |      AND a.media_id < b.media_id
      |),
      |hams AS (
      |  SELECT c.media_a, c.media_b,
      |    CAST(SUM(bit_count(xor(x.aband, y.aband))) AS BIGINT) AS ham_a,
      |    CAST(SUM(bit_count(xor(x.dband, y.dband))) AS BIGINT) AS ham_d
      |  FROM cand c
      |  JOIN bands x ON x.media_id = c.media_a
      |  JOIN bands y ON y.media_id = c.media_b AND y.band_idx = x.band_idx
      |  GROUP BY c.media_a, c.media_b
      |)
      |SELECT media_a, media_b, ham_a, ham_d FROM hams
      |WHERE ham_a <= 6
      |ORDER BY media_a, media_b""".stripMargin

  // ---------------------------------------------------------------- q132

  /** q132_audio_segments — energy-threshold voice-activity segmentation
    * (VAD), the audio-modality op that completes the multimodal family
    * (metadata q28, frame windowing q84, image near-dup q127, now
    * content SEGMENTATION): each media object's sampled frames (q84's
    * every-4th-64-byte grid, the stub for fixed-width PCM blocks) get an
    * ENERGY = Σ unsigned byte values via the native codegen'd
    * [[graft.functions.expressions.ByteEnergy]]; frames whose mean byte
    * value sits under τ = 94.5 (the corpus median — both classes present
    * at every SF) are "silent"; consecutive same-class frames fuse into
    * runs (gaps-and-islands, q72's fuse) — the segment inventory an audio
    * pipeline feeds to transcription (skip silence, batch voiced spans).
    *
    * The threshold compare is INTEGER (`energy·10 < n_bytes·945`) — no
    * float crosses the engine boundary. A real decoder swaps in at the
    * documented StubCodec seam; energy-over-samples and the islands fuse
    * are unchanged by that swap.
    *
    * Scale shape: energy is one O(bytes) codegen'd loop per frame riding
    * q84's distributed flatMap (no shuffle before the windows); the two
    * row_numbers and the run aggregation share ONE media_id-keyed
    * exchange; runs per media ≤ frames per media — content-proportional,
    * the q84 class. */
  def q132AudioSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.multimodal.Multimodal.fromDocuments(
      s, Tables.documents(s, dir))
    val frames = graft.multimodal.Multimodal
      .sampleFrames(media, frameBytes = 64, everyK = 4)
      .select($"media_id", $"frame_idx",
        length($"frame").cast("long").as("n_bytes"),
        call_function("graft_byte_energy", $"frame").as("energy"))
      .withColumn("silent",
        when($"energy" * 10 < $"n_bytes" * 945, lit(1L)).otherwise(lit(0L)))
    val wAll = Window.partitionBy($"media_id").orderBy($"frame_idx")
    val wFlag = Window.partitionBy($"media_id", $"silent").orderBy($"frame_idx")
    frames
      .withColumn("run_key",
        row_number().over(wAll) - row_number().over(wFlag))
      .groupBy($"media_id", $"silent", $"run_key")
      .agg(min($"frame_idx").as("start_frame"),
        count(lit(1)).as("n_frames"),
        sum($"energy").as("energy_sum"))
      .select($"media_id", $"start_frame", $"n_frames", $"silent", $"energy_sum")
      .orderBy($"media_id", $"start_frame")
  }

  /** q132 oracle: q84's frame windows, per-char codepoint energy (byte ≡
    * codepoint on this ASCII corpus), the identical integer threshold and
    * the row_number-difference islands fuse. */
  val q132Sql: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id, CAST(u.i AS BIGINT) AS frame_idx,
      |    substring(text, CAST(u.i * 64 + 1 AS INT), 64) AS fr
      |  FROM documents,
      |    UNNEST(range(0, (len(text) + 63) // 64)) AS u(i)
      |  WHERE u.i % 4 = 0),
      |e AS (
      |  SELECT media_id, frame_idx, CAST(len(fr) AS BIGINT) AS n_bytes,
      |    CAST(list_sum([unicode(c) for c in string_split_regex(fr, '')]) AS BIGINT) AS energy
      |  FROM f),
      |fl AS (
      |  SELECT *, CAST(CASE WHEN energy * 10 < n_bytes * 945 THEN 1 ELSE 0 END AS BIGINT) AS silent
      |  FROM e),
      |rk AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY media_id ORDER BY frame_idx)
      |    - row_number() OVER (PARTITION BY media_id, silent ORDER BY frame_idx) AS run_key
      |  FROM fl)
      |SELECT media_id, min(frame_idx) AS start_frame,
      |  count(*) AS n_frames, silent, CAST(sum(energy) AS BIGINT) AS energy_sum
      |FROM rk GROUP BY media_id, silent, run_key
      |ORDER BY media_id, start_frame""".stripMargin

  // ---------------------------------------------------------------- q145

  /** q145_scene_cuts — shot-boundary detection on the visual modality:
    * a cut is a frame whose MEAN byte energy jumps ≥ 5.0/byte against the
    * previous sampled frame. q132 segments by absolute level (silence
    * islands); this is its temporal-DELTA dual — the standard first pass
    * of video understanding (shot boundaries feed scene-level sampling,
    * dedup, and captioning budgets), here over the same deterministic
    * byte-frame stand-in as q84/q132 (the real pixel decode is the
    * documented container limitation; the Spark-side plumbing is real).
    *
    * Engine-exact: the mean-delta comparison is CROSS-MULTIPLIED —
    * `|e·pn − pe·n| · 10 ≥ 50 · n · pn` — so the flag never divides;
    * the exported magnitude divides once onto the e6 grid with identical
    * formula text both engines (floor of an exact-int64 ratio, q133's
    * convention). Threshold 5.0/byte sits at the corpus's p90 transition
    * delta (profiled), so cuts are sparse but present at every SF.
    *
    * Scale shape: ONE media-keyed exchange for the lag window; the
    * energy pass is the native codegen'd `graft_byte_energy` scan
    * (content-proportional, no shuffle); only cut rows export. */
  def q145SceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = graft.multimodal.Multimodal.fromDocuments(
      s, Tables.documents(s, dir))
    val w = Window.partitionBy($"media_id").orderBy($"frame_idx")
    graft.multimodal.Multimodal
      .sampleFrames(media, frameBytes = 64, everyK = 4)
      .select($"media_id", $"frame_idx",
        length($"frame").cast("long").as("n"),
        call_function("graft_byte_energy", $"frame").as("en"))
      .withColumn("pn", lag($"n", 1).over(w))
      .withColumn("pen", lag($"en", 1).over(w))
      .filter($"pn".isNotNull &&
        abs($"en" * $"pn" - $"pen" * $"n") * 10 >= lit(50L) * $"n" * $"pn")
      .select($"media_id", $"frame_idx",
        floor(lit(1000000.0) * abs($"en" * $"pn" - $"pen" * $"n") /
          ($"n" * $"pn").cast("double")).cast("long").as("delta_e6"))
      .orderBy($"media_id", $"frame_idx")
  }

  /** q145 oracle: q132's frame/energy replay, the lag pair, the
    * cross-multiplied flag, and the single e6 division. */
  val q145Sql: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id, CAST(u.i AS BIGINT) AS frame_idx,
      |    substring(text, CAST(u.i * 64 + 1 AS INT), 64) AS fr
      |  FROM documents,
      |    UNNEST(range(0, (len(text) + 63) // 64)) AS u(i)
      |  WHERE u.i % 4 = 0),
      |e AS (
      |  SELECT media_id, frame_idx, CAST(len(fr) AS BIGINT) AS n,
      |    CAST(list_sum([unicode(c) for c in string_split_regex(fr, '')]) AS BIGINT) AS en
      |  FROM f),
      |d AS (
      |  SELECT media_id, frame_idx, n, en,
      |    lag(n) OVER w AS pn, lag(en) OVER w AS pen
      |  FROM e WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx))
      |SELECT media_id, frame_idx,
      |  CAST(floor(1000000.0 * abs(en * pn - pen * n)
      |       / CAST(n * pn AS DOUBLE)) AS BIGINT) AS delta_e6
      |FROM d
      |WHERE pn IS NOT NULL AND abs(en * pn - pen * n) * 10 >= 50 * n * pn
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- q211

  /** q211_av_align — audio/visual alignment: every q132 audio segment
    * annotated with the q145 scene cuts that fall INSIDE its frame
    * span (cut count + first cut) — the A/V synchronization shape
    * (subtitles→shots, VAD→scene sampling) a multimodal curation
    * pipeline runs after both single-modality passes, here composed
    * from the ENGINE'S OWN operators: the two derivations are the
    * production q132/q145 plans verbatim, and the alignment is one
    * media-keyed interval-stab join.
    *
    * Scale shape: both sides are already media-keyed; the stab join's
    * equi key is media_id with the span test as residual — per-media
    * work is segments × cuts of ONE document, never cross-media. */
  def q211AvAlign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seg = q132AudioSegments(s, dir)
      .select($"media_id", $"start_frame", $"n_frames", $"silent")
    val cuts = q145SceneCuts(s, dir)
      .select($"media_id".as("cm"), $"frame_idx".as("cut"))
    seg.join(cuts,
        $"cm" === $"media_id" && $"cut" >= $"start_frame" &&
          $"cut" <= $"start_frame" + lit(4L) * ($"n_frames" - 1), "left")
      .groupBy($"media_id", $"start_frame", $"n_frames", $"silent")
      .agg(count($"cut").as("n_cuts"),
        coalesce(min($"cut"), lit(-1L)).as("first_cut"))
      .orderBy($"media_id", $"start_frame")
  }

  /** q211 oracle: both single-modality pipelines inlined + the
    * declarative stab join. */
  val q211Sql: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id, CAST(u.i AS BIGINT) AS frame_idx,
      |    substring(text, CAST(u.i * 64 + 1 AS INT), 64) AS fr
      |  FROM documents,
      |    UNNEST(range(0, (len(text) + 63) // 64)) AS u(i)
      |  WHERE u.i % 4 = 0),
      |e AS (
      |  SELECT media_id, frame_idx, CAST(len(fr) AS BIGINT) AS nb,
      |    CAST(list_sum([unicode(c) for c in string_split_regex(fr, '')])
      |         AS BIGINT) AS en
      |  FROM f),
      |fl AS (
      |  SELECT *, CAST(CASE WHEN en * 10 < nb * 945 THEN 1 ELSE 0 END
      |         AS BIGINT) AS silent
      |  FROM e),
      |rk AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY media_id ORDER BY frame_idx)
      |    - row_number() OVER (PARTITION BY media_id, silent
      |                         ORDER BY frame_idx) AS run_key
      |  FROM fl),
      |seg AS (
      |  SELECT media_id, CAST(min(frame_idx) AS BIGINT) AS start_frame,
      |    CAST(count(*) AS BIGINT) AS n_frames, silent
      |  FROM rk GROUP BY media_id, silent, run_key),
      |d AS (
      |  SELECT media_id, frame_idx, nb, en,
      |    lag(nb) OVER w AS pn, lag(en) OVER w AS pen
      |  FROM e WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)),
      |cuts AS (
      |  SELECT media_id, frame_idx AS cut
      |  FROM d WHERE pn IS NOT NULL
      |    AND abs(en * pn - pen * nb) * 10 >= 50 * nb * pn),
      |j AS (
      |  SELECT seg.media_id, seg.start_frame, seg.n_frames, seg.silent,
      |    CAST(count(cuts.cut) AS BIGINT) AS n_cuts,
      |    CAST(coalesce(min(cuts.cut), -1) AS BIGINT) AS first_cut
      |  FROM seg LEFT JOIN cuts
      |    ON cuts.media_id = seg.media_id
      |   AND cuts.cut >= seg.start_frame
      |   AND cuts.cut <= seg.start_frame + 4 * (seg.n_frames - 1)
      |  GROUP BY 1, 2, 3, 4)
      |SELECT * FROM j ORDER BY media_id, start_frame""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q211_av_align" -> (q211AvAlign _),
    "q145_scene_cuts" -> (q145SceneCuts _),
    "q132_audio_segments" -> (q132AudioSegments _),
    "q28_media_meta"    -> (q28MediaMeta _),
    "q84_frame_sample"  -> (q84FrameSample _),
    "q29_clustered_scan" -> (q29ClusteredScan _),
    "q60_zorder_scan"   -> (q60ZOrderScan _),
    "q69_bucketed_join" -> (q69BucketedJoin _),
    "q120_partition_prune" -> (q120PartitionPrune _),
    "q127_image_neardup" -> (q127ImageNearDup _))

  val oracles: Map[String, String] = Map(
    "q211_av_align" -> q211Sql,
    "q145_scene_cuts" -> q145Sql,
    "q132_audio_segments" -> q132Sql,
    "q28_media_meta"    -> q28Sql,
    "q84_frame_sample"  -> q84Sql,
    "q29_clustered_scan" -> q29Sql,
    "q60_zorder_scan"   -> q60Sql,
    "q69_bucketed_join" -> q69Sql,
    "q120_partition_prune" -> q120Sql,
    "q127_image_neardup" -> q127Sql)
}
