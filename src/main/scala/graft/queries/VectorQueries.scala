package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  * Both engines compute cosine in FLOAT64 (elements widened exactly from
  * float32), and every exported similarity is `round(cos, 4)` — rank and
  * filter both use the ROUNDED value, so a last-ulp difference in summation
  * order between engines cannot flip a rank or a threshold.
  *
  * All vector math runs through the native codegen'd `graft_dot`
  * expression — no UDFs, no interpreted lambdas, no driver-side collects.
  */
object VectorQueries {

  private def dvec(c: Column): Column = transform(c, x => x.cast("double"))
  /** Native codegen'd dot product ([[graft.functions.expressions.DotProduct]],
    * registered as `graft_dot` by GraftExtensions) — the interpreted
    * `aggregate(zip_with(...))` formulation is ~10× slower per pair. */
  private def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** DuckDB fragment: cosine of two DOUBLE lists `$a` and `$b`. */
  private def duckCos(a: String, b: String): String =
    s"""list_sum([$a[i] * $b[i] for i in range(1, len($a)+1)])
       |      / (sqrt(list_sum([x*x for x in $a])) * sqrt(list_sum([x*x for x in $b])))""".stripMargin

  // ---------------------------------------------------------------- q25

  /** q25_ann_topk — exact top-3 cosine neighbors for the first 5 vectors:
    * the brute-force ANN baseline. The k query vectors are BROADCAST
    * against one scan of the embedding table — at 100 TB this is the
    * correct shape (k × N work, one pass, no shuffle of the big side);
    * the IVF-style scale path (probe only matching coarse cells) is
    * q26's blocked join. */
  def q25AnnTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // norms computed once per row BEFORE the join — inside the join they
    // would be recomputed per pair
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", dvec($"embedding").as("v"))
      .select($"vec_id", $"v", norm($"v").as("nrm"))
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_r".desc, $"neighbor_id")
    e.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_r"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"neighbor_id", $"cos_r")
      .orderBy($"q_id", $"rank")
  }

  val q25Sql: String =
    s"""WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |prs AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS neighbor_id,
       |    round(${duckCos("q.v", "n.v")}, 4) AS cos_r
       |  FROM e q JOIN e n ON q.vec_id < 5 AND n.vec_id <> q.vec_id)
       |SELECT q_id, rank, neighbor_id, cos_r FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |  FROM prs) t
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- q26

  /** q26_embed_neardup — embedding-cosine near-dup pairs with BLOCKED
    * self-join: only vectors sharing BOTH the `label` column (the semantic
    * partition a curation pass would respect anyway) AND a frozen-quantizer
    * cell ([[graft.vector.IvfFrozen]], q64's recipe) are compared.
    *
    * The composed key is what makes the blocking scale-safe: `label` alone
    * has FIXED cardinality, so per-label population grows linearly with N
    * and within-block pairs grow QUADRATICALLY (measured 6.7× wall at ×10
    * when this query blocked on label only). The quantizer cell count is
    * re-frozen at k ≈ √N as the corpus grows, so blocks stay ~constant-
    * sized and total pairs stay ~N·(N/(|label|·k)) — linear-ish in N, the
    * q64 sizing rule. Recall cost of the extra key: genuinely near-
    * duplicate embeddings quantize to the same nearest centroid almost
    * surely — Q26BlockSpec plants 100 clone pairs (cos ≈ 0.999, LshSpec's
    * scaled-copy recipe) and measures 100/100 recall through the composed
    * key. The corpus's own gate-passing pairs are NOT near-dups (the
    * strongest same-label pair at sf0.01 is cos 0.475 — random coincidence
    * territory in a synthetic corpus; the 0.30 export gate exists so every
    * scale factor emits rows), and many straddle cells; the spec pins that
    * the composed key only ever REMOVES pairs relative to label-only
    * blocking, never invents them.
    * The exported `cell` column is the observability half: a consumer can
    * see exactly which cell produced a pair and audit block sizes with a
    * GROUP BY. Assignment replays in DuckDB from the literal centroid
    * matrix (q30/q64's trick), so the composed blocking sits fully under
    * the oracle gate. */
  def q26EmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    q26Pairs(s, dir).orderBy($"vec_a", $"vec_b")
  }

  /** q26's gated pair set without the output sort — shared verbatim with
    * q105's mutual-NN matcher, so both run the SAME blocking and gate. */
  private def q26Pairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val model = graft.vector.IvfFrozen.model
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", dvec($"embedding").as("v"))
      .select($"vec_id", $"label",
        graft.vector.Ivf.cellOf($"v", model).as("cell"),
        $"v", norm($"v").as("nrm"))
    val cosR = round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4)
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"), col("a.cell").cast("long").as("cell"),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosR.as("cos_r"))
      .filter($"cos_r" >= 0.30)
  }

  /** q26 oracle: q30/q64's frozen-centroid assignment fragment (carrying
    * `label` through), then the label×cell-blocked pair scan. */
  def q26Sql: String = {
    def sq(v: String, c: String) =
      s"list_sum([($v[i]-$c[i])*($v[i]-$c[i]) for i in range(1, len($v)+1)])"
    s"""WITH cents(cell, c) AS (VALUES
       |    $centroidValues),
       |e AS (SELECT vec_id, label, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, label, v, cell FROM (
       |    SELECT e.vec_id, e.label, e.v, cents.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY ${sq("e.v", "cents.c")}, cents.cell) AS rn
       |    FROM e CROSS JOIN cents) t WHERE rn = 1)
       |SELECT * FROM (
       |  SELECT a.label AS label, CAST(a.cell AS BIGINT) AS cell,
       |    a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    round(${duckCos("a.v", "b.v")}, 4) AS cos_r
       |  FROM assigned a JOIN assigned b
       |    ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id) t
       |WHERE cos_r >= 0.30
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // ---------------------------------------------------------------- q30

  /** q30_ann_ivf — the IVF READ path ([[graft.vector.Ivf.topK]]) under a
    * FROZEN coarse quantizer ([[graft.vector.IvfFrozen]], trained once by
    * `graft.tools.FreezeIvf`, k = 45 ≈ √N cells per the IVF sizing rule —
    * FreezeIvf derives it from the sizing corpus's row count): codegen'd
    * nearest-centroid assignment, probe the `nprobe = 4` closest cells,
    * exact cosine re-score of only the probed sliver (IvfSpec's sweep
    * measures the nprobe recall/cost dial — see the table in its
    * scaladoc). Freezing the model is both what makes the query oracle-
    * checkable (the DuckDB side replays assign/probe/re-score from the same
    * literal matrix — training alone is not SQL-expressible; IvfSpec covers
    * it) and the realistic 100 TB deployment: train on a sample once, ship
    * the quantizer to the scan as a constant. */
  def q30AnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vecs = Tables.embeddings(s, dir).select($"vec_id", dvec($"embedding").as("v"))
    graft.vector.Ivf.topK(vecs, vecs.filter($"vec_id" < 5),
        graft.vector.IvfFrozen.model, nprobe = 4, k = 3)
      .orderBy($"q_id", $"rank")
  }

  /** DuckDB literal that parses to the exact same double: `Double.toString`
    * round-trips, and the `E` exponent marker forces DOUBLE (not DECIMAL)
    * parsing. */
  private def sqlDouble(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E") || s.contains("e")) s else s + "E0"
  }

  /** The frozen centroid matrix as a DuckDB VALUES list. */
  private def centroidValues: String =
    graft.vector.IvfFrozen.centroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(sqlDouble).mkString(", ")}])"
    }.mkString(",\n    ")

  /** q30 oracle: the identical read path in DuckDB, from the identical
    * frozen constants. Assignment replays [[graft.functions.expressions.NearestCentroid]]'s
    * arithmetic (sequential Σ(v_i−c_i)², argmin with lowest-cell tie-break),
    * probing replays [[graft.vector.Ivf.topK]]'s q·q − 2q·c + c·c expansion,
    * and the re-score uses the shared round-then-rank cosine convention. */
  def q30Sql: String = {
    def sq(v: String, c: String) =
      s"list_sum([($v[i]-$c[i])*($v[i]-$c[i]) for i in range(1, len($v)+1)])"
    def dt(a: String, b: String) =
      s"list_sum([$a[i]*$b[i] for i in range(1, len($a)+1)])"
    s"""WITH cents(cell, c) AS (VALUES
       |    $centroidValues),
       |e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, cents.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY ${sq("e.v", "cents.c")}, cents.cell) AS rn
       |    FROM e CROSS JOIN cents) t WHERE rn = 1),
       |probes AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.vec_id AS q_id, q.v AS qv, cents.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |                         ORDER BY (${dt("q.v", "q.v")} - 2.0*${dt("q.v", "cents.c")}) + ${dt("cents.c", "cents.c")},
       |                                  cents.cell) AS rn
       |    FROM e q CROSS JOIN cents WHERE q.vec_id < 5) t WHERE rn <= 4),
       |scored AS (
       |  SELECT p.q_id, a.vec_id AS neighbor_id,
       |    round(${dt("p.qv", "a.v")} / (sqrt(${dt("p.qv", "p.qv")}) * sqrt(${dt("a.v", "a.v")})), 4) AS cos_r
       |  FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.q_id)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos_r FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q54

  /** q54_ann_lsh — the LSH-bucketed ANN scale path, complementing q30's
    * IVF: 16-bit random-hyperplane signature ([[graft.vector.LshPlanes]],
    * frozen seed — data-independent, nothing to train), banded 4×4; a query
    * probes only the vectors sharing at least one band key, then exact
    * cosine re-scores the probed sliver (the shared round-then-rank
    * convention).
    *
    * Scale shape: signature = 16 codegen'd `graft_dot`s against constant
    * planes — narrow, one pass; the only join is data-bands ⋈ BROADCAST
    * query-bands (the query side is O(k)); candidates ≈ N/16 per band per
    * query instead of N. Recall/cost dial = plane count and band shape
    * (more planes → smaller buckets, fewer bands → lower recall); LshSpec
    * pins the recall floor on scaled-copy clusters, and the oracle replays
    * the identical frozen planes, so correctness here means bit-identical
    * bucketing AND re-scoring — not just "similar" results. */
  def q54AnnLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.vector.LshPlanes
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", dvec($"embedding").as("v"))
      .select($"vec_id", $"v", norm($"v").as("nrm"))
    val sigCol = (0 until LshPlanes.Planes).map { b =>
      when(dot($"v", typedlit(LshPlanes.planes(b).toSeq)) >= 0, lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val withSig = e.select($"vec_id", sigCol.as("sig"))
    // sig is a materialized attribute, so the 16-dot pass runs once per row
    // and the band extraction below is 4 cheap shift/mask reads of it
    val bandMask = (1 << LshPlanes.BitsPerBand) - 1
    val bandStructs = array((0 until LshPlanes.Bands).map { t =>
      struct(lit(t).as("band"),
        shiftright($"sig", t * LshPlanes.BitsPerBand).bitwiseAND(bandMask).as("bkey"))
    }: _*)
    val bands = withSig
      .select($"vec_id", explode(bandStructs).as("bk"))
      .select($"vec_id", $"bk.band".as("band"), $"bk.bkey".as("bkey"))
    val qbands = bands.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"band", $"bkey")
    val cand = bands.join(broadcast(qbands), Seq("band", "bkey"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id")
      .distinct()
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_r".desc, $"neighbor_id")
    cand.join(e, "vec_id").join(broadcast(q), "q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_r"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"neighbor_id", $"cos_r")
      .orderBy($"q_id", $"rank")
  }

  /** The frozen hyperplane matrix as a DuckDB VALUES list. */
  private def planeValues: String =
    graft.vector.LshPlanes.planes.zipWithIndex.map { case (p, b) =>
      s"($b, [${p.map(sqlDouble).mkString(", ")}])"
    }.mkString(",\n    ")

  def q54Sql: String = {
    def dt(a: String, b: String) =
      s"list_sum([$a[i]*$b[i] for i in range(1, len($a)+1)])"
    // band geometry interpolated from LshPlanes — turning the plane/band
    // dial cannot desynchronize the two sides
    val bpb = graft.vector.LshPlanes.BitsPerBand
    s"""WITH planes(plane_id, p) AS (VALUES
       |    $planeValues),
       |e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |bits AS (
       |  SELECT e.vec_id, planes.plane_id,
       |    CASE WHEN ${dt("e.v", "planes.p")} >= 0 THEN 1 ELSE 0 END AS bit
       |  FROM e CROSS JOIN planes),
       |keys AS (
       |  SELECT vec_id, plane_id // $bpb AS band,
       |    CAST(SUM(bit << (plane_id % $bpb)) AS BIGINT) AS bkey
       |  FROM bits GROUP BY vec_id, plane_id // $bpb),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, d.vec_id AS vec_id
       |  FROM keys q JOIN keys d ON q.band = d.band AND q.bkey = d.bkey
       |  WHERE q.vec_id < 5 AND d.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT c.q_id, c.vec_id AS neighbor_id,
       |    round(${dt("q.v", "d.v")} / (sqrt(${dt("q.v", "q.v")}) * sqrt(${dt("d.v", "d.v")})), 4) AS cos_r
       |  FROM cand c JOIN e q ON q.vec_id = c.q_id JOIN e d ON d.vec_id = c.vec_id)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos_r FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q64

  /** q64_semdedup — semantic deduplication (the SemDeDup recipe, Abbas et
    * al. 2023, arXiv:2303.09540): cluster embeddings with a frozen coarse
    * quantizer, compare pairs only WITHIN a cluster, and drop every vector
    * whose cosine to a lower-id cluster-mate reaches the threshold. The
    * deterministic keep-rule here ("drop iff a lower-id near-duplicate
    * exists in the cell") is slightly more aggressive than the paper's
    * keep-one-per-connected-component but is order-independent, rerun-
    * stable, and SQL-expressible — the properties a 100 TB curation pass
    * actually needs. Output is the ACTION per vector (kept / dup_of), not
    * the pair list — q26 publishes pairs, this publishes the verdict.
    *
    * Scale shape: assignment is the q30 codegen'd per-row argmin (no join,
    * no shuffle); the only join is the within-cell self-join — Σ cell²
    * pairs, never N² — followed by a vec_id-keyed agg and a left join back.
    * The same frozen-quantizer trick that makes q30 oracle-checkable makes
    * the whole dedup replayable in DuckDB from the literal centroid
    * matrix. At 100 TB the cell count grows with √N (k ≈ 2¹⁴⁺) so cells
    * stay bounded; the quantizer remains a broadcast constant.
    *
    * Cell-population guard (r16, default-ON since r17): running this shape
    * with a quantizer frozen for a much smaller corpus is the ONE
    * super-proportional cliff the r16 ×100 sweep found — fixed k means
    * cell populations grow with the corpus and the Σ cell² pair space
    * outruns it (measured 136.7× on 100× work; re-frozen at k=√N the same
    * dedup is 58.9× — see SCALE.md and `SEMDEDUP_REFREEZE_r16.json`). The
    * guard caps the hottest cell at `SemDedupGuardFactor × model.k` rows by
    * DEFAULT: under the FreezeIvf sizing rule k ≈ √N the healthy cell holds
    * ≈ k rows, so a cell at 32× that is a quantizer frozen for a corpus
    * two orders of magnitude smaller than the one being deduped (at the
    * gate SFs the frozen k=45 model's hottest cell is 89 rows vs the 1440
    * cap; at ×100 it is 7646 — trips). `spark.graft.semdedup.maxCellRows`
    * overrides the cap; a value ≤ 0 disables the guard explicitly. The
    * guard is one eager pre-agg (scan + assignment + count) that runs at
    * DataFrame-CONSTRUCTION time — fail-fast by design; the assignment
    * relation it aggregates is PERSISTED (MEMORY_AND_DISK) and the query
    * itself runs on the same cached plan, so the scan+assignment pass is
    * paid once, not twice (r18, closing the r16/r17 ADVICE note; harness
    * cleanups / the ContextCleaner evict the cache). On trip:
    * IllegalStateException naming the hottest cell, the cap, and the
    * re-freeze recipe. */
  def q64SemDedup(s: SparkSession, dir: String): DataFrame =
    semDedup(s, dir, graft.vector.IvfFrozen.model)

  /** Ratio of (hottest-cell rows) to model.k above which [[semDedup]]'s
    * default guard trips — 16× the sf0.1 gate's observed max-cell/k skew. */
  val SemDedupGuardFactor = 32L

  /** The q64 dedup, parameterized on the coarse quantizer so a corpus
    * re-frozen at k ≈ √N (graft.tools.FreezeIvf / SemDedupRefreeze) runs
    * the measured scale-safe path through the SAME operator the gate
    * checks. See [[q64SemDedup]] for semantics and the guard contract. */
  def semDedup(s: SparkSession, dir: String,
               model: graft.vector.Ivf.IvfModel): DataFrame = {
    import s.implicits._
    val e0 = Tables.embeddings(s, dir)
      .select($"vec_id", dvec($"embedding").as("v"))
      .select($"vec_id", graft.vector.Ivf.cellOf($"v", model).as("cell"),
        $"v", norm($"v").as("nrm"))
    val capKey = "spark.graft.semdedup.maxCellRows"
    val cap = s.conf.getOption(capKey) match {
      case Some(v) =>
        try v.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$capKey must be a long (<= 0 disables the guard), got '$v'")
        }
      case None => SemDedupGuardFactor * model.k
    }
    // the guard's pre-agg materializes this cache; the pair join and the
    // verdict join below then reuse it — one scan+assignment pass total
    val e = if (cap > 0)
      e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else e0
    if (cap > 0) {
      val hot = e.groupBy($"cell").count()
        .filter($"count" > cap).orderBy($"count".desc).limit(1).collect()
      hot.headOption.foreach { r =>
        e.unpersist(blocking = false)
        throw new graft.GuardTripException(
          s"semdedup cell-population guard: cell ${r.get(0)} holds ${r.getLong(1)} vectors " +
            s"(> maxCellRows=$cap) under the k=${model.k} frozen quantizer - the within-cell " +
            "pair join would be super-proportional in the corpus. Re-freeze the quantizer " +
            s"at k~sqrt(N) for this corpus (tools/FreezeIvf) before deduping at this scale, " +
            s"or override/disable the cap via $capKey.")
      }
    }
    val cosR = round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4)
    val dups = e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("b.vec_id") < col("a.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("lo"), cosR.as("cos_r"))
      .filter($"cos_r" >= 0.40)
      .groupBy($"vec_id").agg(min($"lo").as("dup_of"))
    e.select($"vec_id", $"cell".cast("long").as("cell"))
      .join(dups, Seq("vec_id"), "left")
      .select($"vec_id", $"cell", $"dup_of",
        when($"dup_of".isNull, 1L).otherwise(0L).as("kept"))
      .orderBy($"vec_id")
  }

  /** q64 oracle: identical frozen-centroid assignment (q30's fragments),
    * then the within-cell pair scan and the same lowest-dup-id verdict. */
  def q64Sql: String = {
    def sq(v: String, c: String) =
      s"list_sum([($v[i]-$c[i])*($v[i]-$c[i]) for i in range(1, len($v)+1)])"
    def dt(a: String, b: String) =
      s"list_sum([$a[i]*$b[i] for i in range(1, len($a)+1)])"
    s"""WITH cents(cell, c) AS (VALUES
       |    $centroidValues),
       |e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT e.vec_id, e.v, cents.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY ${sq("e.v", "cents.c")}, cents.cell) AS rn
       |    FROM e CROSS JOIN cents) t WHERE rn = 1),
       |prs AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS lo,
       |    round(${dt("a.v", "b.v")} / (sqrt(${dt("a.v", "a.v")}) * sqrt(${dt("b.v", "b.v")})), 4) AS cos_r
       |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND b.vec_id < a.vec_id),
       |dups AS (SELECT vec_id, min(lo) AS dup_of FROM prs
       |         WHERE cos_r >= 0.40 GROUP BY 1)
       |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, d.dup_of,
       |  CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM assigned a LEFT JOIN dups d USING (vec_id)
       |ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q67

  /** q67_ann_sq8 — scalar-quantized (SQ8) brute-force ANN: every vector is
    * compressed to int8 codes with a per-vector (min, scale) pair —
    * code_i = round((x_i − min)/scale), scale = (max−min)/255 — and the
    * exact q25 top-k then runs IN THE QUANTIZED DOMAIN on the dequantized
    * values (min + code·scale). This is FAISS's SQ8 memory path: 4× fewer
    * bytes per vector means 4× more of the corpus resident per executor,
    * at a recall cost this query makes measurable (compare against q25's
    * exact ranks on the same queries — Sq8Spec does).
    *
    * Scale shape: quantize + dequantize are one narrow codegen pass over
    * the scan (min/max/transform column algebra, no UDFs, no shuffle);
    * the search itself reuses q25's broadcast-the-k-queries shape. The
    * rank convention is the shared round(·,4)-then-rank, so the oracle
    * replays quantization bit-for-bit from the same float64 arithmetic.
    * A constant vector (max = min) quantizes to all-zero codes and
    * dequantizes to the constant — the scale-0 guard. */
  /** The SQ8-dequantized vector table (vec_id, v, nrm) — q67's
    * quantization, shared verbatim with q118's coarse stage so the
    * compression semantics are certified once. */
  private def sq8Vectors(s: SparkSession, dir: String): DataFrame =
    sq8VectorsCelled(s, dir).select(col("vec_id"), col("v"), col("nrm"))

  /** [[sq8Vectors]] + the frozen-quantizer cell of the ORIGINAL float
    * vector (index-build order: assign first, compress second — q121's
    * IVF+SQ8 composition needs the cell an index builder would have
    * stored alongside the codes, not one derived from lossy codes). */
  private def sq8VectorsCelled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val model = graft.vector.IvfFrozen.model
    val base = Tables.embeddings(s, dir).select($"vec_id", dvec($"embedding").as("v"))
    // per-vector affine params; scale 0 (constant vector) -> codes all 0
    base
      .withColumn("cell", graft.vector.Ivf.cellOf($"v", model))
      .withColumn("mn", array_min($"v"))
      .withColumn("sc", (array_max($"v") - $"mn") / lit(255.0))
      .withColumn("dq", transform($"v", x =>
        when(col("sc") === 0.0, col("mn"))
          .otherwise(col("mn") + round((x - col("mn")) / col("sc")) * col("sc"))))
      .select($"vec_id", $"cell", $"dq".as("v"))
      .select($"vec_id", $"cell", $"v", norm($"v").as("nrm"))
  }

  def q67AnnSq8(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val quant = sq8Vectors(s, dir)
    val q = quant.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_r".desc, $"neighbor_id")
    quant.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_r"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"neighbor_id", $"cos_r")
      .orderBy($"q_id", $"rank")
  }

  private def duckDot(a: String, b: String) =
    s"list_sum([$a[i]*$b[i] for i in range(1, len($a)+1)])"

  /** DuckDB CTE block `e` (raw double vectors) + `dq` (SQ8-dequantized) —
    * the oracle twin of [[sq8Vectors]], shared by q67 and q118. */
  private val Sq8DqSql: String =
    """e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
      |p AS (SELECT vec_id, v, list_min(v) AS mn,
      |        (list_max(v) - list_min(v)) / 255.0 AS sc FROM e),
      |dq AS (SELECT vec_id,
      |        [CASE WHEN sc = 0.0 THEN mn
      |              ELSE mn + round((x - mn) / sc) * sc END for x in v] AS v
      |       FROM p)""".stripMargin

  val q67Sql: String = {
    def dt(a: String, b: String) = duckDot(a, b)
    s"""WITH $Sq8DqSql,
       |prs AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS neighbor_id,
       |    round(${dt("q.v", "n.v")} / (sqrt(${dt("q.v", "q.v")}) * sqrt(${dt("n.v", "n.v")})), 4) AS cos_r
       |  FROM dq q JOIN dq n ON q.vec_id < 5 AND n.vec_id <> q.vec_id)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos_r FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |  FROM prs) t
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q92

  /** q92_ann_pq — product-quantized (PQ) ANN under frozen codebooks
    * ([[graft.vector.Pq]] / [[graft.vector.PqFrozen]], trained once by
    * `graft.tools.FreezePq`): every database vector is encoded to m=8
    * 4-bit subspace codes (32× smaller than float64, the FAISS PQ4
    * geometry) and scored ASYMMETRICALLY — the exact query against the
    * vector's reconstruction, which equals the classic per-query
    * lookup-table ADC number exactly (subspaces partition the dims; see
    * [[graft.vector.Pq]]'s scaladoc). Completes the compression corner of
    * the ANN family: q30 probes fewer vectors, q54 fewer buckets, q67
    * keeps 4× more corpus per executor, PQ 32× — and like them, the recall
    * cost is measurable against q25's exact ranks on the same queries
    * (PqSpec does).
    *
    * Scale shape: encoding is m codegen'd per-row argmins inside the one
    * scan — no join, no shuffle; the search reuses q25's
    * broadcast-the-k-queries shape on the reconstructed (still narrow)
    * vectors. The oracle replays encode → reconstruct → re-score from the
    * identical codebook literals with q30's sequential-Σ/argmin/tie-break
    * conventions, so a single flipped code fails the hash. */
  def q92AnnPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val model = graft.vector.PqFrozen.model
    val base = Tables.embeddings(s, dir).select($"vec_id", dvec($"embedding").as("v"))
    val recon = base
      .select($"vec_id", graft.vector.Pq.reconstruct($"v", model).as("v"))
      .select($"vec_id", $"v", norm($"v").as("nrm"))
    val q = base.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
      .select($"q_id", $"qv", norm($"qv").as("qnrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_r".desc, $"neighbor_id")
    recon.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_r"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"neighbor_id", $"cos_r")
      .orderBy($"q_id", $"rank")
  }

  /** The frozen PQ codebooks as a DuckDB VALUES list (sub, cell, c). */
  private def pqCodebookValues: String =
    graft.vector.PqFrozen.codebooks.zipWithIndex.flatMap { case (cb, sub) =>
      cb.zipWithIndex.map { case (c, cell) =>
        s"($sub, $cell, [${c.map(sqlDouble).mkString(", ")}])"
      }
    }.mkString(",\n    ")

  /** q92 oracle: per-subspace nearest-centroid assignment from the literal
    * codebooks (q30's sequential-Σ/argmin/lowest-cell fragments), centroid
    * concatenation in subspace order, then the asymmetric q25 pair scan —
    * exact query side, reconstructed database side. */
  def q92Sql: String = {
    val m = graft.vector.PqFrozen.model.m
    val sd = graft.vector.PqFrozen.model.subDim
    def sq(v: String, c: String) =
      s"list_sum([($v[i]-$c[i])*($v[i]-$c[i]) for i in range(1, len($v)+1)])"
    def dt(a: String, b: String) =
      s"list_sum([$a[i]*$b[i] for i in range(1, len($a)+1)])"
    s"""WITH cbs(sub, cell, c) AS (VALUES
       |    $pqCodebookValues),
       |e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |subs AS (
       |  SELECT e.vec_id, r.sub, list_slice(e.v, r.sub*$sd + 1, r.sub*$sd + $sd) AS sv
       |  FROM e CROSS JOIN range($m) r(sub)),
       |assigned AS (
       |  SELECT vec_id, sub, cell FROM (
       |    SELECT s.vec_id, s.sub, cbs.cell,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub
       |                         ORDER BY ${sq("s.sv", "cbs.c")}, cbs.cell) AS rn
       |    FROM subs s JOIN cbs ON s.sub = cbs.sub) t WHERE rn = 1),
       |recon AS (
       |  SELECT a.vec_id, flatten(list(cbs.c ORDER BY a.sub)) AS v
       |  FROM assigned a JOIN cbs ON a.sub = cbs.sub AND a.cell = cbs.cell
       |  GROUP BY a.vec_id),
       |prs AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS neighbor_id,
       |    round(${dt("q.v", "n.v")} / (sqrt(${dt("q.v", "q.v")}) * sqrt(${dt("n.v", "n.v")})), 4) AS cos_r
       |  FROM e q JOIN recon n ON q.vec_id < 5 AND n.vec_id <> q.vec_id)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos_r FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |  FROM prs) t
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q105

  /** q105_mutual_nn — mutual-nearest-neighbor matching over q26's gated
    * candidate pairs: a pair (a, b) emits iff b is a's best-scoring
    * candidate AND a is b's (ties broken by lowest partner id on the
    * round-4 cosine, the shared ANN convention). Mutual-NN is the
    * conservative entity-resolution / record-linkage matcher — unlike
    * q26's "all pairs over the gate" or q64's "evict all but the cell
    * medoid", a mutual match is a 1:1 claim with no transitive leakage:
    * exactly the pairs a curation pipeline auto-merges without human
    * review. Sharing `q26Pairs` verbatim means blocking, gate, and
    * cosine convention are certified once and inherited here.
    *
    * Scale shape: q26's blocked pair scan (Σ block², linear-ish under the
    * k ≈ √N re-freeze rule) plus one src-keyed window over DIRECTED
    * gate-survivor edges (2·|pairs| rows — output-sized, not corpus-
    * sized) and one self-join of the per-vector best rows (|vectors|
    * rows). Nothing new shuffles the corpus. */
  def q105MutualNn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = q26Pairs(s, dir)
    val directed = pairs
      .select($"vec_a".as("src"), $"vec_b".as("dst"), $"label", $"cell", $"cos_r")
      .unionByName(pairs
        .select($"vec_b".as("src"), $"vec_a".as("dst"), $"label", $"cell", $"cos_r"))
    val w = Window.partitionBy($"src").orderBy($"cos_r".desc, $"dst")
    val best = directed
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    best.as("a").join(best.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src") &&
          col("a.src") < col("a.dst"))
      .select(col("a.src").as("vec_a"), col("a.dst").as("vec_b"),
        col("a.label").as("label"), col("a.cell").as("cell"),
        col("a.cos_r").as("cos_r"))
      .orderBy($"vec_a")
  }

  /** q105 oracle: q26's CTE chain (assignment from the literal centroids,
    * blocked gated pairs), then best-per-src over directed edges and the
    * mutuality self-join. */
  def q105Sql: String = {
    def sq(v: String, c: String) =
      s"list_sum([($v[i]-$c[i])*($v[i]-$c[i]) for i in range(1, len($v)+1)])"
    s"""WITH cents(cell, c) AS (VALUES
       |    $centroidValues),
       |e AS (SELECT vec_id, label, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |assigned AS (
       |  SELECT vec_id, label, v, cell FROM (
       |    SELECT e.vec_id, e.label, e.v, cents.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY ${sq("e.v", "cents.c")}, cents.cell) AS rn
       |    FROM e CROSS JOIN cents) t WHERE rn = 1),
       |pairs AS (
       |  SELECT * FROM (
       |    SELECT a.label AS label, CAST(a.cell AS BIGINT) AS cell,
       |      a.vec_id AS vec_a, b.vec_id AS vec_b,
       |      round(${duckCos("a.v", "b.v")}, 4) AS cos_r
       |    FROM assigned a JOIN assigned b
       |      ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id) t
       |  WHERE cos_r >= 0.30),
       |directed AS (
       |  SELECT vec_a AS src, vec_b AS dst, label, cell, cos_r FROM pairs
       |  UNION ALL
       |  SELECT vec_b AS src, vec_a AS dst, label, cell, cos_r FROM pairs),
       |best AS (
       |  SELECT src, dst, label, cell, cos_r FROM (
       |    SELECT *, row_number() OVER (PARTITION BY src
       |                                 ORDER BY cos_r DESC, dst) AS rn
       |    FROM directed) t WHERE rn = 1)
       |SELECT a.src AS vec_a, a.dst AS vec_b, a.label, a.cell, a.cos_r
       |FROM best a JOIN best b
       |  ON a.src = b.dst AND a.dst = b.src AND a.src < a.dst
       |ORDER BY vec_a""".stripMargin
  }

  // ---------------------------------------------------------------- q118

  /** q118_ann_rerank — two-stage ANN serving: a cheap SQ8 coarse pass over
    * the WHOLE corpus shortlists 20 candidates per query, then the exact
    * cosine re-ranks the shortlist on the original float vectors for the
    * final top-3. FAISS's standard `refine` pattern — the quantized scan
    * touches 4× less memory per vector (q67's economics), and the exact
    * stage repairs the quantization's rank flips at O(queries·shortlist)
    * cost, which is how production ANN actually ships: compressed recall,
    * exact precision. The coarse stage here deliberately scans the WHOLE
    * compressed corpus (the FAISS flat-refine pattern); q121 is the
    * IVF-probed composition that restricts it to probed cells.
    *
    * Both stages reuse certified pieces verbatim: [[sq8Vectors]] (q67's
    * quantization) for the coarse scores, q25's broadcast-queries shape
    * and round(·,4)-then-(cos DESC, id) rank convention in both stages —
    * so the oracle replays coarse shortlist and refinement exactly.
    *
    * Scale shape: stage 1 is the q67 scan (k×N over int8-compressed
    * vectors, no shuffle of the big side); stage 2 is a candidate-keyed
    * join of 20·k rows back to the vector table — output-sized. The
    * exported cos_sq8 column makes the coarse/exact gap auditable per
    * neighbor (the recall dial: shortlist depth vs q67's standalone
    * ranks). */
  def q118AnnRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val quant = sq8Vectors(s, dir)
    val qc = quant.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val wc = Window.partitionBy($"q_id").orderBy($"cos_sq8".desc, $"neighbor_id")
    val cand = quant.join(broadcast(qc), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_sq8"))
      .withColumn("crank", row_number().over(wc))
      .filter($"crank" <= 20)
      .select($"q_id", $"neighbor_id", $"cos_sq8")
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", dvec($"embedding").as("v"))
      .select($"vec_id", $"v", norm($"v").as("nrm"))
    val qe = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val wr = Window.partitionBy($"q_id").orderBy($"cos_r".desc, $"neighbor_id")
    cand
      .join(e.select($"vec_id".as("neighbor_id"), $"v", $"nrm"), "neighbor_id")
      .join(broadcast(qe), "q_id")
      .select($"q_id", $"neighbor_id", $"cos_sq8",
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_r"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"neighbor_id", $"cos_r", $"cos_sq8")
      .orderBy($"q_id", $"rank")
  }

  val q118Sql: String = {
    def dt(a: String, b: String) = duckDot(a, b)
    s"""WITH $Sq8DqSql,
       |coarse AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS neighbor_id,
       |    round(${dt("q.v", "n.v")} / (sqrt(${dt("q.v", "q.v")}) * sqrt(${dt("n.v", "n.v")})), 4) AS cos_sq8
       |  FROM dq q JOIN dq n ON q.vec_id < 5 AND n.vec_id <> q.vec_id),
       |cand AS (
       |  SELECT q_id, neighbor_id, cos_sq8 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sq8 DESC, neighbor_id) AS crank
       |    FROM coarse) t WHERE crank <= 20),
       |ref AS (
       |  SELECT c.q_id, c.neighbor_id, c.cos_sq8,
       |    round(${dt("q.v", "n.v")} / (sqrt(${dt("q.v", "q.v")}) * sqrt(${dt("n.v", "n.v")})), 4) AS cos_r
       |  FROM cand c
       |  JOIN e n ON n.vec_id = c.neighbor_id
       |  JOIN e q ON q.vec_id = c.q_id)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos_r, cos_sq8 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |  FROM ref) t
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q121

  /** q121_ann_ivf_rerank — the PRODUCTION ANN serving path, composed from
    * three separately-certified stages: (1) the frozen-quantizer IVF probe
    * (q30's machinery, nprobe=16 — the measured high-recall setting from
    * the SCALE.md dial, recall@10 ≈ 0.74 scale-stable), (2) SQ8 asymmetric
    * ADC scoring (q67's quantization; exact query against the dequantized
    * codes — FAISS's ADC convention) over ONLY the probed cells'
    * vectors, shortlisting 20 candidates per query, and (3) q118's exact
    * refine of the shortlist on the original floats for the final top-3.
    *
    * This is the composition q118 deliberately omits: its coarse stage
    * scans the WHOLE compressed corpus per query (O(N·queries)); here the
    * coarse scan touches ~nprobe/k of the corpus (16/45 at the frozen
    * sizing; at 100 TB with k ≈ √N the probed fraction vanishes), and the
    * refine cost is O(queries·shortlist) regardless of N. Cells are
    * assigned from the ORIGINAL vectors at "index build" (the stored-
    * alongside-the-codes convention, [[sq8VectorsCelled]]), so
    * quantization error can never move a vector between cells.
    *
    * Scale shape: the corpus scan joins a BROADCAST (query, cell) probe
    * set — big side read once, only matching cells scored, no shuffle of
    * the corpus; both window top-Ks are per-query (tiny). PlanSpec pins
    * the probe join's broadcast side and no-cartesian. Recall vs exact
    * (q25) is recorded by IvfRerankSpec on the same queries; every
    * similarity rides the shared round(·,4)-then-(cos DESC, id) grid so
    * the oracle replays all three stages from the frozen literals. */
  def q121AnnIvfRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val model = graft.vector.IvfFrozen.model
    val nprobe = 16
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", dvec($"embedding").as("v"))
      .select($"vec_id", $"v", norm($"v").as("nrm"))
    // stage 1: probe — each query ranks the k centroids, keeps nprobe
    // cells (q30's q·q − 2q·c + c·c expansion; both sides tiny)
    val centroidsDf = model.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "c")
    val byDist = Window.partitionBy($"q_id").orderBy($"sqdist", $"cell")
    val probes = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      .crossJoin(broadcast(centroidsDf))
      .withColumn("sqdist",
        dot($"qv", $"qv") - lit(2.0) * dot($"qv", $"c") + dot($"c", $"c"))
      .withColumn("r", row_number().over(byDist))
      .filter($"r" <= nprobe)
      .select($"q_id", $"qv", $"qnrm", $"cell")
    // stage 2: SQ8 ADC over probed cells only — the corpus never shuffles,
    // the probe set broadcasts, non-probed cells are never read past the
    // join
    val quant = sq8VectorsCelled(s, dir)
    val wc = Window.partitionBy($"q_id").orderBy($"cos_sq8".desc, $"neighbor_id")
    val cand = quant.join(broadcast(probes), "cell")
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_sq8"))
      .withColumn("crank", row_number().over(wc))
      .filter($"crank" <= 20)
      .select($"q_id", $"neighbor_id", $"cos_sq8")
    // stage 3: exact refine of the 20-deep shortlist on the original floats
    val qex = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val wr = Window.partitionBy($"q_id").orderBy($"cos_r".desc, $"neighbor_id")
    cand
      .join(e.select($"vec_id".as("neighbor_id"), $"v", $"nrm"), "neighbor_id")
      .join(broadcast(qex), "q_id")
      .select($"q_id", $"neighbor_id", $"cos_sq8",
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_r"))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"neighbor_id", $"cos_r", $"cos_sq8")
      .orderBy($"q_id", $"rank")
  }

  /** q121 oracle: all three stages replayed from the identical frozen
    * constants — q30's assignment/probe CTEs + [[Sq8DqSql]]'s dequant +
    * q118's refine convention. */
  val q121Sql: String = {
    def sq(v: String, c: String) =
      s"list_sum([($v[i]-$c[i])*($v[i]-$c[i]) for i in range(1, len($v)+1)])"
    def dt(a: String, b: String) = duckDot(a, b)
    s"""WITH cents(cell, c) AS (VALUES
       |    $centroidValues),
       |$Sq8DqSql,
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, cents.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY ${sq("e.v", "cents.c")}, cents.cell) AS rn
       |    FROM e CROSS JOIN cents) t WHERE rn = 1),
       |probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT q.vec_id AS q_id, cents.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |                         ORDER BY (${dt("q.v", "q.v")} - 2.0*${dt("q.v", "cents.c")}) + ${dt("cents.c", "cents.c")},
       |                                  cents.cell) AS rn
       |    FROM e q CROSS JOIN cents WHERE q.vec_id < 5) t WHERE rn <= 16),
       |coarse AS (
       |  SELECT p.q_id, a.vec_id AS neighbor_id,
       |    round(${dt("q.v", "d.v")} / (sqrt(${dt("q.v", "q.v")}) * sqrt(${dt("d.v", "d.v")})), 4) AS cos_sq8
       |  FROM probes p
       |  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.q_id
       |  JOIN dq d ON d.vec_id = a.vec_id
       |  JOIN e q ON q.vec_id = p.q_id),
       |cand AS (
       |  SELECT q_id, neighbor_id, cos_sq8 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos_sq8 DESC, neighbor_id) AS crank
       |    FROM coarse) t WHERE crank <= 20),
       |ref AS (
       |  SELECT c.q_id, c.neighbor_id, c.cos_sq8,
       |    round(${dt("q.v", "n.v")} / (sqrt(${dt("q.v", "q.v")}) * sqrt(${dt("n.v", "n.v")})), 4) AS cos_r
       |  FROM cand c
       |  JOIN e n ON n.vec_id = c.neighbor_id
       |  JOIN e q ON q.vec_id = c.q_id)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos_r, cos_sq8 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |  FROM ref) t
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q131

  /** q131_embedding_drift — embedding-space drift monitor over the FROZEN
    * IVF quantizer: per-cell occupancy of two corpus snapshots plus each
    * cell's PSI contribution (population stability index, the standard
    * model-monitoring drift statistic — Laplace-smoothed
    * `(p1−p2)·ln(p1/p2)` per cell, summed ≥ 0 overall).
    *
    * Why this operator exists: every frozen-model read path in this engine
    * (q30/q64/q121's centroids, q92's codebooks, q67's scalar ranges)
    * trades training for a shippable constant — and silently degrades when
    * the corpus distribution walks away from the training sample (q64's
    * k ≈ √N re-freeze rule says WHEN to retrain as N grows; this measures
    * WHETHER the distribution moved at fixed N). Cell-occupancy PSI over
    * the quantizer's own partition is the natural drift lens for that
    * decision: cells fill/drain exactly when the index's probe sets stop
    * matching the data.
    *
    * Snapshot v2 is deterministic (the q78/q88 discipline): departures
    * (`vec_id % 13 = 5` dropped) and re-embeddings (`vec_id % 7 = 3`
    * cyclically rotated one dimension — norm-preserving, cell-moving).
    *
    * Scale shape: two codegen'd assignment passes (NO join — the
    * `graft_nearest_centroid` scan shape of q30), each folding map-side to
    * ≤ k cell counts; everything after the two k-row aggregates is
    * constant-size (k = 45 cells, one broadcast totals row). Cost is two
    * scans regardless of corpus size —
    * the monitoring pass is as cheap as the index it guards. */
  def q131EmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).select($"vec_id", dvec($"embedding").as("v"))
    val v2 = e.filter($"vec_id" % 13 =!= 5)
      .select($"vec_id",
        when($"vec_id" % 7 === 3,
          concat(slice($"v", lit(2), size($"v") - 1), slice($"v", lit(1), lit(1))))
          .otherwise($"v").as("v"))
    q131DriftOn(e, v2)
  }

  /** The drift statistic on two explicit (vec_id, v) snapshots — the spec
    * drives identity/rotation cases through the same code the gate runs. */
  private[graft] def q131DriftOn(e1: DataFrame, e2: DataFrame): DataFrame = {
    val s = e1.sparkSession
    import s.implicits._
    val model = graft.vector.IvfFrozen.model
    val kD = model.k.toDouble
    def occ(df: DataFrame, cname: String) =
      df.select(graft.vector.Ivf.cellOf($"v", model).as("cell"))
        .groupBy($"cell").agg(count(lit(1)).as(cname))
    val totals = e1.agg(count(lit(1)).as("t1"))
      .crossJoin(e2.agg(count(lit(1)).as("t2")))
    occ(e1, "n1").join(occ(e2, "n2"), Seq("cell"), "full_outer")
      .na.fill(0L, Seq("n1", "n2"))
      .crossJoin(broadcast(totals))
      .withColumn("p1", ($"n1" + lit(1.0)) / ($"t1" + lit(kD)))
      .withColumn("p2", ($"n2" + lit(1.0)) / ($"t2" + lit(kD)))
      .select($"cell".cast("long").as("cell"), $"n1", $"n2",
        floor(lit(1000000.0) * ($"p1" - $"p2") * log($"p1" / $"p2"))
          .cast("long").as("psi_e6"))
      .orderBy($"cell")
  }

  /** q131 oracle: assignment replayed from the literal centroid matrix
    * (q30's sequential-Σ/argmin/lowest-cell fragments), v2 rotation in list
    * algebra, identical smoothing + PSI formula text (q88's e6-floor ln
    * convention). */
  def q131Sql: String = {
    def sq(v: String, c: String) =
      s"list_sum([($v[i]-$c[i])*($v[i]-$c[i]) for i in range(1, len($v)+1)])"
    val kD = s"${graft.vector.IvfFrozen.model.k}.0"
    def assign(src: String, out: String) =
      s"""$out AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT $src.vec_id, cents.cell,
         |      row_number() OVER (PARTITION BY $src.vec_id
         |                         ORDER BY ${sq(s"$src.v", "cents.c")}, cents.cell) AS rn
         |    FROM $src CROSS JOIN cents) t WHERE rn = 1)""".stripMargin
    s"""WITH cents(cell, c) AS (VALUES
       |    $centroidValues),
       |e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |v2 AS (
       |  SELECT vec_id,
       |    CASE WHEN vec_id % 7 = 3 THEN list_concat(v[2:len(v)], [v[1]])
       |         ELSE v END AS v
       |  FROM e WHERE vec_id % 13 <> 5),
       |${assign("e", "a1")},
       |${assign("v2", "a2")},
       |c1 AS (SELECT cell, count(*) AS n1 FROM a1 GROUP BY cell),
       |c2 AS (SELECT cell, count(*) AS n2 FROM a2 GROUP BY cell),
       |j AS (SELECT coalesce(c1.cell, c2.cell) AS cell,
       |        coalesce(c1.n1, 0) AS n1, coalesce(c2.n2, 0) AS n2
       |      FROM c1 FULL OUTER JOIN c2 ON c1.cell = c2.cell),
       |st AS (SELECT (SELECT count(*) FROM e) AS t1,
       |              (SELECT count(*) FROM v2) AS t2),
       |p AS (SELECT cell, n1, n2,
       |        (n1 + 1.0) / (t1 + $kD) AS p1,
       |        (n2 + 1.0) / (t2 + $kD) AS p2
       |      FROM j, st)
       |SELECT CAST(cell AS BIGINT) AS cell,
       |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       |  CAST(floor(1000000.0 * (p1 - p2) * ln(p1 / p2)) AS BIGINT) AS psi_e6
       |FROM p ORDER BY cell""".stripMargin
  }

  // ---------------------------------------------------------------- q135

  /** q135_ivf_delta_insert — incremental maintenance of the frozen-IVF
    * postings: per-cell postings counts after a crawl delta, computed at
    * CHANGE-VOLUME cost. q102 established the discipline for the dedup
    * index (O(|Δ|) admission, never O(N) re-index); this is the same
    * contract for the ANN index, and together with q131 (occupancy-drift
    * monitor) it closes the index lifecycle: serve (q30/q121) → maintain
    * (here) → monitor (q131) → re-freeze when drifted (q64's k ≈ √N rule).
    *
    * Deterministic delta (the q78/q88/q131 discipline): arrivals — every
    * `vec_id % 9 = 2` re-embedded (rotation by two dims, norm-preserving,
    * cell-moving) and admitted under a NEW id (+100000); departures —
    * `vec_id % 13 = 5` removed.
    *
    * The maintenance asymmetry is the point: only ARRIVALS are scored
    * against the quantizer (the in-scan `graft_nearest_centroid` argmin,
    * O(|Δ|·k)); departures resolve by ID against the stored assignment —
    * no scoring, because a production index already holds (vec_id → cell)
    * in its postings. The base-assignment pass in this self-contained gate
    * stands in for reading that stored index (exactly q102's v1-index
    * convention). Everything after the three counts is k-row algebra. */
  def q135IvfDeltaInsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val model = graft.vector.IvfFrozen.model
    val e = Tables.embeddings(s, dir).select($"vec_id", dvec($"embedding").as("v"))
    // stands in for the stored postings: (vec_id -> cell) is index state
    val baseCells = e.select($"vec_id",
      graft.vector.Ivf.cellOf($"v", model).as("cell"))
    val arrivals = e.filter($"vec_id" % 9 === 2)
      .select(($"vec_id" + 100000L).as("vec_id"),
        concat(slice($"v", lit(3), size($"v") - 2), slice($"v", lit(1), lit(2))).as("v"))
    val nBase = baseCells.groupBy($"cell").agg(count(lit(1)).as("n_base"))
    val nAdd = arrivals
      .select(graft.vector.Ivf.cellOf($"v", model).as("cell"))
      .groupBy($"cell").agg(count(lit(1)).as("n_added"))
    val nRem = baseCells.filter($"vec_id" % 13 === 5)
      .groupBy($"cell").agg(count(lit(1)).as("n_removed"))
    nBase.join(nAdd, Seq("cell"), "full_outer")
      .join(nRem, Seq("cell"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_added", "n_removed"))
      .select($"cell".cast("long").as("cell"), $"n_base", $"n_added", $"n_removed",
        ($"n_base" + $"n_added" - $"n_removed").as("n_after"))
      .orderBy($"cell")
  }

  /** q135 oracle: base + arrival assignment replayed from the literal
    * centroid matrix (q30's fragments), the rotation in list algebra, and
    * the same count algebra. */
  def q135Sql: String = {
    def sq(v: String, c: String) =
      s"list_sum([($v[i]-$c[i])*($v[i]-$c[i]) for i in range(1, len($v)+1)])"
    def assign(src: String, out: String) =
      s"""$out AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT $src.vec_id, cents.cell,
         |      row_number() OVER (PARTITION BY $src.vec_id
         |                         ORDER BY ${sq(s"$src.v", "cents.c")}, cents.cell) AS rn
         |    FROM $src CROSS JOIN cents) t WHERE rn = 1)""".stripMargin
    s"""WITH cents(cell, c) AS (VALUES
       |    $centroidValues),
       |e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |arr AS (
       |  SELECT vec_id + 100000 AS vec_id,
       |    list_concat(v[3:len(v)], v[1:2]) AS v
       |  FROM e WHERE vec_id % 9 = 2),
       |${assign("e", "base")},
       |${assign("arr", "added")},
       |nb AS (SELECT cell, count(*) AS n_base FROM base GROUP BY cell),
       |na AS (SELECT cell, count(*) AS n_added FROM added GROUP BY cell),
       |nr AS (SELECT cell, count(*) AS n_removed FROM base
       |       WHERE vec_id % 13 = 5 GROUP BY cell),
       |j AS (
       |  SELECT coalesce(nb.cell, na.cell, nr.cell) AS cell,
       |    coalesce(nb.n_base, 0) AS n_base,
       |    coalesce(na.n_added, 0) AS n_added,
       |    coalesce(nr.n_removed, 0) AS n_removed
       |  FROM nb FULL OUTER JOIN na ON nb.cell = na.cell
       |          FULL OUTER JOIN nr ON coalesce(nb.cell, na.cell) = nr.cell)
       |SELECT CAST(cell AS BIGINT) AS cell,
       |  CAST(n_base AS BIGINT) AS n_base, CAST(n_added AS BIGINT) AS n_added,
       |  CAST(n_removed AS BIGINT) AS n_removed,
       |  CAST(n_base + n_added - n_removed AS BIGINT) AS n_after
       |FROM j ORDER BY cell""".stripMargin
  }

  // ---------------------------------------------------------------- q151

  /** q151_label_centroid_cosine — class-separability matrix in embedding
    * space: the pairwise cosine between per-label CENTROIDS, the
    * confusion-risk readout for any labeled embedding corpus (two labels
    * whose centroids sit at cos ≈ 1 will be confused by every downstream
    * classifier and quantizer; q131 watches OCCUPANCY drift over the
    * frozen quantizer — this watches the classes themselves).
    *
    * Engine-exact: elements land on the e3 integer grid
    * (`floor(x·1000 + 0.5)` — sized so per-dim label sums × 64-dim dot
    * products stay well inside int64); the centroid DIVISION is skipped
    * entirely because cosine is scale-invariant — cos(Σa, Σb) =
    * cos(ā, b̄) — so the dot and both norms are EXACT int64 and the only
    * floats are two sqrts, one multiply, one divide with identical
    * formula text (the q133 discipline).
    *
    * Scale shape: one posexplode pass collapses map-side to
    * |labels|·64 per-dim sums (the corpus is touched once, the pair
    * matrix is O(|labels|²·dims) label-table algebra — constant-size at
    * any corpus scale). */
  def q151LabelCentroidCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sums = Tables.embeddings(s, dir)
      .select($"label", posexplode($"embedding").as(Seq("dim", "x")))
      .select($"label", $"dim",
        floor($"x".cast("double") * 1000 + 0.5).cast("long").as("v"))
      .groupBy($"label", $"dim")
      .agg(sum($"v").as("sv"))
    val a = sums.select($"label".as("label_a"), $"dim", $"sv".as("va"))
    val b = sums.select($"label".as("label_b"), $"dim".as("dim_b"), $"sv".as("vb"))
    a.join(b, $"dim" === $"dim_b" && $"label_a" < $"label_b")
      .groupBy($"label_a", $"label_b")
      .agg(sum($"va" * $"vb").as("dot"),
        sum($"va" * $"va").as("nrm_a"), sum($"vb" * $"vb").as("nrm_b"))
      .select($"label_a", $"label_b",
        floor(lit(1000000.0) * $"dot" /
          (sqrt($"nrm_a".cast("double")) * sqrt($"nrm_b".cast("double"))))
          .cast("long").as("cos_e6"))
      .orderBy($"label_a", $"label_b")
  }

  /** q151 oracle: identical e3 grid, per-dim label sums, and the
    * sqrt·sqrt denominator tree. */
  val q151Sql: String =
    """WITH s AS (
      |  SELECT label, g.i AS dim,
      |    CAST(sum(CAST(floor(CAST(embedding[g.i + 1] AS DOUBLE) * 1000 + 0.5)
      |         AS BIGINT)) AS BIGINT) AS sv
      |  FROM embeddings, UNNEST(range(0, len(embedding))) AS g(i)
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT a.label AS label_a, b.label AS label_b,
      |    CAST(sum(a.sv * b.sv) AS BIGINT) AS dot,
      |    CAST(sum(a.sv * a.sv) AS BIGINT) AS nrm_a,
      |    CAST(sum(b.sv * b.sv) AS BIGINT) AS nrm_b
      |  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
      |  GROUP BY 1, 2)
      |SELECT label_a, label_b,
      |  CAST(floor(1000000.0 * dot /
      |       (sqrt(CAST(nrm_a AS DOUBLE)) * sqrt(CAST(nrm_b AS DOUBLE))))
      |    AS BIGINT) AS cos_e6
      |FROM p ORDER BY label_a, label_b""".stripMargin

  // ---------------------------------------------------------------- q189

  /** q189_mmr — Maximal Marginal Relevance diversified re-ranking
    * (Carbonell & Goldstein SIGIR'98, λ = 0.5): per query (one per
    * label, the label's min-vec_id vector), greedily select 10 of the
    * top-100-relevance candidates maximizing 2·MMR = rel − max
    * similarity to the already-selected set. THE training-data
    * selection shape — "relevant but not redundant" — that a pure
    * top-k (q25/q121) cannot express because its objective depends on
    * what was already picked.
    *
    * Exactness: vectors quantize onto the e3 integer grid and every
    * dot product is an exact integer (≤ 6.4×10⁷ per pair — exact in
    * int64 AND in double, which lets candidate generation reuse the
    * codegen'd `graft_dot`); the greedy argmax tie-breaks
    * (score desc, vec_id asc). The oracle UNROLLS the 10 greedy steps
    * as chained CTEs — same integer arithmetic, declaratively.
    *
    * Scale shape: candidate generation is the distributed part — one
    * broadcast of |queries| vectors against the corpus scan (at
    * production scale the IVF/q121 read path feeds this pool instead);
    * re-ranking is O(k·pool²) per query over a pool CAPPED at 100, so
    * the greedy runs inside `flatMapGroups` on a bounded group — the
    * Ivf.scala bounded-collect discipline, never a corpus collect.
    * Queries parallelize across partitions. */
  def q189Mmr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // e3-quantized vector as array<double> of integral values: exact in
    // double up to 2^53, so graft_dot's double dot is the integer dot
    val qcol = transform($"embedding",
      x => floor(x.cast("double") * 1000 + lit(0.5)).cast("double"))
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"label".cast("long").as("label"), qcol.as("q"))
    val wQ = Window.partitionBy($"label").orderBy($"vec_id")
    val qv = e.withColumn("rn", row_number().over(wQ)).filter($"rn" === 1)
      .select($"label", $"vec_id".as("qid"), $"q".as("qq"))
    val wC = Window.partitionBy($"label").orderBy($"rel".desc, $"vec_id")
    val cand = e.join(broadcast(qv), "label").filter($"vec_id" =!= $"qid")
      .select($"label", $"vec_id", dot($"qq", $"q").cast("long").as("rel"), $"q")
      .withColumn("rnk", row_number().over(wC)).filter($"rnk" <= 100)
    cand.select($"label", $"vec_id", $"rel", $"q")
      .as[(Long, Long, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (label, it) =>
        val cs = it.toArray.sortBy(c => (-c._3, c._2))
        val vecs = cs.map(_._4.map(_.toLong).toArray)
        def dotL(a: Array[Long], b: Array[Long]): Long = {
          var i = 0; var acc = 0L
          while (i < a.length) { acc += a(i) * b(i); i += 1 }
          acc
        }
        val n = cs.length
        val picked = scala.collection.mutable.ArrayBuffer[Int](0)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)](
          (label, 1L, cs(0)._2, cs(0)._3))
        var step = 2
        while (step <= 10 && step <= n) {
          var bi = -1; var bs = Long.MinValue; var bv = Long.MaxValue
          var i = 0
          while (i < n) {
            if (!picked.contains(i)) {
              var ms = Long.MinValue
              picked.foreach { p =>
                val sm = dotL(vecs(i), vecs(p)); if (sm > ms) ms = sm
              }
              val sc = cs(i)._3 - ms
              if (sc > bs || (sc == bs && cs(i)._2 < bv)) {
                bi = i; bs = sc; bv = cs(i)._2
              }
            }
            i += 1
          }
          picked += bi
          out += ((label, step.toLong, cs(bi)._2, bs))
          step += 1
        }
        out.iterator
      }
      .toDF("label", "step", "vec_id", "score2")
      .orderBy($"label", $"step")
  }

  /** q189 oracle: the 10 greedy steps UNROLLED as chained CTEs over
    * materialized integer-quantized candidates — the same argmax with
    * the same (score desc, vec_id) tie-break, stated declaratively. */
  val q189Sql: String = {
    val head =
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id, label,
        |    [CAST(floor(x*1000+0.5) AS BIGINT) for x in embedding] AS q
        |  FROM embeddings),
        |qv AS MATERIALIZED (
        |  SELECT label, arg_min(q, vec_id) AS q, min(vec_id) AS qid
        |  FROM e GROUP BY 1),
        |rel AS MATERIALIZED (
        |  SELECT e.label, e.vec_id, e.q,
        |    CAST(list_sum(list_transform(list_zip(qv.q, e.q),
        |      p -> p[1]*p[2])) AS BIGINT) AS rel
        |  FROM e JOIN qv ON qv.label = e.label AND e.vec_id <> qv.qid),
        |cand AS MATERIALIZED (
        |  SELECT label, vec_id, q, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY label
        |      ORDER BY rel DESC, vec_id) AS rnk
        |    FROM rel) t WHERE rnk <= 100),
        |sims AS MATERIALIZED (
        |  SELECT a.label, a.vec_id AS ia, b.vec_id AS ib,
        |    CAST(list_sum(list_transform(list_zip(a.q, b.q),
        |      p -> p[1]*p[2])) AS BIGINT) AS sim
        |  FROM cand a JOIN cand b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |s1 AS (
        |  SELECT label, vec_id, rel AS score2, CAST(1 AS BIGINT) AS step FROM (
        |    SELECT label, vec_id, rel,
        |      row_number() OVER (PARTITION BY label ORDER BY rel DESC, vec_id) AS rn
        |    FROM cand) t WHERE rn = 1),
        |p1 AS MATERIALIZED (SELECT label, vec_id FROM s1)""".stripMargin
    val steps = (2 to 10).map { i =>
      s"""m$i AS (
         |  SELECT c.label, c.vec_id, c.rel, max(s.sim) AS ms
         |  FROM cand c
         |  JOIN sims s ON s.label = c.label AND s.ia = c.vec_id
         |  JOIN p${i - 1} x ON x.label = s.label AND x.vec_id = s.ib
         |  WHERE NOT EXISTS (SELECT 1 FROM p${i - 1} y
         |                    WHERE y.label = c.label AND y.vec_id = c.vec_id)
         |  GROUP BY 1, 2, 3),
         |s$i AS (
         |  SELECT label, vec_id, score2, CAST($i AS BIGINT) AS step FROM (
         |    SELECT label, vec_id, rel - ms AS score2,
         |      row_number() OVER (PARTITION BY label
         |        ORDER BY rel - ms DESC, vec_id) AS rn
         |    FROM m$i) t WHERE rn = 1),
         |p$i AS MATERIALIZED (
         |  SELECT * FROM p${i - 1} UNION ALL SELECT label, vec_id FROM s$i)""".stripMargin
    }
    val union = (1 to 10).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    (head +: steps).mkString(",\n") +
      "\nSELECT CAST(label AS BIGINT) AS label, step, vec_id, score2 " +
      s"FROM ($union) z ORDER BY label, step"
  }

  // ---------------------------------------------------------------- q240

  /** q240_embed_gram — embedding co-moment (Gram) statistics: for the
    * first 8 dimensions, every upper-triangle cell (i ≤ j) emits n,
    * Σxᵢ, Σxⱼ, Σxᵢxⱼ — the sufficient statistics from which covariance,
    * correlation, and (driver-side, d×d) PCA all derive. This is the
    * distributed half of embedding-space diagnostics done right at
    * 100 TB: the CORPUS pass produces only O(d²) numbers; eigen-work
    * happens on that tiny matrix afterwards, never on the corpus.
    *
    * Exactness: elements land on the e6 integer grid (float32 widened
    * exactly to float64, one IEEE multiply, one floor — bit-identical
    * in both engines), so all three sums are exact int64 and
    * partial-aggregation order cannot matter.
    *
    * Scale shape: one narrow explode (36 cells/row) feeding a map-side
    * partial aggregation — each partition collapses to 36 rows before
    * the single tiny exchange. No joins, no corpus-sized shuffle.
    * (Σxᵢxⱼ per cell is ≤ 1e12 per row; int64 overflows past ~9M rows
    * per STATISTIC only at ~9e18 — beyond that, shard the fold by a
    * row-bucket column and sum the shards as DECIMAL, same plan.) */
  def q240EmbedGram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = 8
    val x = Tables.embeddings(s, dir).select(
      (1 to d).map(i => floor(element_at($"embedding", i).cast("double")
        * lit(1000000.0)).cast("long").as(s"x$i")): _*)
    val cells = for { i <- 1 to d; j <- i to d } yield
      struct(lit(i.toLong).as("i"), lit(j.toLong).as("j"),
        col(s"x$i").as("xi"), col(s"x$j").as("xj"),
        (col(s"x$i") * col(s"x$j")).as("xy"))
    x.select(explode(array(cells: _*)).as("c"))
      .groupBy($"c.i".as("i"), $"c.j".as("j"))
      .agg(count(lit(1)).as("n"), sum($"c.xi").as("sum_i"),
        sum($"c.xj").as("sum_j"), sum($"c.xy").as("sum_ij"))
      .orderBy($"i", $"j")
  }

  /** q240 oracle: the 36 cells as an explicit union — same e6 grid,
    * same exact integer sums. */
  val q240Sql: String = {
    val d = 8
    val base = (1 to d).map(i =>
      s"CAST(floor(CAST(embedding[$i] AS DOUBLE) * 1000000.0) AS BIGINT) " +
        s"AS x$i").mkString(", ")
    val cells = (for { i <- 1 to d; j <- i to d } yield
      s"SELECT CAST($i AS BIGINT) AS i, CAST($j AS BIGINT) AS j, " +
        s"CAST(count(*) AS BIGINT) AS n, CAST(sum(x$i) AS BIGINT) AS sum_i, " +
        s"CAST(sum(x$j) AS BIGINT) AS sum_j, " +
        s"CAST(sum(x$i * x$j) AS BIGINT) AS sum_ij FROM b")
      .mkString("\nUNION ALL ")
    s"WITH b AS (SELECT $base FROM embeddings)\n" +
      s"SELECT * FROM (\n$cells\n) z ORDER BY i, j"
  }

  // ---------------------------------------------------------------- q254

  /** q254_ann_filtered — FILTERED vector search (the metadata-
    * constrained top-k every production vector store serves: "nearest
    * neighbors among documents with this license/language/label"):
    * q25's brute-force cosine top-3, with candidates restricted to the
    * QUERY's own label. The filter composes into the join predicate, so
    * selectivity applies BEFORE any distance arithmetic — the
    * pre-filtering strategy (vs post-filtering, which under-fills k
    * when the filter is selective; the gate's exact per-label top-3
    * proves no candidate was lost to post-filter truncation).
    *
    * Scale shape: identical to q25 (queries broadcast into one corpus
    * scan) with the label equality as an extra join key — at 100 TB
    * with a label-partitioned layout this prunes whole partitions. */
  def q254AnnFiltered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", dvec($"embedding").as("v"))
      .select($"vec_id", $"label", $"v", norm($"v").as("nrm"))
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"label".as("q_label"),
        $"v".as("qv"), $"nrm".as("qnrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_r".desc, $"neighbor_id")
    e.join(broadcast(q),
        $"vec_id" =!= $"q_id" && $"label" === $"q_label")
      .select($"q_id", $"q_label".cast("long").as("q_label"),
        $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_r"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"q_id", $"q_label", $"rank", $"neighbor_id", $"cos_r")
      .orderBy($"q_id", $"rank")
  }

  /** q254 oracle: q25's pairing with the label constraint in the join. */
  val q254Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, [x::DOUBLE for x in embedding] AS v
       |  FROM embeddings),
       |prs AS (
       |  SELECT q.vec_id AS q_id, CAST(q.label AS BIGINT) AS q_label,
       |    n.vec_id AS neighbor_id,
       |    round(${duckCos("q.v", "n.v")}, 4) AS cos_r
       |  FROM e q JOIN e n
       |    ON q.vec_id < 5 AND n.vec_id <> q.vec_id AND n.label = q.label)
       |SELECT q_id, q_label, rank, neighbor_id, cos_r FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos_r DESC, neighbor_id) AS rank
       |  FROM prs) t
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q254_ann_filtered" -> (q254AnnFiltered _),
    "q240_embed_gram" -> (q240EmbedGram _),
    "q189_mmr" -> (q189Mmr _),
    "q151_label_centroid_cosine" -> (q151LabelCentroidCosine _),
    "q135_ivf_delta_insert" -> (q135IvfDeltaInsert _),
    "q131_embedding_drift" -> (q131EmbeddingDrift _),
    "q121_ann_ivf_rerank" -> (q121AnnIvfRerank _),
    "q118_ann_rerank"   -> (q118AnnRerank _),
    "q105_mutual_nn"    -> (q105MutualNn _),
    "q67_ann_sq8"       -> (q67AnnSq8 _),
    "q92_ann_pq"        -> (q92AnnPq _),
    "q25_ann_topk"      -> (q25AnnTopK _),
    "q26_embed_neardup" -> (q26EmbedNearDup _),
    "q30_ann_ivf"       -> (q30AnnIvf _),
    "q54_ann_lsh"       -> (q54AnnLsh _),
    "q64_semdedup"      -> (q64SemDedup _))

  val oracles: Map[String, String] = Map(
    "q254_ann_filtered" -> q254Sql,
    "q240_embed_gram" -> q240Sql,
    "q189_mmr" -> q189Sql,
    "q151_label_centroid_cosine" -> q151Sql,
    "q135_ivf_delta_insert" -> q135Sql,
    "q131_embedding_drift" -> q131Sql,
    "q121_ann_ivf_rerank" -> q121Sql,
    "q118_ann_rerank"   -> q118Sql,
    "q105_mutual_nn"    -> q105Sql,
    "q67_ann_sq8"       -> q67Sql,
    "q92_ann_pq"        -> q92Sql,
    "q25_ann_topk"      -> q25Sql,
    "q26_embed_neardup" -> q26Sql,
    "q30_ann_ivf"       -> q30Sql,
    "q54_ann_lsh"       -> q54Sql,
    "q64_semdedup"      -> q64Sql)
}
