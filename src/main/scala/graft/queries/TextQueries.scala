package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{DedupFunctions, TextFunctions}

/** Training-data text operators over the `documents` table: quality stats,
  * language ID, fingerprint dedup, MinHash-LSH near-dup, SimHash.
  *
  * Every oracle replays the SAME deterministic computation in DuckDB SQL
  * (md5-based hashing, identical tokenization), so the driver hash-compares
  * the full pipeline — not just row counts.
  *
  * Oracle-side building block used below (DuckDB list comprehensions):
  * 3-gram shingles of whitespace tokens, distinct.
  */
object TextQueries {

  /** DuckDB fragment: whitespace tokens of `text` — aligned with
    * [[TextFunctions.tokens]] on EMPTY documents: Spark yields `[]` where a
    * bare `string_split_regex('')` would yield `['']`, so the empty case is
    * made explicit on the oracle side too. */
  private val Toks =
    """CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE string_split_regex(trim(text), '\s+') END"""
  /** DuckDB fragment: distinct 3-gram shingles over `toks`. */
  private val Shingles3 =
    """list_distinct([list_aggregate(toks[i:i+2], 'string_agg', ' ') for i in range(1, len(toks)-1)])"""

  // Shared scoring/fingerprint pieces — q21/q35 publish them per document,
  // q23 dedups on the fingerprint, q47 composes all of them into the prep
  // pipeline. ONE definition each (Spark column + DuckDB fragment), so the
  // composition provably runs the same computation as the parts.

  /** floor(stopwords/tokens · 1e6), NULL for empty docs (q21 convention). */
  private def stopRatioE6(toks: Column): Column = {
    val nTok = size(toks)
    when(nTok === 0, lit(null).cast("long"))
      .otherwise(floor(TextFunctions.stopwordCount(toks) * lit(1000000.0) / nTok)
        .cast("long"))
  }

  /** Content fingerprint: md5 over the sorted distinct 3-shingle set. */
  private def contentFp(toks: Column): Column =
    md5(concat_ws("|", array_sort(TextFunctions.shingles(toks, 3))).cast("binary"))

  private def cntSql(ms: Seq[String]): String =
    s"len(list_filter(toks, t -> t IN (${ms.map(m => s"'$m'").mkString(",")})))"
  // vocabularies come from TextFunctions — the SAME lists the Spark-side
  // columns use, so the oracle fragments cannot drift from the engine
  private val StopCntSql = cntSql(TextFunctions.EnStop)
  private val StopRatioSql =
    s"CASE WHEN len(toks) = 0 THEN NULL ELSE CAST(floor($StopCntSql * 1000000.0 / len(toks)) AS BIGINT) END"
  private val LangCaseSql: String = {
    val cnts = TextFunctions.LangMarkers.map { case (lang, ms) => lang -> cntSql(ms) }
    val all = cnts.map(_._2).mkString(", ")
    val whens = cnts.map { case (lang, c) =>
      s"      WHEN $c > 0 AND $c = greatest($all) THEN '$lang'"
    }.mkString("\n")
    s"CASE\n$whens\n      ELSE 'und' END"
  }
  /** md5 of the sorted shingles; coalesce because string_agg over an empty
    * shingle set (doc with <3 tokens) is NULL in DuckDB but '' under Spark
    * concat_ws. */
  private val FpSql =
    s"md5(coalesce(list_aggregate(list_sort($Shingles3), 'string_agg', '|'), ''))"

  // ---------------------------------------------------------------- q21

  /** q21_text_stats — per-document token counts, BPE-ish subword count,
    * stopword/punctuation counts, stopword ratio, language guess. Pure
    * column algebra: one codegen pass over the scan, no shuffle. */
  def q21TextStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // toks is multi-referenced downstream (counts, ratio, langId) — as a
    // real column it tokenizes once per row (CollapseProject keeps
    // multi-use non-trivial aliases)
    val nStop = TextFunctions.stopwordCount($"toks")
    val nTok = size($"toks")
    // doc_id order established on the RAW scan, not after the text work: a
    // trailing orderBy would re-run the tokenize/count span in the range
    // partitioner's sampling pass; all ops below are narrow, so the source
    // order survives to the output
    Tables.documents(s, dir).orderBy($"doc_id")
      .select($"doc_id", $"text", TextFunctions.tokens($"text").as("toks"))
      .select(
        $"doc_id",
        nTok.cast("long").as("n_tokens"),
        TextFunctions.bpeishCount($"text").cast("long").as("n_bpeish"),
        nStop.cast("long").as("n_stop"),
        TextFunctions.punctCount($"text").cast("long").as("n_punct"),
        // ratio emitted as floor(r * 1e6): one deterministic double division +
        // floor serializes identically in both engines (round() half-grid
        // cases would not). Empty documents (0 tokens) emit NULL explicitly —
        // 0.0/0 is NaN and the engines disagree on casting NaN to integer
        stopRatioE6($"toks").as("stop_ratio_e6"),
        TextFunctions.langId($"toks").as("lang_guess"))
  }

  val q21Sql: String =
    s"""SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish,
       |  CAST($StopCntSql AS BIGINT) AS n_stop,
       |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
       |  $StopRatioSql AS stop_ratio_e6,
       |  $LangCaseSql AS lang_guess
       |FROM (SELECT doc_id, text, $Toks AS toks FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q23

  /** q23_dedup_fingerprint — exact dedup by content fingerprint: md5 over
    * the sorted distinct 3-shingle set maps reordered/duplicated documents
    * to one canonical doc_id. One shuffle (window over fp); at scale this is
    * the standard hash-partition dedup: fingerprints distribute uniformly. */
  def q23DedupFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withFp = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", contentFp($"toks").as("fp"))
    val w = Window.partitionBy($"fp")
    withFp.select(
      $"doc_id", $"fp",
      min($"doc_id").over(w).as("canonical_id"),
      count(lit(1)).over(w).as("n_copies"))
      .orderBy($"doc_id")
  }

  val q23Sql: String =
    s"""SELECT doc_id, fp,
       |  min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
       |  count(*) OVER (PARTITION BY fp) AS n_copies
       |FROM (SELECT doc_id, $FpSql AS fp
       |      FROM (SELECT doc_id, $Toks AS toks FROM documents))
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q24

  /** q24_dedup_minhash — MinHash-LSH near-duplicate pairs: 16 md5-seeded
    * minhashes, 8 bands × 2 rows, candidates from the band-bucket self-join,
    * exact-Jaccard verification at 0.5.
    *
    * NEVER all-pairs: the only join is bucket-to-bucket on band keys, so
    * cost scales with Σ bucket² (collisions), not N². The oracle IS
    * all-pairs — affordable at sf0.01 only — which also proves the LSH
    * candidate set loses no true pair on this data (true pairs sit at
    * J ≥ 0.96, where 8×2 bands miss with p ≈ 1e-10). */
  def q24DedupMinhash(s: SparkSession, dir: String): DataFrame =
    q24DedupMinhashCapped(s, dir, maxBucket = 1000, observer = None)

  /** q24 with the hot-bucket cap exposed and OBSERVED: `dropped_buckets` /
    * `dropped_ids` / `max_bucket_size` are collected as named metrics during
    * the query's one action (`Dataset.observe` — a CollectMetrics node costs
    * no extra job and no extra pass), so a run that sheds recall to the cap
    * says so in its metrics instead of silently losing pairs — the engine's
    * "no silent caps" bar. Pass an [[Observation]] to read them directly;
    * otherwise they land on the query-execution listener bus under
    * `"q24_lsh"`. */
  def q24DedupMinhashCapped(s: SparkSession, dir: String, maxBucket: Int,
                            observer: Option[org.apache.spark.sql.Observation]): DataFrame = {
    import s.implicits._
    // spread the scan (Tables.spread scaladoc): shingle+minhash lanes fuse
    // into the single-task 1-row-group scan stage otherwise
    val docs = Tables.spread(Tables.documents(s, dir)
      .select($"doc_id", $"text"), $"doc_id")
    val sh = docs
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", TextFunctions.shingles($"toks", 3).as("sh"))
      .filter(size($"sh") > 0)
    // sig materialized below a Generate (explode) — the generator references
    // the sig ATTRIBUTE, so the 16-hash MinHash pass runs once per row, not
    // once per band
    val sig = sh.select($"doc_id", DedupFunctions.minhashSignature($"sh", 16).as("sig"))
    val bands = sig.select($"doc_id",
        explode(DedupFunctions.bandKeys($"sig", 8, 2)).as("bk"))
    // candidates via groupBy-bucket + in-bucket pair expansion, NOT a
    // self-join: a self-join would evaluate the whole minhash subtree twice
    // (broadcast joins defeat exchange reuse); this shape computes it once
    // and shuffles only (bk, doc_id) pairs
    // hot-bucket guard: a degenerate band key (e.g. boilerplate-dominated
    // corpora) would expand quadratically; buckets past the cap are skipped
    // AND counted (observed metrics above). Never triggers on this corpus
    // (max observed bucket ≪ cap), so the exact all-pairs oracle stays
    // byte-identical.
    val buckets = bands.groupBy($"bk")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .filter(size($"ids") > 1)
    val dropped = (size($"ids") > maxBucket).cast("int")
    val metrics = Seq(
      coalesce(sum(dropped), lit(0)).as("dropped_buckets"),
      coalesce(sum(when(size($"ids") > maxBucket, size($"ids")).otherwise(0)), lit(0)).as("dropped_ids"),
      coalesce(max(size($"ids")), lit(0)).as("max_bucket_size"))
    val observed = observer match {
      case Some(o) => buckets.observe(o, metrics.head, metrics.tail: _*)
      case None    => buckets.observe("q24_lsh", metrics.head, metrics.tail: _*)
    }
    val cand = observed
      .filter(size($"ids") <= maxBucket)
      .select(explode(DedupFunctions.pairExpand($"ids")).as("p"))
      .select($"p.a".as("doc_a"), $"p.b".as("doc_b"))
      .distinct()
    val shA = sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
    val shB = sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b"))
    val jac = DedupFunctions.jaccard($"sh_a", $"sh_b")
    cand.join(shA, "doc_a").join(shB, "doc_b")
      .filter(jac >= 0.5)
      .select($"doc_a", $"doc_b", round(jac, 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  val q24Sql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, $Shingles3 AS s
       |  FROM (SELECT doc_id, $Toks AS toks FROM documents)
       |  WHERE len(toks) >= 3)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  round(len(list_intersect(a.s, b.s))::DOUBLE
       |        / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.s, b.s))::DOUBLE
       |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q35

  /** q35_quality_filter — training-data curation: keep documents passing
    * the quality gates (length band, stopword-ratio band, confident
    * language guess), emit them with their scores and the verdict reason
    * for the rejects. The shape of a 100 TB corpus-cleaning pass: one
    * codegen'd scan, no shuffle until the final (tiny) ordered output. */
  def q35QualityFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // source-sorted for the same reason as q21: narrow ops preserve order
    Tables.documents(s, dir).orderBy($"doc_id")
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        // same empty-document NULL convention as q21
        stopRatioE6($"toks").as("stop_ratio_e6"),
        TextFunctions.langId($"toks").as("lang_guess"))
      .withColumn("verdict",
        when($"n_tokens" < 20, lit("too_short"))
          .when($"n_tokens" > 2000, lit("too_long"))
          .when($"stop_ratio_e6" < 50000, lit("low_stopword"))
          .when($"lang_guess" === "und", lit("unknown_lang"))
          .otherwise(lit("keep")))
  }

  val q35Sql: String =
    s"""SELECT doc_id, n_tokens, stop_ratio_e6, lang_guess,
       |  CASE WHEN n_tokens < 20 THEN 'too_short'
       |       WHEN n_tokens > 2000 THEN 'too_long'
       |       WHEN stop_ratio_e6 < 50000 THEN 'low_stopword'
       |       WHEN lang_guess = 'und' THEN 'unknown_lang'
       |       ELSE 'keep' END AS verdict
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    $StopRatioSql AS stop_ratio_e6,
       |    $LangCaseSql AS lang_guess
       |  FROM (SELECT doc_id, $Toks AS toks FROM documents))
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q27

  /** q27_simhash — per-document 16-bit SimHash fingerprint (near-dup
    * bucketing key: equal fingerprints = candidate bucket, groupable with
    * ONE shuffle on a 2-byte key — the cheapest near-dup blocking). */
  def q27Simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // source-sorted for the same reason as q21: narrow ops preserve order
    Tables.documents(s, dir).orderBy($"doc_id")
      .select($"doc_id",
        DedupFunctions.simhash(TextFunctions.tokens($"text")).as("simhash"))
  }

  /** DuckDB fragment: the 16-bit majority-vote SimHash over a column `hs`
    * of per-token md5 hex strings — shared by the q27 and q70 oracles so
    * the blocking key cannot drift between them. */
  private def simhashBitsSql: String =
    simhashBitsSqlOf(DedupFunctions.SimhashBits)

  /** Width-parametric twin ([[graft.functions.DedupFunctions.simhashWide]]'s
    * oracle): the same vote over the first `bits` md5 nibbles. */
  private def simhashBitsSqlOf(bits: Int): String =
    (1 to bits).map { j =>
      val w = 1L << (bits - j)
      s"(CASE WHEN 2 * len(list_filter(hs, h -> substr(h, $j, 1) IN ('8','9','a','b','c','d','e','f'))) >= len(hs) THEN $w ELSE 0 END)"
    }.mkString(" + ")

  val q27Sql: String =
    s"""SELECT doc_id, CAST($simhashBitsSql AS BIGINT) AS simhash
       |FROM (SELECT doc_id, list_transform($Toks, t -> md5(t)) AS hs FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q36

  /** q36_vocab_topk — corpus vocabulary statistics: explode tokens
    * (Generate), aggregate counts and document frequency, top 50 terms.
    * The generator multiplies rows ~100× but the partial aggregation
    * collapses them map-side before the shuffle, so the exchange carries
    * |vocabulary| rows, not |tokens|. */
  def q36VocabTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct($"doc_id").as("n_docs"))
      .orderBy($"n_occurrences".desc, $"token")
      .limit(50)
  }

  val q36Sql: String =
    s"""SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
       |FROM (SELECT doc_id, unnest($Toks) AS token FROM documents)
       |GROUP BY token
       |ORDER BY n_occurrences DESC, token
       |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q37

  /** q37_tfidf — per-document top-5 terms by TF-IDF, the classic relevance /
    * keyword-extraction primitive over a training corpus.
    *
    * Scale shape: explode → partial-aggregated groupBy(doc, term) (the
    * exchange carries term COUNTS, not tokens) → document-frequency table by
    * one more |vocabulary|-sized aggregation → SHUFFLE join on term (the
    * vocabulary is corpus-sized — never broadcast) → per-doc top-5 via
    * row_number (WindowGroupLimit prunes partial top-k map-side). The corpus
    * size joins in as a broadcast 1-row aggregate, so N never touches the
    * driver. Scores are grid-snapped (round 6) before ranking, the engine's
    * cross-engine float convention. */
  def q37Tfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toksDf = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val tc = toksDf
      .select($"doc_id", size($"toks").as("n_tok"), explode($"toks").as("token"))
      .groupBy($"doc_id", $"n_tok", $"token") // n_tok is constant per doc
      .agg(count(lit(1)).as("cnt"))
    val dft = tc.groupBy($"token").agg(count(lit(1)).as("df_docs"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val score = round(($"cnt".cast("double") / $"n_tok") *
      log($"n_docs".cast("double") / $"df_docs"), 6)
    val w = Window.partitionBy($"doc_id").orderBy($"score_r".desc, $"token")
    tc.join(dft, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_r", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"doc_id", $"rank", $"token", $"score_r")
      .orderBy($"doc_id", $"rank")
  }

  val q37Sql: String =
    s"""WITH toks AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tc AS (
       |  SELECT doc_id, len(toks) AS n_tok, t.token, count(*) AS cnt
       |  FROM toks, unnest(toks) AS t(token)
       |  GROUP BY doc_id, len(toks), t.token),
       |dft AS (SELECT token, count(*) AS df_docs FROM tc GROUP BY token),
       |n AS (SELECT count(*) AS n_docs FROM documents)
       |SELECT doc_id, rank, token, score_r FROM (
       |  SELECT tc.doc_id, tc.token,
       |    round((tc.cnt::DOUBLE / tc.n_tok) * ln(n.n_docs::DOUBLE / dft.df_docs), 6) AS score_r,
       |    row_number() OVER (PARTITION BY tc.doc_id
       |      ORDER BY round((tc.cnt::DOUBLE / tc.n_tok) * ln(n.n_docs::DOUBLE / dft.df_docs), 6) DESC,
       |               tc.token) AS rank
       |  FROM tc JOIN dft USING (token) CROSS JOIN n) t
       |WHERE rank <= 5
       |ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------- q38

  /** q38_normalize — canonical text normalization (lowercase, punctuation →
    * space, whitespace collapse): the standard prep pass before dedup /
    * tokenization in a corpus pipeline. Pure narrow column algebra — one
    * codegen pass at scan speed, zero shuffle (source-sorted like q21). */
  def q38Normalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val norm = trim(regexp_replace(
      regexp_replace(lower($"text"), "[^a-z0-9\\s]", " "), "\\s+", " "))
    Tables.documents(s, dir).orderBy($"doc_id")
      .select($"doc_id",
        norm.as("norm_text"),
        length(norm).cast("long").as("n_chars_norm"))
  }

  val q38Sql: String =
    """SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars_norm
      |FROM (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q40

  /** q40_dedup_clusters — near-duplicate CLUSTER assignment: connected
    * components over the verified LSH pair graph (q24's edges), by
    * min-label propagation. Every document gets `cluster_id` = the smallest
    * doc_id reachable through near-dup edges — the "keep one canonical doc
    * per duplicate cluster" step that follows pair mining in a corpus
    * pipeline.
    *
    * Iterations are FIXED (3): each round is one join + one aggregation,
    * and labels converge once the iteration count reaches the cluster
    * diameter — near-dup clusters are cliques or short chains (here
    * diameter ≤ 2; the spec asserts convergence). Fixed rounds keep the
    * computation a static, oracle-replayable plan — the oracle replays the
    * SAME 3 rounds — and bound the cost at scale (k shuffles, never a
    * data-dependent driver loop). The edge list is localCheckpointed so the
    * LSH mining pipeline runs once, not once per round. */
  def q40DedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val verts = docs
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", TextFunctions.shingles($"toks", 3).as("sh"))
      .filter(size($"sh") > 0)
      .select($"doc_id")
    val pairs = q24DedupMinhash(s, dir).select($"doc_a", $"doc_b")
      .localCheckpoint(true) // materialize the mined edges once
    val edges = pairs.unionByName(
      pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))

    var labels = verts.select($"doc_id", $"doc_id".as("label"))
    for (_ <- 1 to 3) {
      val nbrMin = edges.join(labels.withColumnRenamed("doc_id", "nbr"),
          $"doc_b" === $"nbr")
        .groupBy($"doc_a").agg(min($"label").as("nbr_label"))
      labels = labels.join(nbrMin, $"doc_id" === $"doc_a", "left")
        .select($"doc_id",
          least($"label", coalesce($"nbr_label", $"label")).as("label"))
    }
    labels.select($"doc_id", $"label".as("cluster_id")).orderBy($"doc_id")
  }

  /** One min-label propagation round in SQL: new = min(own, min(neighbor)). */
  private def q40Round(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT l.doc_id, least(l.label, coalesce(n.nbr_label, l.label)) AS label
       |  FROM $prev l LEFT JOIN (
       |    SELECT e.doc_a, min(p.label) AS nbr_label
       |    FROM edges e JOIN $prev p ON e.doc_b = p.doc_id
       |    GROUP BY e.doc_a) n ON l.doc_id = n.doc_a)""".stripMargin

  /** q40's full WITH chain (mining + 3 propagation rounds), shared with the
    * q129 split oracle so both gates provably replay the SAME clustering. */
  private val q40WithChain: String =
    s"""WITH sh AS (
       |  SELECT doc_id, $Shingles3 AS s
       |  FROM (SELECT doc_id, $Toks AS toks FROM documents)
       |  WHERE len(toks) >= 3),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
       |        / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
       |edges AS (SELECT doc_a, doc_b FROM pairs
       |          UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs),
       |l0 AS (SELECT doc_id, doc_id AS label FROM sh),
       |${q40Round("l0", "l1")},
       |${q40Round("l1", "l2")},
       |${q40Round("l2", "l3")}""".stripMargin

  val q40Sql: String =
    s"""$q40WithChain
       |SELECT doc_id, label AS cluster_id FROM l3 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q41

  /** q41_redact — PII scrubbing, the clean-room-adjacent corpus op: emails
    * and long digit runs (ids / phone numbers) replaced with typed redaction
    * tokens, with per-document redaction counts so downstream consumers can
    * audit scrub rates. Narrow column algebra, one codegen pass
    * (source-sorted like q21). */
  def q41Redact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val NumRe = "[0-9]{6,}"
    Tables.documents(s, dir).orderBy($"doc_id")
      .select($"doc_id",
        regexp_replace(regexp_replace($"text", EmailRe, "<EMAIL>"), NumRe, "<NUM>")
          .as("redacted"),
        regexp_count($"text", lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(regexp_replace($"text", EmailRe, "<EMAIL>"), lit(NumRe))
          .cast("long").as("n_longnums"))
  }

  val q41Sql: String = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val num = "[0-9]{6,}"
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'), '$num', '<NUM>', 'g') AS redacted,
       |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(regexp_replace(text, '$email', '<EMAIL>', 'g'), '$num')) AS BIGINT) AS n_longnums
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q43

  /** q43_stratified_sample — DETERMINISTIC stratified sampling: keep 50% of
    * English documents and ~20% of every other language, selected by an
    * md5-hex bucket of the document id (`substr(md5(id),1,2)` compared
    * against a per-stratum hex threshold — 256 uniform buckets).
    *
    * Training-data pipelines need REPRODUCIBLE samples (a re-run must pick
    * the same documents, and adding data must not reshuffle old picks), so
    * `Dataset.sample`'s seeded-but-partitioning-dependent RNG is the wrong
    * tool at scale; a content hash is stable under repartitioning, retries
    * and growth. Pure narrow filter — scan speed, no shuffle, and the
    * oracle replays the identical hash. */
  def q43StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = substring(md5($"doc_id".cast("string").cast("binary")), 1, 2)
    val threshold = when($"lang" === "en", lit("80")).otherwise(lit("33"))
    Tables.documents(s, dir).orderBy($"doc_id")
      .filter(bucket < threshold)
      .select($"doc_id", $"lang", bucket.as("bucket"))
  }

  val q43Sql: String =
    """SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
      |      < CASE WHEN lang = 'en' THEN '80' ELSE '33' END
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q47

  /** q47_training_prep — the end-to-end corpus-curation pipeline the
    * individual operators exist FOR, composed as one dataflow:
    *
    *   score (tokens, stopword ratio, language) → quality-filter (q35's
    *   gates) → exact-dedup on the content fingerprint (q23's md5 over the
    *   sorted 3-shingle set, min-doc_id canonical) → deterministic
    *   hash-bucket sample (q43's md5 bucket, 50% here).
    *
    * Shape at 100 TB: ONE codegen'd scan does score+filter (narrow, no
    * shuffle), the dedup is the single hash-partition shuffle on `fp`, and
    * the sample is again narrow — so the whole prep pass costs one shuffle
    * of the quality-surviving subset, which is how a petabyte corpus prep
    * has to be built. The DuckDB oracle replays every stage exactly, so the
    * gate hash-checks the COMPOSITION, not just the parts. */
  /** The narrow score → quality-gate → fingerprint stage of the corpus-prep
    * pipeline, single-sourced so the batch query (q47) and the streaming
    * pipeline ([[graft.streaming.CorpusStream]]) provably run the SAME
    * computation — stateless column algebra, so it runs unchanged on a
    * batch or streaming DataFrame. Emits quality-surviving docs as
    * (doc_id, lang, n_tokens, fp). */
  private[graft] def prepScored(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", $"lang", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", $"lang", $"toks",
        size($"toks").cast("long").as("n_tokens"),
        stopRatioE6($"toks").as("stop_ratio_e6"),
        TextFunctions.langId($"toks").as("lang_guess"))
      .filter($"n_tokens".between(20, 2000) &&
        $"stop_ratio_e6" >= 50000 && $"lang_guess" =!= "und")
      .select($"doc_id", $"lang", $"n_tokens", contentFp($"toks").as("fp"))
  }

  /** The q43/q47 deterministic md5 sample bucket of a doc id column. */
  private[graft] def sampleBucket(docId: Column): Column =
    substring(md5(docId.cast("string").cast("binary")), 1, 2)

  def q47TrainingPrep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NO source sort (unlike the all-narrow q21/q35): the fp shuffle below
    // destroys any pre-established order anyway, and a source orderBy would
    // add a range exchange whose sampling pass re-runs the scan + gates —
    // the trailing orderBy alone orders the (small) surviving output
    val withFp = prepScored(Tables.documents(s, dir))
    val w = Window.partitionBy($"fp").orderBy($"doc_id")
    val canon = withFp
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    val bucket = sampleBucket($"doc_id")
    canon.filter(bucket < lit("80"))
      .select($"doc_id", $"lang", $"n_tokens", $"fp", bucket.as("bucket"))
      .orderBy($"doc_id")
  }

  val q47Sql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, lang, toks,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    $StopRatioSql AS stop_ratio_e6,
       |    $LangCaseSql AS lang_guess
       |  FROM (SELECT doc_id, lang, text, $Toks AS toks FROM documents)),
       |kept AS (
       |  SELECT * FROM scored
       |  WHERE n_tokens BETWEEN 20 AND 2000 AND stop_ratio_e6 >= 50000
       |    AND lang_guess <> 'und'),
       |fps AS (
       |  SELECT doc_id, lang, n_tokens, $FpSql AS fp
       |  FROM kept),
       |canon AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fps)
       |  WHERE rn = 1)
       |SELECT doc_id, lang, n_tokens, fp,
       |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
       |FROM canon
       |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q55

  /** q55_pack_shards — training-shard assignment (sequence packing's outer
    * loop): within each language stratum, documents are packed in doc_id
    * order into ≈2048-token shards by cumulative token count — shard id =
    * floor(tokens-before / capacity), so a shard holds consecutive
    * documents until the budget spills (straddlers allowed, the standard
    * "pack then split at the boundary" shard layout). Emits each doc's
    * shard plus the shard-relative offset a writer would start at.
    *
    * Scale shape: ONE window (partitioned by the stratum, ordered by
    * doc_id) — the running sum is the only state, so the pass is one
    * shuffle on `lang` and linear within partitions. A stratum far larger
    * than one executor's share gets range-split first (assign provisional
    * shards per range, then offset by the ranges' totals — the same
    * offsets trick q52's dense ids use); here strata are language-sized
    * and the straightforward window is the honest shape. */
  def q55PackShards(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cap = 2048L
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        size(TextFunctions.tokens($"text")).cast("long").as("n_tokens"))
      .select($"doc_id", $"lang", $"n_tokens",
        coalesce(sum($"n_tokens").over(w), lit(0L)).as("tokens_before"))
      .select($"doc_id", $"lang", $"n_tokens",
        floor($"tokens_before" / cap).cast("long").as("shard_id"),
        ($"tokens_before" % cap).as("shard_offset"))
      .orderBy($"lang", $"doc_id")
  }

  val q55Sql: String =
    s"""WITH counted AS (
       |  SELECT doc_id, lang, CAST(len($Toks) AS BIGINT) AS n_tokens
       |  FROM documents),
       |cum AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
       |  FROM counted)
       |SELECT doc_id, lang, n_tokens,
       |  CAST(floor(tokens_before / 2048) AS BIGINT) AS shard_id,
       |  CAST(tokens_before % 2048 AS BIGINT) AS shard_offset
       |FROM cum
       |ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------- q57

  /** Target mixture for q57 — dyadic weights (sums of powers of two), so
    * every quota computation (n/w, min, w·T, floor) is EXACT in binary
    * floating point on both engines: no parity risk in the float path. */
  private val MixtureWeights = Seq(
    "en" -> 0.5, "zh" -> 0.125, "es" -> 0.125, "de" -> 0.125, "fr" -> 0.125)

  /** q57_mixture_sample — training-mixture construction: rebalance the
    * corpus to a declared language mixture (en 50%, zh/es/de/fr 12.5%
    * each). The achievable total is T = min_l(n_l / w_l) (the scarcest
    * stratum binds); each stratum contributes its quota floor(w_l·T),
    * selected deterministically by md5-hash order (q43's convention —
    * reproducible under repartition, retries, and corpus growth). The
    * everyday op between corpus curation and tokenization: every LLM run
    * declares a data mixture, and it has to be sampled deterministically.
    *
    * Scale shape: one count agg (rows per stratum: tiny), the quota
    * arithmetic on that tiny relation (broadcast back), and ONE window
    * shuffle on `lang` for the hash-rank — restricted by a broadcast
    * semi-join to the DECLARED strata first, so a corpus with hundreds of
    * undeclared languages never shuffles them through the window. The
    * per-stratum row_number is Spark's 32-bit one: a stratum past 2^31
    * docs needs the q52 zipWithIndex dense-rank path instead (same
    * offsets trick as q55's range-split recipe). No driver-side collect:
    * quotas flow as a broadcast join.
    *
    * A DECLARED stratum with zero documents binds T to 0 — the sample is
    * EMPTY rather than silently violating the declared mixture (weights
    * are the outer side of the count join). */
  def q57MixtureSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wdf = MixtureWeights.toDF("lang", "w")
    val docs = Tables.documents(s, dir).select($"doc_id", $"lang")
      .join(broadcast(wdf.select($"lang")), Seq("lang"), "left_semi")
    // weights stay the OUTER side (a declared stratum with no documents
    // must surface as n=0, not vanish); the hint rides the counts agg —
    // corpus-derived but O(strata) rows, and the outer side of a left
    // join cannot broadcast anyway
    val caps = wdf
      .join(broadcast(docs.groupBy($"lang").agg(count(lit(1)).as("n"))),
        Seq("lang"), "left")
      .select($"lang", $"w", coalesce($"n", lit(0L)).as("n"))
    val t = caps.agg(min($"n" / $"w").as("t"))
    val quotas = caps.crossJoin(broadcast(t))
      .select($"lang", floor($"w" * $"t").cast("long").as("k"))
    val rk = row_number().over(Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string").cast("binary")), $"doc_id"))
    docs.withColumn("rk", rk)
      .join(broadcast(quotas), "lang")
      .filter($"rk" <= $"k")
      .select($"doc_id", $"lang", $"rk".cast("long").as("rank_in_lang"))
      .orderBy($"lang", $"rank_in_lang")
  }

  val q57Sql: String = {
    val values = MixtureWeights
      .map { case (l, w) => s"('$l', ${w}E0)" }.mkString(", ") // E0: force DOUBLE
    s"""WITH w(lang, w) AS (VALUES $values),
       |caps AS (
       |  SELECT w.lang, coalesce(c.n, 0) AS n, w.w
       |  FROM w
       |  LEFT JOIN (SELECT lang, count(*) AS n FROM documents GROUP BY lang) c
       |  USING (lang)),
       |t AS (SELECT min(n / w) AS t FROM caps),
       |quotas AS (SELECT lang, CAST(floor(w * t.t) AS BIGINT) AS k FROM caps, t),
       |ranked AS (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM documents)
       |SELECT doc_id, r.lang, CAST(rk AS BIGINT) AS rank_in_lang
       |FROM ranked r JOIN quotas q ON r.lang = q.lang AND r.rk <= q.k
       |ORDER BY r.lang, rank_in_lang""".stripMargin
  }

  // ---------------------------------------------------------------- q52

  /** q52_ngram_jaccard — EXACT n-gram Jaccard similarity join (J ≥ 7/10
    * over 3-gram shingle sets) via prefix filtering (the AllPairs/PPJoin
    * family, Bayardo et al., WWW'07): order every set by one global token
    * order (document frequency ascending, ties by token), and for
    * threshold t a true pair MUST share a token inside both sets' first
    * `sz - ceil(t·sz) + 1` tokens — so an inverted index over only those
    * prefixes generates a candidate set that provably loses no pair, and
    * exact verification prunes it down. Complements q24: same output
    * contract, but exact-complete by construction instead of
    * probabilistically complete.
    *
    * Scale shape: cost is Σ posting², never N², and df-ASCENDING prefixes
    * are built from the RAREST tokens, so postings stay small on natural
    * corpora (the common tokens that would create hot postings are exactly
    * the ones the prefix excludes). Gram width and threshold ARE the cost
    * dial: this corpus draws from a ~30-word vocabulary, so 2-grams repeat
    * everywhere (measured: 35 s at sf0.1 — posting lists went quadratic)
    * while 3-grams at t=0.7 keep the exact join at ~1 s. Three shuffles:
    * df agg, per-doc re-collect, posting agg. No float in any pruning
    * decision: prefix length and the J ≥ 7/10 gate are integer arithmetic
    * (`10·|∩| ≥ 7·|∪|`), so engine float differences cannot flip
    * membership.
    *
    * Oracle: plain all-pairs exact Jaccard — affordable at sf0.01/0.1 only —
    * which checks the completeness claim, not just the verifier. */
  /** Each document's 3-gram shingle set as a SORTED array of dense integer
    * ids in the global df-ascending token order — q52's dictionary-encoded
    * set representation, shared verbatim by the Jaccard (q52) and
    * containment (q109) joins so the machinery is certified once. See
    * q52's scaladoc for why the encoding and the distributed rank
    * assignment look the way they do. localCheckpoint'ed: every caller
    * fans it into ≥3 branches (index + both verification sides). */
  private def shingleGidSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NOT spread (r20, reverting r19): tokenize+shingle here feeds an
    // immediate explode + df aggregation — the first exchange already
    // parallelizes everything downstream, and the driver's r19 bench
    // measured the kept "marginal" spread at −17%/−14% (q52 3.66→4.42 s,
    // q109 3.56→4.12 s) — the full-text exchange costs more than the
    // single-task scan stage it shortens
    val sh = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.shingles(TextFunctions.tokens($"text"), 3).as("sh"))
      .filter(size($"sh") > 0)
    val tok = sh.select($"doc_id", size($"sh").as("sz"), explode($"sh").as("tk"))
    // dictionary-encode the global order: gid = dense rank by (df, tk).
    // Every downstream step then works on INTEGER ids — the posting
    // shuffle moves ints, and verification intersects int arrays (~10×
    // cheaper per element than hashing UTF8 strings). Dense ids are
    // assigned DISTRIBUTED: range-partition the vocabulary by (df, tk),
    // sort within partitions, then zipWithIndex (its extra count job is
    // the per-partition-offsets pass) — no single-partition window, so the
    // assignment survives a billion-term vocabulary. Rank values only need
    // to be a monotone bijection of the (df, tk) order, which this is, for
    // any range boundaries the sampler picks.
    val dfreq = tok.groupBy($"tk").agg(count(lit(1)).as("df"))
    val dict = {
      val sorted = dfreq.repartitionByRange(s.sessionState.conf.numShufflePartitions,
          $"df", $"tk")
        .sortWithinPartitions($"df", $"tk")
        .select($"tk")
      sorted.rdd.map(_.getString(0)).zipWithIndex()
        .map { case (tk, i) => (tk, i + 1) }.toDF("tk", "gid")
    }
    // each doc's set re-collected as a SORTED gid array = the set in the
    // global df-ascending order; localCheckpoint because it feeds three
    // branches (prefix index + both verification sides — q40's pattern)
    tok.join(dict, "tk")
      .groupBy($"doc_id", $"sz")
      .agg(sort_array(collect_list($"gid")).as("ord"))
      .localCheckpoint(true)
  }

  def q52NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gids = shingleGidSets(s, dir)
    // prefix length for t = 7/10: sz - ceil(7·sz/10) + 1, all-integer
    // (floor of exact small-int division — no float-ceil edge cases)
    val p = ($"sz" - floor(($"sz" * 7 + 9) / 10) + 1).cast("int")
    val pre = gids.select($"doc_id", explode(slice($"ord", lit(1), p)).as("gid"))
    // inverted index over prefix ids → in-posting pair expansion (the q24
    // bucket shape: groupBy + pairExpand — only (gid, doc_id) int pairs
    // shuffle). Exactness forbids a posting cap here; at 100 TB the
    // df-ascending prefix keeps postings small, and a capped variant would
    // have to report its drops the way q24 observes them.
    val cand = pre.groupBy($"gid")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .filter(size($"ids") > 1)
      .select(explode(DedupFunctions.pairExpand($"ids")).as("pr"))
      .select($"pr.a".as("doc_a"), $"pr.b".as("doc_b"))
      .distinct()
    // verification on int arrays; |∪| derived arithmetically from the set
    // sizes (|A|+|B|−|∩| — the arrays are distinct by construction), and
    // |∩| is the native merge-scan graft_intersect_size over the SORTED id
    // arrays — primitive longs, no hash set, no boxing (array_intersect's
    // hash-set build per pair, evaluated twice once filter pushdown
    // re-inlines the alias, dominated the query)
    val gA = gids.select($"doc_id".as("doc_a"), $"ord".as("ord_a"), $"sz".as("sz_a"))
    val gB = gids.select($"doc_id".as("doc_b"), $"ord".as("ord_b"), $"sz".as("sz_b"))
    val inter = call_function("graft_intersect_size", $"ord_a", $"ord_b")
    val uni = $"sz_a" + $"sz_b" - inter
    cand.join(gA, "doc_a").join(gB, "doc_b")
      .filter(inter * 10 >= uni * 7)
      .select($"doc_a", $"doc_b", round(inter.cast("double") / uni, 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  val q52Sql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, $Shingles3 AS s
       |  FROM (SELECT doc_id, $Toks AS toks FROM documents)
       |  WHERE len(toks) >= 3),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_intersect(a.s, b.s)) AS inter,
       |    len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, round(inter::DOUBLE / uni, 6) AS jaccard
       |FROM pairs
       |WHERE 10 * inter >= 7 * uni
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q53

  /** q53_winnow_fingerprint — rolling-hash document fingerprints via
    * winnowing ([[graft.functions.expressions.Winnow]]; k=8-char grams,
    * window w=4): the MOSS/plagiarism-detection fingerprint family, with
    * the guarantee that any shared substring of ≥ w+k-1 = 11 chars between
    * two documents yields a shared fingerprint. Output is the exploded
    * (doc_id, fp) relation — grouping by fp is then exactly q23's
    * hash-partition dedup shape, but robust to partial overlap instead of
    * whole-content equality.
    *
    * Scale shape: pure narrow column work — one codegen'd O(chars) pass per
    * row (true rolling hash, amortized-O(1) window minima), explode, no
    * HASH shuffle; the only exchange is the range partitioning of the cheap
    * source sort (q21's pattern), which the narrow winnow+explode then
    * preserves — TextQueriesSpec pins the resulting (doc_id, fp) output
    * order against an explicitly sorted copy so an optimizer change cannot
    * silently break the row-order-strict oracle compare. The oracle replays
    * hash+selection positionally in SQL
    * (O(chars·k) there — fine at oracle SF) using the `h·2^20 + (2^20−pos)`
    * key packing, which is exact because the modulus is 2^20 and oracle
    * documents are far shorter than 2^20 chars. */
  def q53WinnowFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).orderBy($"doc_id")
      .select($"doc_id",
        explode(call_function("graft_winnow", $"text", lit(8), lit(4))).as("fp"))
  }

  val q53Sql: String =
    s"""WITH pos AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS i,
       |    CAST(list_sum([ascii(substr(text, CAST(u.i + j AS INT), 1)) * (31.0 ** (7 - j))
       |                   for j in range(0, 8)]) AS BIGINT) % 1048576 AS h
       |  FROM documents, UNNEST(range(1, length(text) - 8 + 2)) AS u(i)),
       |win AS (
       |  SELECT doc_id, i, h,
       |    h * 1048576 + (1048576 - i) AS key,
       |    count(*) OVER (PARTITION BY doc_id) AS npos
       |  FROM pos),
       |sel AS (
       |  SELECT doc_id,
       |    min(key) OVER (PARTITION BY doc_id ORDER BY i
       |                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
       |  FROM win
       |  QUALIFY i <= npos - 4 + 1)
       |SELECT DISTINCT doc_id, wmin // 1048576 AS fp FROM sel
       |ORDER BY doc_id, fp""".stripMargin

  // ---------------------------------------------------------------- q58

  /** q58_repetition_signals — Gopher-style repetition quality gates (Rae et
    * al. 2021, §A1.1): per-document type-token ratio, most-frequent token
    * and 2-gram occurrence fractions, duplicate-3-gram fraction, and a
    * first-failing-gate verdict. Machine-generated/boilerplate text shows
    * up as low TTR or a dominant repeated gram long before a model sees it;
    * this is the standard pre-training reject pass after language ID
    * (q21/q35) and before dedup (q23/q24).
    *
    * Scale shape: the naive formulation explodes every token and 2/3-gram
    * and aggregates twice by (doc, gram) — two corpus-wide shuffles. Here
    * the entire multiset computation runs inside the native one-pass
    * [[graft.functions.expressions.RepetitionStats]] expression, so the
    * query is a pure narrow column pass at scan speed: zero hash shuffles
    * (PlanSpec pins it), the only exchange being the q21-pattern source
    * range-sort. All fractions land on the floor(x·1e6) integer grid before
    * the verdict compares them, so the gates are engine-exact; ties for
    * "most frequent" break to the lexicographically smallest gram on both
    * sides. Thresholds sit near the corpus p95 (measured at sf0.001/0.01)
    * so every gate actually fires at every SF. */
  def q58RepetitionSignals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e6 = lit(1000000.0)
    Tables.documents(s, dir).orderBy($"doc_id")
      .select($"doc_id",
        call_function("graft_repetition", TextFunctions.tokens($"text")).as("r"))
      .select(
        $"doc_id",
        $"r.n_tokens".as("n_tokens"),
        when($"r.n_tokens" === 0, lit(null).cast("long"))
          .otherwise(floor($"r.n_distinct" * e6 / $"r.n_tokens").cast("long"))
          .as("ttr_e6"),
        $"r.top_tok".as("top_token"),
        when($"r.n_tokens" === 0, lit(null).cast("long"))
          .otherwise(floor($"r.top_tok_cnt" * e6 / $"r.n_tokens").cast("long"))
          .as("top_token_frac_e6"),
        $"r.top_bigram".as("top_bigram"),
        when($"r.n_tokens" < 2, lit(null).cast("long"))
          .otherwise(floor($"r.top_bigram_cnt" * e6 / ($"r.n_tokens" - 1)).cast("long"))
          .as("top_bigram_frac_e6"),
        when($"r.n_tokens" < 3, lit(null).cast("long"))
          .otherwise(floor(($"r.n_trigrams" - $"r.n_distinct_trigrams") * e6 / $"r.n_trigrams")
            .cast("long"))
          .as("dup_trigram_frac_e6"))
      // n >= 5 implies every fraction is non-null, so the gate order below
      // never compares against NULL (too_short short-circuits first)
      .withColumn("verdict",
        when($"n_tokens" < 5, "too_short")
          .when($"ttr_e6" < 300000L, "low_ttr")
          .when($"top_token_frac_e6" > 160000L, "top_token")
          .when($"top_bigram_frac_e6" > 87000L, "top_bigram")
          .when($"dup_trigram_frac_e6" > 11000L, "dup_trigram")
          .otherwise("keep"))
  }

  val q58Sql: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |d AS (
       |  SELECT doc_id, toks, len(toks) AS n, len(list_distinct(toks)) AS nd,
       |    [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS bg,
       |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
       |     for i in range(1, len(toks) - 1)] AS tg
       |  FROM t),
       |tok AS (SELECT doc_id, u.g AS g, count(*) AS c
       |        FROM t, UNNEST(t.toks) AS u(g) GROUP BY 1, 2),
       |topt AS (SELECT doc_id, g, c FROM tok
       |         QUALIFY row_number() OVER (PARTITION BY doc_id
       |                                    ORDER BY c DESC, g ASC) = 1),
       |bgx AS (SELECT doc_id, u.g AS g, count(*) AS c
       |        FROM d, UNNEST(d.bg) AS u(g) GROUP BY 1, 2),
       |topb AS (SELECT doc_id, g, c FROM bgx
       |         QUALIFY row_number() OVER (PARTITION BY doc_id
       |                                    ORDER BY c DESC, g ASC) = 1),
       |base AS (
       |  SELECT d.doc_id, d.n,
       |    CASE WHEN d.n = 0 THEN NULL
       |         ELSE CAST(floor(d.nd * 1000000.0 / d.n) AS BIGINT) END AS ttr_e6,
       |    topt.g AS top_token,
       |    CASE WHEN d.n = 0 THEN NULL
       |         ELSE CAST(floor(topt.c * 1000000.0 / d.n) AS BIGINT) END AS top_token_frac_e6,
       |    topb.g AS top_bigram,
       |    CASE WHEN d.n < 2 THEN NULL
       |         ELSE CAST(floor(topb.c * 1000000.0 / (d.n - 1)) AS BIGINT) END AS top_bigram_frac_e6,
       |    CASE WHEN d.n < 3 THEN NULL
       |         ELSE CAST(floor((len(tg) - len(list_distinct(tg))) * 1000000.0 / len(tg))
       |              AS BIGINT) END AS dup_trigram_frac_e6
       |  FROM d
       |  LEFT JOIN topt ON d.doc_id = topt.doc_id
       |  LEFT JOIN topb ON d.doc_id = topb.doc_id)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, ttr_e6, top_token,
       |  top_token_frac_e6, top_bigram, top_bigram_frac_e6, dup_trigram_frac_e6,
       |  CASE WHEN n < 5 THEN 'too_short'
       |       WHEN ttr_e6 < 300000 THEN 'low_ttr'
       |       WHEN top_token_frac_e6 > 160000 THEN 'top_token'
       |       WHEN top_bigram_frac_e6 > 87000 THEN 'top_bigram'
       |       WHEN dup_trigram_frac_e6 > 11000 THEN 'dup_trigram'
       |       ELSE 'keep' END AS verdict
       |FROM base
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q61

  /** q61_boilerplate_scrub — cross-document repeated-window removal: any
    * 6-token window that appears verbatim in ≥ 2 DISTINCT documents is
    * boilerplate; every token position covered by such a window is dropped
    * and the document re-assembled from the survivors. This is the bounded
    * window-hash version of exact substring deduplication (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better" —
    * their suffix-array pass finds arbitrary-length repeats; fixed-width
    * windows find every repeat ≥ w at 1/w the index size), and the
    * token-soup analog of C4's duplicated-line removal. Repetition WITHIN
    * one document is untouched — that is q58's signal, not boilerplate.
    *
    * Scale shape: windows are built per-row (narrow HOF pass), then ONE
    * exact count-distinct shuffle keyed by the window gram finds the
    * frequent set, a shuffle semi-join marks covered starts, and coverage /
    * anti-join / reassembly all shuffle by doc — every stage is keyed, no
    * pair blowup anywhere (cost is Σ windows, never N²). The gram is
    * reduced to a 128-BIT FINGERPRINT (two xxhash64 lanes made independent
    * by a salt-FIRST second lane — see the inline note in
    * [[coveredPositions]] for why salt order matters) in
    * the scan, so the count-distinct shuffle and the semi-join carry
    * 16-byte keys instead of W-token strings (severalfold smaller — the
    * gram text never leaves the executor that built it). 64 bits alone
    * would NOT survive 100 TB (birthday bound at ~2³² windows, and a 100 TB
    * corpus has ~10¹³); at 128 bits the collision probability at 10¹³
    * windows is ~1e-13, and the worst case of a collision is one spurious
    * boilerplate window, not lost text. The oracle replays the STRING
    * semantics, so a collision at gate scale would fail the hash compare.
    * The frequent set is corpus-derived and unbounded, so it is a SHUFFLE
    * join by design — broadcasting it would be the q37 vocabulary mistake. */
  /** Repeated-window width shared by q61 (scrub) and q72 (span inventory). */
  private val RepeatW = 6

  /** (doc_id, p): every 0-based token position covered by a [[RepeatW]]-token
    * window that appears verbatim in ≥ 2 distinct documents — the shared
    * mining core of q61 and q72 (see q61's scaladoc for the scale shape;
    * `docs` must be (doc_id, toks)). */
  /** The shared window-mining core: `win` = every W-token window as
    * (doc_id, start, fingerprint), `freq` = the fingerprints repeated
    * across ≥ 2 documents, each with its CANONICAL document (the lowest
    * doc_id containing the gram — what q87's keep-one-copy rule retains). */
  private def repeatedWindows(docs: DataFrame): (DataFrame, DataFrame) = {
    val s = docs.sparkSession
    import s.implicits._
    val W = RepeatW
    val win = docs.filter(size($"toks") >= W)
      .select($"doc_id", posexplode(
        transform(sequence(lit(0), size($"toks") - W),
          i => array_join(slice($"toks", i + 1, lit(W)), " "))).as(Seq("start", "g")))
      // 128-bit fingerprint in the scan; the gram string never shuffles.
      // Lane 2 salts FIRST: multi-arg xxhash64 left-folds (seed carries),
      // so xxhash64(lit(1L), g) hashes g under effective seed XXH64(1L, 42)
      // — independent of lane 1's plain XXH64(g, 42). (Salting LAST would
      // make h2 = XXH64(1L, seed = h1), a pure function of h1: every h1
      // collision would also collide h2, leaving only 64 effective bits.)
      .select($"doc_id", $"start",
        xxhash64($"g").as("h1"), xxhash64(lit(1L), $"g").as("h2"))
    val freq = win.groupBy($"h1", $"h2")
      .agg(countDistinct($"doc_id").as("nd"), min($"doc_id").as("canon_doc"))
      .filter($"nd" >= 2)
    (win, freq)
  }

  private def coveredPositions(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val (win, freq) = repeatedWindows(docs)
    win.join(freq.select($"h1", $"h2"), Seq("h1", "h2"))
      .select($"doc_id", explode(sequence($"start", $"start" + (RepeatW - 1))).as("p"))
      .distinct()
  }

  /** q87's removal set: positions covered by a repeated window whose
    * canonical occurrence lives in ANOTHER document — the gram's lowest-
    * doc_id copy keeps its positions (Lee et al.'s "all but one"). */
  private def nonCanonicalCovered(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val (win, freq) = repeatedWindows(docs)
    win.join(freq.select($"h1", $"h2", $"canon_doc"), Seq("h1", "h2"))
      .filter($"doc_id" =!= $"canon_doc")
      .select($"doc_id", explode(sequence($"start", $"start" + (RepeatW - 1))).as("p"))
      .distinct()
  }

  /** Drop `covered` (doc_id, p) token positions from `docs` and reassemble
    * the surviving tokens in position order — the shared "apply" stage of
    * q61 and q87. Emits (doc_id, clean_text, n_tokens, n_removed). */
  private def scrubPositions(docs: DataFrame, covered: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val pos = docs.select($"doc_id", posexplode($"toks").as(Seq("p", "tok")))
    val kept = pos.join(covered, Seq("doc_id", "p"), "left_anti")
    val agg = kept.groupBy($"doc_id").agg(
      array_join(transform(sort_array(collect_list(struct($"p", $"tok"))),
        x => x.getField("tok")), " ").as("clean_text"),
      count(lit(1)).as("n_kept"))
    docs.select($"doc_id", size($"toks").cast("long").as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"clean_text", lit("")).as("clean_text"),
        $"n_tokens",
        ($"n_tokens" - coalesce($"n_kept", lit(0L))).cast("long").as("n_removed"))
  }

  def q61BoilerplateScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NOT spread (r20, reverting r19): the first stage is tokenize feeding
    // window explodes + aggregations — the losing shape the r19 ablation
    // boundary drew (the first exchange already parallelizes everything
    // downstream); the driver's r19 ground truth measured the full-text
    // spread at 7.88 s vs 3.07 s without, 32 concurrent regex/alloc-heavy
    // tasks over shuffled megabyte text rows being GC-bound where the
    // single scan task was not
    val docs = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    scrubPositions(docs, coveredPositions(docs)).orderBy($"doc_id")
  }

  val q61Sql: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |win AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS i,
       |    list_aggregate(toks[CAST(u.i AS INT):CAST(u.i + 5 AS INT)],
       |                   'string_agg', ' ') AS g
       |  FROM t, UNNEST(range(1, len(toks) - 6 + 2)) AS u(i)),
       |freq AS (SELECT g FROM win GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
       |cov AS (SELECT DISTINCT w.doc_id, CAST(u.p AS BIGINT) AS p
       |        FROM win w JOIN freq USING (g), UNNEST(range(w.i, w.i + 6)) AS u(p)),
       |pos AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i, toks[CAST(u.i AS INT)] AS tok
       |        FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
       |kept AS (SELECT pos.doc_id, pos.i, pos.tok FROM pos
       |         WHERE NOT EXISTS (SELECT 1 FROM cov
       |                           WHERE cov.doc_id = pos.doc_id AND cov.p = pos.i)),
       |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
       |               count(*) AS n_kept
       |        FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
       |  CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  CAST(len(t.toks) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
       |FROM t LEFT JOIN agg USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q62

  /** q62_chunk_overlap — fixed-size token chunking with overlap (size 32,
    * stride 24 → 8 tokens shared between neighbors): the step every
    * embedding/RAG/context-window pipeline runs between cleaning and
    * encoding. Chunk k covers tokens [k·24, min(k·24+32, n)); every token
    * belongs to at least one chunk, the tail chunk may be short, empty
    * documents produce no chunks.
    *
    * Scale shape: pure narrow column work — sequence/transform/slice build
    * the chunk array per row, posexplode unnests it, and the q21-pattern
    * source sort makes the (doc_id, chunk_idx) output order free. No
    * shuffle at all; at 100 TB this runs at scan speed and its output
    * feeds q55's shard packer. */
  def q62ChunkOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val C = 32
    val S = 24
    Tables.documents(s, dir).orderBy($"doc_id")
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .filter(size($"toks") > 0)
      .select($"doc_id", posexplode(
        transform(sequence(lit(0), floor((size($"toks") - 1) / S).cast("int")),
          k => slice($"toks", k * S + 1, lit(C)))).as(Seq("chunk_idx", "ctoks")))
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        size($"ctoks").cast("long").as("n_chunk_tokens"),
        array_join($"ctoks", " ").as("chunk_text"))
  }

  val q62Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, toks, len(toks) AS n
       |  FROM (SELECT doc_id, $Toks AS toks FROM documents)
       |  WHERE len(toks) > 0),
       |chunks AS (
       |  SELECT doc_id, CAST(u.k AS BIGINT) AS chunk_idx,
       |    toks[CAST(u.k * 24 + 1 AS INT):CAST(least(u.k * 24 + 32, n) AS INT)] AS ctoks
       |  FROM t, UNNEST(range(0, (n - 1) // 24 + 1)) AS u(k))
       |SELECT doc_id, chunk_idx, CAST(len(ctoks) AS BIGINT) AS n_chunk_tokens,
       |  list_aggregate(ctoks, 'string_agg', ' ') AS chunk_text
       |FROM chunks
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q63

  /** q63_decontaminate — benchmark decontamination by token n-gram overlap
    * (the GPT-3 appendix-C / PaLM recipe: drop or flag any training
    * document sharing a long n-gram with the eval suite). The eval set
    * here is the deterministic `doc_id % 41 = 0` slice standing in for a
    * held-out benchmark; every OTHER document is scored by how many of its
    * distinct 3-gram windows appear anywhere in the eval set. Production
    * uses 8–13-gram windows; this corpus's ~40-word synthetic vocabulary
    * makes 3-grams play the same role (5-grams collide zero times at
    * sf0.01), and the width is the one dial.
    *
    * Scale shape: the eval suite is FIXED-SIZE — MMLU+HELM+… is a few
    * million grams no matter how big the training corpus grows — so its
    * distinct-gram set is the textbook broadcast side: build once
    * (distinct = one small shuffle over eval grams only), broadcast, and
    * the training side is ONE scan — explode_outer the (already-distinct)
    * grams, mark hits against the broadcast set, and aggregate count and
    * overlap together per doc_id (explode_outer keeps gram-less docs as a
    * null row, so no second scan is needed to restore them). No
    * corpus-sized shuffle touches the gram strings. The per-doc count
    * uses DISTINCT grams (q21's shingle convention) so a doc repeating one
    * leaked gram five times scores 1, not 5. */
  def q63Decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.shingles(TextFunctions.tokens($"text"), 3).as("gs"))
    val evalGrams = docs.filter($"doc_id" % 41 === 0)
      .select(explode($"gs").as("g")).distinct()
    docs.filter($"doc_id" % 41 =!= 0)
      .select($"doc_id", explode_outer($"gs").as("g"))
      .join(broadcast(evalGrams.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(count($"g").as("n_grams"), count($"hit").as("n_overlap"))
      .select($"doc_id", $"n_grams", $"n_overlap",
        ($"n_overlap" >= 2).cast("long").as("contaminated"))
      .orderBy($"doc_id")
  }

  val q63Sql: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |g AS (SELECT doc_id, $Shingles3 AS gs FROM t),
       |ev AS (SELECT DISTINCT u.g AS g FROM g, UNNEST(g.gs) AS u(g)
       |       WHERE doc_id % 41 = 0),
       |hit AS (SELECT tr.doc_id, count(*) AS n_overlap
       |        FROM (SELECT doc_id, u.g AS g FROM g, UNNEST(g.gs) AS u(g)
       |              WHERE doc_id % 41 <> 0) tr
       |        JOIN ev USING (g) GROUP BY 1)
       |SELECT g.doc_id, CAST(len(g.gs) AS BIGINT) AS n_grams,
       |  coalesce(hit.n_overlap, 0) AS n_overlap,
       |  CAST(coalesce(hit.n_overlap, 0) >= 2 AS BIGINT) AS contaminated
       |FROM g LEFT JOIN hit USING (doc_id)
       |WHERE g.doc_id % 41 <> 0
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q65

  /** q65_cdc_chunk — CONTENT-DEFINED chunking: a chunk boundary falls
    * after token i exactly when the hash of the 3-token window ending at i
    * lands below a threshold (first md5 hex byte < '20' → P=1/8, mean
    * chunk ≈ 8 tokens). Complements q62's fixed-size chunking the same way
    * rsync/LBFS/restic chunking complements fixed blocks: boundaries
    * depend only on LOCAL content, so inserting a token reshapes chunking
    * near the edit and nowhere else, and identical passages produce
    * identical chunks (same `chunk_hash`) at ANY offset in any document —
    * which is what makes chunk-level dedup/caching work. Production CDC
    * rolls a Rabin hash over bytes; the window-hash over tokens keeps the
    * decision rule and locality property while staying oracle-replayable.
    *
    * Scale shape: boundary positions, chunk spans (zip_with over
    * starts/ends — O(chunks), not O(n²)) and the explode are all narrow —
    * zero shuffle, q62's pattern, scan speed at 100 TB. The per-position
    * md5 runs interpreted inside the HOF lambda; the upgrade path at real
    * scale is a graft_cdc_bounds native expression (the graft_winnow
    * rolling-hash loop with a different emit rule). */
  def q65CdcChunk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).orderBy($"doc_id")
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .filter(size($"toks") > 0)
      .withColumn("n", size($"toks"))
    // boundary candidates i ∈ [3, n-1]: window (i-2, i-1, i); a boundary at
    // n would close an already-closing chunk, so it is excluded up front.
    // sequence(3, n-1) runs DESCENDING when n < 4 — guard explicitly.
    val bp = when($"n" < 4, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(3), $"n" - 1), i =>
        substring(md5(concat_ws(" ",
          element_at($"toks", i - 2), element_at($"toks", i - 1),
          element_at($"toks", i)).cast("binary")), 1, 2) < "20"))
    val withSpans = docs.withColumn("bp", bp)
      .withColumn("starts", concat(array(lit(1)), transform($"bp", p => p + 1)))
      .withColumn("ends", concat($"bp", array($"n")))
    withSpans
      .select($"doc_id", posexplode(
        zip_with($"starts", $"ends", (st, en) => slice($"toks", st, en - st + 1)))
        .as(Seq("chunk_idx", "ctoks")))
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        size($"ctoks").cast("long").as("n_chunk_tokens"),
        md5(array_join($"ctoks", " ").cast("binary")).as("chunk_hash"),
        array_join($"ctoks", " ").as("chunk_text"))
  }

  val q65Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, toks, len(toks) AS n
       |  FROM (SELECT doc_id, $Toks AS toks FROM documents)
       |  WHERE len(toks) > 0),
       |b AS (
       |  SELECT doc_id, toks, n,
       |    [i for i in range(3, n)
       |     if substr(md5(toks[i-2] || ' ' || toks[i-1] || ' ' || toks[i]), 1, 2) < '20'] AS bp
       |  FROM t),
       |ch AS (
       |  SELECT doc_id, CAST(u.k - 1 AS BIGINT) AS chunk_idx,
       |    toks[CAST(list_prepend(1, [p + 1 for p in bp])[u.k] AS INT)
       |         :CAST(list_append(bp, n)[u.k] AS INT)] AS ctoks
       |  FROM b, UNNEST(range(1, len(bp) + 2)) AS u(k))
       |SELECT doc_id, chunk_idx, CAST(len(ctoks) AS BIGINT) AS n_chunk_tokens,
       |  md5(list_aggregate(ctoks, 'string_agg', ' ')) AS chunk_hash,
       |  list_aggregate(ctoks, 'string_agg', ' ') AS chunk_text
       |FROM ch
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- q66

  /** q66_dsir_weights — DSIR-style importance weights (Xie et al. 2023,
    * arXiv:2302.03169 "Data Selection for Language Models via Importance
    * Resampling"): hash every token into one of 256 buckets, fit bag-of-
    * hashed-ngrams frequencies for the TARGET slice (here `lang = 'en'`,
    * standing in for "looks like the high-quality target distribution")
    * and the RAW corpus, and score each document by the sum of per-bucket
    * log-likelihood ratios over its token instances. Add-one smoothing
    * keeps empty buckets finite. Weights ship on the e6 integer grid so
    * the per-document sum is an exact long (summation-order-proof, the
    * Grid.scala convention); only the 256 per-bucket constants touch
    * floating point. Selection/resampling on the score is deliberately NOT
    * fused here — that is q43/q57's deterministic-sampling business.
    *
    * Scale shape: one narrow explode feeds a 256-key partial-aggregated
    * shuffle (map-side combine collapses it to 256×partitions rows); the
    * totals come from a single-partition window over those 256 rows —
    * constant-size regardless of corpus, NOT a corpus re-scan; the
    * per-bucket weight table is the textbook broadcast side (fixed 256
    * rows at any scale); the only other shuffle is the doc_id-keyed
    * re-aggregation. Nothing corpus-sized is ever broadcast or collected. */
  def q66DsirWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val tok = docs
      .select($"doc_id", $"lang", explode(TextFunctions.tokens($"text")).as("t"))
      .select($"doc_id", $"lang", substring(md5($"t".cast("binary")), 1, 2).as("b"))
    val bc = tok.groupBy($"b").agg(
      count(lit(1)).as("rc"),
      sum(when($"lang" === "en", 1L).otherwise(0L)).as("tc"))
    // 256 rows at ANY corpus size — a single-partition window is O(1)
    val all = Window.partitionBy(lit(1))
    val wt = bc.select($"b",
      floor(lit(1000000.0) * log(
        (($"tc" + 1.0) * (sum($"rc").over(all) + 256.0)) /
          (($"rc" + 1.0) * (sum($"tc").over(all) + 256.0)))).cast("long").as("w"))
    val dw = tok.join(broadcast(wt), Seq("b"))
      .groupBy($"doc_id").agg(sum($"w").as("weight_e6"))
    docs.select($"doc_id", $"lang",
        TextFunctions.tokenCount($"text").cast("long").as("n_tokens"))
      .join(dw, Seq("doc_id"), "left")
      .select($"doc_id", $"lang", $"n_tokens",
        coalesce($"weight_e6", lit(0L)).as("weight_e6"))
      .orderBy($"doc_id")
  }

  val q66Sql: String =
    s"""WITH t AS (SELECT doc_id, lang, $Toks AS toks FROM documents),
       |tok AS (SELECT doc_id, lang, substr(md5(u.t), 1, 2) AS b
       |        FROM t, UNNEST(t.toks) AS u(t)),
       |bc AS (SELECT b, count(*) AS rc,
       |         count(*) FILTER (WHERE lang = 'en') AS tc
       |       FROM tok GROUP BY 1),
       |tot AS (SELECT sum(rc) AS r_tot, sum(tc) AS t_tot FROM bc),
       |wt AS (SELECT b,
       |         CAST(floor(1000000.0 * ln(
       |           ((tc + 1.0) * (r_tot + 256.0)) /
       |           ((rc + 1.0) * (t_tot + 256.0)))) AS BIGINT) AS w
       |       FROM bc, tot),
       |dw AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS weight_e6
       |       FROM tok JOIN wt USING (b) GROUP BY 1)
       |SELECT t.doc_id, t.lang, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  coalesce(dw.weight_e6, 0) AS weight_e6
       |FROM t LEFT JOIN dw USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q68

  /** q68_bigram_ppl — language-model quality scoring (the CCNet/RedPajama
    * signal: rank documents by perplexity under a small LM): a bigram
    * model with add-one smoothing is fitted ON THE CORPUS ITSELF —
    * P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V) — and every document is scored by
    * its total and per-bigram negative log-likelihood. Production swaps
    * the in-corpus fit for frozen KenLM counts; the dataflow (fit counts,
    * join scores back, integer-grid sums) is identical. Per-bigram log
    * probabilities land on the e6 integer grid once, so document sums are
    * exact longs (Grid.scala convention) — only the model constants touch
    * floating point, and the −ll/n division runs in exact-double range.
    *
    * Scale shape: bigram instances are narrow zip_with column work; the
    * model fit is two keyed count shuffles (map-side combined); the
    * vocabulary size is the ONE 1-row broadcast (q37's rule: corpus-
    * derived model tables — c2 join, score join — SHUFFLE, because they
    * grow with the corpus; only O(1) scalars broadcast). The score join
    * shuffles doc bigrams by (w1,w2) once, then one doc_id-keyed agg. */
  def q68BigramPpl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val m = greatest(size($"toks") - 1, lit(0))
    val bg = docs.select($"doc_id", explode(
        zip_with(slice($"toks", lit(1), m), slice($"toks", lit(2), m),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val c2 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    // c1(w1) = Σ_w2 c2(w1,w2): derive it from the (vastly smaller) bigram-
    // TYPE table rather than re-exploding and re-shuffling every bigram
    // INSTANCE of the corpus a second time
    val c1 = c2.groupBy($"w1").agg(sum($"c2").as("c1"))
    val vocab = docs.select(explode($"toks").as("t"))
      .select(countDistinct($"t").as("vsz"))
    val model = c2.join(c1, "w1").crossJoin(broadcast(vocab))
      .select($"w1", $"w2",
        floor(lit(1000000.0) * log(($"c2" + 1.0) / ($"c1" + $"vsz")))
          .cast("long").as("lp_e6"))
    val dl = bg.join(model, Seq("w1", "w2"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_bigrams"), sum($"lp_e6").as("ll_e6"))
    docs.select($"doc_id")
      .join(dl, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        coalesce($"ll_e6", lit(0L)).as("ll_e6"),
        when($"n_bigrams".isNull, lit(null).cast("long"))
          .otherwise(floor((-$"ll_e6").cast("double") / $"n_bigrams").cast("long"))
          .as("nll_per_bigram_e6"))
      .orderBy($"doc_id")
  }

  /** Shared DuckDB CTE block ending in `ppl(doc_id, n_bigrams, ll_e6,
    * nll_per_bigram_e6)` — the bigram-LM scoring core of q68 and q79. */
  private val BigramPplCoreSql: String =
    s"""t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |bg AS (SELECT doc_id, toks[CAST(u.i AS INT)] AS w1,
       |         toks[CAST(u.i + 1 AS INT)] AS w2
       |       FROM t, UNNEST(range(1, len(toks))) AS u(i)),
       |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
       |v AS (SELECT count(DISTINCT u.t) AS vsz FROM t, UNNEST(t.toks) AS u(t)),
       |model AS (SELECT w1, w2,
       |    CAST(floor(1000000.0 * ln((c2 + 1.0) / (c1 + vsz))) AS BIGINT) AS lp_e6
       |  FROM c2 JOIN c1 USING (w1), v),
       |dl AS (SELECT doc_id, count(*) AS n_bigrams,
       |         CAST(sum(lp_e6) AS BIGINT) AS ll_e6
       |       FROM bg JOIN model USING (w1, w2) GROUP BY 1),
       |ppl AS (
       |  SELECT t.doc_id, coalesce(dl.n_bigrams, 0) AS n_bigrams,
       |    coalesce(dl.ll_e6, 0) AS ll_e6,
       |    CASE WHEN dl.n_bigrams IS NULL THEN NULL
       |         ELSE CAST(floor(CAST(-dl.ll_e6 AS DOUBLE) / dl.n_bigrams) AS BIGINT)
       |    END AS nll_per_bigram_e6
       |  FROM t LEFT JOIN dl USING (doc_id))"""
      .stripMargin

  val q68Sql: String =
    s"""WITH $BigramPplCoreSql
       |SELECT doc_id, n_bigrams, ll_e6, nll_per_bigram_e6
       |FROM ppl
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q70

  /** q70_fuzzy_match — edit-distance near-dup pairs with SimHash blocking:
    * candidate pairs come ONLY from equal 16-bit SimHash buckets (q27's
    * fingerprint — one 2-byte-key shuffle), and each candidate is verified
    * with character-level Levenshtein, keeping pairs whose relative edit
    * distance is ≤ 20% of the longer text. This is the classic fuzzy-dedup
    * two-phase shape — cheap blocking proposes, expensive exact distance
    * disposes — catching char-level corruption (OCR noise, encoding
    * damage) that token-set operators (q24/q52) see as unrelated tokens.
    *
    * Scale shape: cost is Σ bucket² candidate pairs (never N²) × O(len²)
    * per verify; at 100 TB you widen the fingerprint (more bits → smaller
    * buckets) and cap verified length — the latter is a SHIPPED dial,
    * `verifyPrefixChars` on [[q70FuzzyMatchWith]]: with `Some(c)` the
    * Levenshtein runs on the first `c` characters of each side and the
    * 20% gate divides by `least(max_len, c)`, making the per-pair verify
    * O(c²) instead of O(len²) — the ×10 wall ratio then tracks pair
    * count, not pair count × text-length². Recall vs the uncapped sf0.01
    * ground truth (Q70PrefixCapSpec measures it each run): caps 256/128/64
    * all score recall 1.00 AND precision 1.00 (16/16 pairs) — near-dup
    * pairs that survive SimHash blocking agree on their prefixes long
    * before 64 chars, so the cap you'd run at 100 TB (≳256) is measured
    * lossless at gate scale. Fingerprint blocks are SKEWED (boilerplate
    * content piles into a few buckets — at sf0.1 the two hottest hold a
    * quarter of all pairs), and unlike a join, the verify's cost rides the
    * pair ROWS, so AQE skew-join cannot rebalance it: the pairs are
    * round-robin REPARTITIONED before the distance pass, and a
    * localCheckpoint (q52's pattern) pins the expensive levenshtein to
    * exactly one evaluation AFTER the balance — otherwise predicate
    * pushdown re-inlines it into a pre-shuffle filter and the hottest
    * bucket's task runs the whole verify alone (measured 105 s/run at
    * sf0.1; 3 s balanced). A cheap |len_a−len_b| pre-gate (length
    * difference lower-bounds edit distance) prunes hopeless pairs before
    * they shuffle.
    *
    * The gate compares `lev·1e6 ≤ 2e5·max_len` in pure integer
    * arithmetic; the exported ratio uses integer DIV — no float rounding
    * anywhere, so the oracle replays bit-for-bit. Two empty documents are
    * excluded (max_len 0): byte-identical texts are q23 exact-dedup's
    * business, not fuzzy matching's.
    *
    * THE DEFAULT IS THE SCALE-SAFE SETTING: cap=256, certified lossless
    * on this corpus (recall = precision = 1.00, Q70PrefixCapSpec) — the
    * uncapped O(len²) verify stays available and gated as
    * [[q70Uncapped]]/`q70_uncapped`, but a caller who just runs the
    * operator gets the plan that survives 100×, not the one that is
    * 15× superlinear at ×10. */
  def q70FuzzyMatch(s: SparkSession, dir: String): DataFrame =
    q70FuzzyMatchWith(s, dir, verifyPrefixChars = Some(256))

  /** q70's UNCAPPED verify under its own gate entry (`q70_uncapped`):
    * full-text Levenshtein, O(len²) per candidate pair — the exact
    * semantics when no length cap is acceptable (forensic dedup, short
    * corpora). Deliberately NOT the default: its ×10 wall ratio tracks
    * pair count × text-length² by construction. */
  def q70Uncapped(s: SparkSession, dir: String): DataFrame =
    q70FuzzyMatchWith(s, dir, verifyPrefixChars = None)

  /** q70 with the verified-length dial exposed. `verifyPrefixChars = None`
    * is the oracle-gated default (full-text Levenshtein); `Some(c)` verifies
    * the first `c` characters of each side and gates on
    * `lev·1e6 ≤ 2e5·least(max_len, c)` — same integer arithmetic, O(c²)
    * per pair. Output schema is identical in both modes; `max_len` in the
    * export stays the FULL length so downstream consumers see the same
    * column meaning regardless of the dial. */
  def q70FuzzyMatchWith(s: SparkSession, dir: String,
                        verifyPrefixChars: Option[Int]): DataFrame = {
    import s.implicits._
    val (va, vb, effLen) = verifyPrefixChars match {
      case Some(c) =>
        require(c > 0, s"verifyPrefixChars must be positive, got $c")
        (substring($"text_a", 1, c), substring($"text_b", 1, c),
          least($"max_len", lit(c.toLong)))
      case None => ($"text_a", $"text_b", $"max_len")
    }
    // LAZY localCheckpoint: the LogicalRDD barrier (what actually stops
    // predicate pushdown from re-inlining the levenshtein before the
    // balance) exists either way, but eager=false defers execution to the
    // first action — merely BUILDING or plan-inspecting this query costs
    // nothing. Local checkpoint blocks are lost on executor failure; at
    // cluster scale swap for persist(DISK_ONLY) or a reliable checkpoint
    // if the verify stage must survive executor churn.
    val verified = fuzzyCandidates(s, dir)
      .select($"doc_a", $"doc_b", $"simhash",
        levenshtein(va, vb).cast("long").as("lev"),
        effLen.as("eff_len"), $"max_len")
      .localCheckpoint(false)
    verified
      .filter($"lev" * 1000000L <= $"eff_len" * 200000L)
      .select($"doc_a", $"doc_b", $"simhash", $"lev",
        expr("(lev * 1000000) DIV eff_len").as("rel_e6"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** q70's candidate stage, balanced and ready for the distance verify —
    * factored out so PlanSpec can audit the join shape (the public query
    * checkpoints right after the verify, which cuts the executed plan). */
  private[graft] def fuzzyCandidates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, dir).select($"doc_id", $"text",
      length($"text").cast("long").as("lt"),
      DedupFunctions.simhash(TextFunctions.tokens($"text")).as("sh"))
    sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("simhash"), col("a.text").as("text_a"), col("b.text").as("text_b"),
        greatest(col("a.lt"), col("b.lt")).as("max_len"),
        abs(col("a.lt") - col("b.lt")).as("len_diff"))
      .filter($"max_len" > 0 && $"len_diff" * 1000000L <= $"max_len" * 200000L)
      .repartition(s.sessionState.conf.numShufflePartitions)
      .select($"doc_a", $"doc_b", $"simhash", $"text_a", $"text_b", $"max_len")
  }

  /** The capped-verify oracle at a given prefix cap — q70's default (256)
    * and q100's dial setting (128) share it. */
  private def fuzzyCappedSql(cap: Int): String =
    s"""WITH s AS (
       |  SELECT doc_id, text, CAST($simhashBitsSql AS BIGINT) AS sh
       |  FROM (SELECT doc_id, text, list_transform($Toks, t -> md5(t)) AS hs
       |        FROM documents)),
       |prs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS simhash,
       |    CAST(levenshtein(substr(a.text, 1, $cap), substr(b.text, 1, $cap)) AS BIGINT) AS lev,
       |    CAST(least(greatest(len(a.text), len(b.text)), $cap) AS BIGINT) AS eff_len,
       |    CAST(greatest(len(a.text), len(b.text)) AS BIGINT) AS max_len
       |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, simhash, lev, lev * 1000000 // eff_len AS rel_e6
       |FROM prs
       |WHERE max_len > 0 AND lev * 1000000 <= eff_len * 200000
       |ORDER BY doc_a, doc_b""".stripMargin

  val q70Sql: String = fuzzyCappedSql(256)

  val q70UncappedSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, text, CAST($simhashBitsSql AS BIGINT) AS sh
       |  FROM (SELECT doc_id, text, list_transform($Toks, t -> md5(t)) AS hs
       |        FROM documents)),
       |prs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS simhash,
       |    CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
       |    CAST(greatest(len(a.text), len(b.text)) AS BIGINT) AS max_len
       |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, simhash, lev, lev * 1000000 // max_len AS rel_e6
       |FROM prs
       |WHERE max_len > 0 AND lev * 1000000 <= max_len * 200000
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q71

  /** q71_token_histogram — corpus distribution telemetry: a fixed-width
    * histogram of document token counts per language (`width_bucket` into
    * 20 bins over [0, 200), plus the overflow bin), with per-bin share on
    * the e6 grid. Every serious pipeline watches its length/quality
    * distributions drift batch-over-batch; FIXED-width bins are the
    * at-scale histogram shape — bucket assignment is a narrow codegen'd
    * expression and the aggregation is an ordinary (lang, bin) partial-agg
    * shuffle of ≤ |langs|·22 groups, where quantile binning (NTILE) would
    * need a per-stratum global sort. Quantile TELEMETRY at scale comes
    * from q45's sketches; exact quantiles from q39 — this is the
    * complementary fixed-grid view whose bins are comparable across runs
    * precisely because they do not depend on the data. */
  def q71TokenHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = Window.partitionBy($"lang") // ≤ |langs| rows per partition after agg
    Tables.documents(s, dir)
      .select($"lang",
        width_bucket(TextFunctions.tokenCount($"text").cast("double"),
          lit(0.0), lit(200.0), lit(20)).as("bin"))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share_e6",
        floor($"n_docs" * lit(1000000.0) / sum($"n_docs").over(all)).cast("long"))
      .orderBy($"lang", $"bin")
  }

  /** q71 oracle: this DuckDB build has no `width_bucket`, so the oracle
    * replays its exact semantics arithmetically — bucket i covers
    * [min + (i−1)·w, min + i·w), values ≥ max land in the overflow bin
    * numBuckets+1 (token counts are never below min = 0). */
  val q71Sql: String =
    s"""WITH b AS (
       |  SELECT lang,
       |    CASE WHEN CAST(len($Toks) AS DOUBLE) >= 200.0 THEN 21
       |         ELSE CAST(floor(CAST(len($Toks) AS DOUBLE) / 10.0) AS BIGINT) + 1
       |    END AS bin
       |  FROM documents),
       |g AS (SELECT lang, bin, count(*) AS n_docs FROM b GROUP BY 1, 2)
       |SELECT lang, bin, n_docs,
       |  CAST(floor(n_docs * 1000000.0 / sum(n_docs) OVER (PARTITION BY lang))
       |       AS BIGINT) AS share_e6
       |FROM g
       |ORDER BY lang, bin""".stripMargin

  // ---------------------------------------------------------------- q72

  /** q72_repeat_spans — the VARIABLE-LENGTH inventory of cross-document
    * repetition (the output shape of Lee et al. 2022's suffix-array dedup,
    * bounded to repeats ≥ [[RepeatW]]): q61 DROPS the token positions
    * covered by any 6-token window repeated across documents; this query
    * publishes, per document, the MAXIMAL contiguous runs of those
    * positions. A repeated region of true length L ≥ W covers exactly its
    * L consecutive positions with fixed-width hits, so fusing covered
    * positions into islands recovers each region's full variable extent
    * (`span_len`) — overlapping and adjacent windows merge into one span.
    * This is the span-level record a curation stack cuts by (Lee et al.
    * remove the repeated BYTES, not the documents); q61's scrub is the
    * "apply" of this query's "plan".
    *
    * Scale shape: shares [[coveredPositions]] (one fingerprint-keyed
    * count-distinct shuffle + semi-join, 16-byte keys); the islands pass
    * adds one doc_id-keyed window — gaps-and-islands via p − row_number,
    * partition-bounded by a document's own covered positions, no pair
    * blowup anywhere. `span_start`/`span_end` are 0-based token offsets
    * (inclusive). */
  def q72RepeatSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread the scan: tokenization (and the fingerprint mining above it)
    // fuses into the single-task 1-row-group scan stage otherwise
    // (Tables.spread scaladoc; no-op on production layouts)
    val docs = Tables.spread(Tables.documents(s, dir)
        .select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val byPos = Window.partitionBy($"doc_id").orderBy($"p")
    coveredPositions(docs)
      .withColumn("grp", $"p" - row_number().over(byPos))
      .groupBy($"doc_id", $"grp")
      .agg(min($"p").cast("long").as("span_start"),
        max($"p").cast("long").as("span_end"),
        count(lit(1)).as("span_len"))
      .select($"doc_id", $"span_start", $"span_end", $"span_len")
      .orderBy($"doc_id", $"span_start")
  }

  /** q72 oracle: q61's window-mining CTEs (string semantics — a Spark-side
    * fingerprint collision would fail this gate), 0-based positions, then
    * textbook gaps-and-islands. */
  val q72Sql: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |win AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS i,
       |    list_aggregate(toks[CAST(u.i AS INT):CAST(u.i + 5 AS INT)],
       |                   'string_agg', ' ') AS g
       |  FROM t, UNNEST(range(1, len(toks) - 6 + 2)) AS u(i)),
       |freq AS (SELECT g FROM win GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
       |cov AS (SELECT DISTINCT w.doc_id, CAST(u.p AS BIGINT) - 1 AS p
       |        FROM win w JOIN freq USING (g), UNNEST(range(w.i, w.i + 6)) AS u(p)),
       |isl AS (SELECT doc_id, p,
       |          p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |        FROM cov)
       |SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
       |  CAST(max(p) AS BIGINT) AS span_end, CAST(count(*) AS BIGINT) AS span_len
       |FROM isl GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin

  // ---------------------------------------------------------------- q87

  /** q87_span_scrub — the maximal-span deduplication scrub that unifies
    * q61 and q72 into Lee et al. 2022's ACTUAL output: remove every
    * repeated span from the corpus BUT KEEP ONE CANONICAL COPY. q61 drops
    * all occurrences of cross-document repeats (no surviving copy — a
    * boilerplate filter); q72 only inventories the spans; this query
    * applies the inventory with the keep-one rule — a repeated gram's
    * occurrence in its CANONICAL document (the lowest doc_id containing
    * it, the suite's standard min-id canonical rule, q23/q47) keeps its
    * positions, and only the other documents' copies are scrubbed. The
    * removed regions are exactly q72's maximal spans restricted to
    * non-canonical documents: overlapping/adjacent window hits fuse into
    * variable-length runs during reassembly, and `n_spans` (gaps-and-
    * islands over the removal set) reports how many maximal spans were cut
    * from each document — the span-based reassembly, DuckDB-replayed.
    *
    * Scale shape: identical to q61's — the mining core is SHARED
    * ([[repeatedWindows]]: one 128-bit-fingerprint count-distinct shuffle;
    * the canonical doc is a `min` riding the same aggregation for free),
    * the keep-one filter is a row predicate on the semi-join, and the
    * reassembly adds one doc_id-keyed window for span counting. Canonical
    * choice is deterministic (min doc_id), so reruns are stable — the
    * property a curation pass needs to be idempotent. */
  def q87SpanScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread the scan: tokenization (and the fingerprint mining above it)
    // fuses into the single-task 1-row-group scan stage otherwise
    // (Tables.spread scaladoc; no-op on production layouts)
    val docs = Tables.spread(Tables.documents(s, dir)
        .select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val removed = nonCanonicalCovered(docs)
    val byPos = Window.partitionBy($"doc_id").orderBy($"p")
    val spans = removed
      .withColumn("grp", $"p" - row_number().over(byPos))
      .groupBy($"doc_id").agg(countDistinct($"grp").as("n_spans"))
    scrubPositions(docs, removed)
      .join(spans, Seq("doc_id"), "left")
      .select($"doc_id", $"clean_text", $"n_tokens", $"n_removed",
        coalesce($"n_spans", lit(0L)).as("n_spans"))
      .orderBy($"doc_id")
  }

  /** q87 oracle: q61's mining CTEs with the canonical-doc min riding the
    * frequent-gram aggregation (string semantics — a fingerprint collision
    * on the Spark side would fail this gate), the keep-one filter, then
    * q61's reassembly plus the q72 islands count over the removal set. */
  val q87Sql: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |win AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS i,
       |    list_aggregate(toks[CAST(u.i AS INT):CAST(u.i + 5 AS INT)],
       |                   'string_agg', ' ') AS g
       |  FROM t, UNNEST(range(1, len(toks) - 6 + 2)) AS u(i)),
       |freq AS (SELECT g, min(doc_id) AS canon_doc FROM win
       |         GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
       |cov AS (SELECT DISTINCT w.doc_id, CAST(u.p AS BIGINT) AS p
       |        FROM win w JOIN freq USING (g),
       |             UNNEST(range(w.i, w.i + 6)) AS u(p)
       |        WHERE w.doc_id <> freq.canon_doc),
       |isl AS (SELECT doc_id, p,
       |          p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |        FROM cov),
       |sp AS (SELECT doc_id, count(DISTINCT grp) AS n_spans FROM isl GROUP BY doc_id),
       |pos AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i, toks[CAST(u.i AS INT)] AS tok
       |        FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
       |kept AS (SELECT pos.doc_id, pos.i, pos.tok FROM pos
       |         WHERE NOT EXISTS (SELECT 1 FROM cov
       |                           WHERE cov.doc_id = pos.doc_id AND cov.p = pos.i)),
       |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
       |               count(*) AS n_kept
       |        FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
       |  CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  CAST(len(t.toks) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed,
       |  CAST(coalesce(sp.n_spans, 0) AS BIGINT) AS n_spans
       |FROM t LEFT JOIN agg USING (doc_id) LEFT JOIN sp USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q73

  /** q73_bm25 — ranked lexical retrieval: Okapi BM25 (k1 = 1.2, b = 0.75,
    * the Robertson/Lucene idf ln(1 + (N−df+0.5)/(df+0.5))) scores a fixed
    * query workload against the corpus; top-10 documents per query. This
    * is the lexical half of a retrieval stack (embedding ANN — q25/q30/
    * q54/q67 — is the other half): RAG context fetch and targeted
    * training-mix selection both start from exactly this operator.
    *
    * Engine-determinism: each (term, doc) contribution is ONE double
    * expression floored onto the e6 grid (q68's convention), written with
    * identical literals and associativity on both engines; per-(query,doc)
    * totals are then exact integer sums (order-free), and ranking is the
    * integer score with doc_id tie-break. avgdl is sum(dl)/N of exact
    * longs — not avg(), whose partial-aggregation order is engine-private.
    *
    * Scale shape: the query workload is FIXED-SIZE (the q63 eval-set
    * rule), so its distinct terms prune the token explosion AT THE SCAN
    * (broadcast semi-join); tf is one (doc,term)-keyed count shuffle over
    * the matching sliver only; df is O(|terms|) rows and N/avgdl one
    * scalar row — all broadcast back; top-k is one window over
    * |queries| × |matching docs| scored rows. No corpus-sized shuffle
    * carries tokens, and the full-corpus pass is one narrow length agg. */
  /** The fixed retrieval workload shared by q73 (BM25) and q74 (hybrid
    * fusion): four queries of three corpus-vocabulary terms each. */
  private val RetrievalWorkload: Seq[(Long, String)] = Seq(
    (1L, "hash"), (1L, "join"), (1L, "table"),
    (2L, "stream"), (2L, "window"), (2L, "batch"),
    (3L, "vector"), (3L, "scan"), (3L, "filter"),
    (4L, "merge"), (4L, "sort"), (4L, "order"))

  /** (query_id, doc_id, score_e6): the BM25 scoring core — see
    * [[q73Bm25]]'s scaladoc for formula, determinism and scale shape. */
  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val queries = RetrievalWorkload.toDF("query_id", "term")
    // spread the scan: tokenization (and the fingerprint mining above it)
    // fuses into the single-task 1-row-group scan stage otherwise
    // (Tables.spread scaladoc; no-op on production layouts)
    val docs = Tables.spread(Tables.documents(s, dir)
        .select($"doc_id", $"text"), $"doc_id")
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val dl = docs.select($"doc_id", size($"toks").cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum($"dl").cast("double") / count(lit(1))).as("avgdl")) // exact longs, one division
    val tf = docs.select($"doc_id", explode($"toks").as("t"))
      .join(broadcast(queries.select($"term".as("t")).distinct()), "t")
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy($"t").agg(countDistinct($"doc_id").as("df"))
    val contrib = tf
      .join(broadcast(dft), "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"t", $"doc_id",
        floor(lit(1000000.0) *
          log(lit(1.0) + ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))) *
          ($"tf" * lit(2.2)) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl")))
          .cast("long").as("c_e6"))
    contrib
      .join(broadcast(queries.withColumnRenamed("term", "t")), "t")
      .groupBy($"query_id", $"doc_id").agg(sum($"c_e6").as("score_e6"))
  }

  def q73Bm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byScore = Window.partitionBy($"query_id").orderBy($"score_e6".desc, $"doc_id")
    bm25Scored(s, dir)
      .withColumn("rank", row_number().over(byScore).cast("long"))
      .filter($"rank" <= 10)
      .select($"query_id", $"rank", $"doc_id", $"score_e6")
      .orderBy($"query_id", $"rank")
  }

  /** q73 oracle: identical formula text (same literals, same
    * associativity) so both engines floor the same doubles; the only
    * cross-library call is ln(), whose ≤1-ulp drift the e6 floor absorbs
    * (the proven q68 pattern). */
  /** Shared DuckDB CTE block ending in `scored(query_id, doc_id, score_e6)`
    * — the BM25 half of q73 and q74. */
  private val Bm25CoreSql: String =
    s"""q(query_id, term) AS (VALUES
       |    (1, 'hash'), (1, 'join'), (1, 'table'),
       |    (2, 'stream'), (2, 'window'), (2, 'batch'),
       |    (3, 'vector'), (3, 'scan'), (3, 'filter'),
       |    (4, 'merge'), (4, 'sort'), (4, 'order')),
       |t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
       |stats AS (SELECT count(*) AS n_docs,
       |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tok AS (SELECT doc_id, u.t AS t FROM t, UNNEST(t.toks) AS u(t)
       |        WHERE u.t IN (SELECT DISTINCT term FROM q)),
       |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT t, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
       |contrib AS (
       |  SELECT tf.t, tf.doc_id,
       |    CAST(floor(1000000.0 *
       |      ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) *
       |      (tf.tf * 2.2) /
       |      (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS BIGINT) AS c_e6
       |  FROM tf JOIN df USING (t) JOIN dl USING (doc_id), stats),
       |scored AS (
       |  SELECT CAST(q.query_id AS BIGINT) AS query_id, c.doc_id,
       |    CAST(sum(c.c_e6) AS BIGINT) AS score_e6
       |  FROM q JOIN contrib c ON q.term = c.t GROUP BY 1, 2)""".stripMargin

  val q73Sql: String =
    s"""WITH $Bm25CoreSql
       |SELECT query_id, rank, doc_id, score_e6
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY score_e6 DESC, doc_id) AS rank FROM scored) z
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q74

  /** q74_hybrid_rrf — hybrid retrieval: the q73 BM25 ranking and a dense
    * cosine ranking (query embeddings 1–4 standing for the encoded
    * queries, the q25 brute-force shape) fused by Reciprocal Rank Fusion
    * (Cormack et al. 2009): rrf(d) = Σ_lists 1/(60 + rank_list(d)) over
    * each list's top-50, top-10 fused results per query. This is the
    * standard production retrieval stack — lexical and dense recall sets
    * overlap poorly, and RRF is the parameter-free fusion that needs no
    * score calibration between the two (only RANKS cross the boundary).
    *
    * Engine-determinism: RRF here is PURE INTEGER arithmetic — each
    * contribution is 1000000 div (60 + rank), ranks come from the two
    * retrievers' own deterministic orderings (integer BM25 grid; q25's
    * round-then-rank cosine convention) — so fusion involves no floats at
    * all and the oracle replays it exactly.
    *
    * Scale shape: both retrievers are already scale-shaped (q73: term-
    * pruned scan + broadcasts; q25: k queries broadcast against one
    * embedding scan); their outputs are top-K per query — FIXED-SIZE
    * lists, so the full-outer fusion join and the final window cost
    * O(|queries|·K) regardless of corpus size. At 100 TB the dense half
    * swaps brute force for q30's IVF probe; the fusion is unchanged. */
  def q74HybridRrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
    val K = 50
    val byScore = Window.partitionBy($"query_id").orderBy($"score_e6".desc, $"doc_id")
    val bm = bm25Scored(s, dir)
      .withColumn("bm_rank", row_number().over(byScore).cast("long"))
      .filter($"bm_rank" <= K)
      .select($"query_id", $"doc_id", $"bm_rank")
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .select($"vec_id", $"v", sqrt(dot($"v", $"v")).as("nrm"))
    val dq = e.filter($"vec_id".between(1, 4))
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val byCos = Window.partitionBy($"query_id").orderBy($"cos_r".desc, $"doc_id")
    val dn = e.join(broadcast(dq), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("doc_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_r"))
      .withColumn("dn_rank", row_number().over(byCos).cast("long"))
      .filter($"dn_rank" <= K)
      .select($"query_id", $"doc_id", $"dn_rank")
    def rrf(rank: Column): Column =
      coalesce(call_function("div", lit(1000000L), lit(60L) + rank), lit(0L))
    val byRrf = Window.partitionBy($"query_id").orderBy($"rrf_e6".desc, $"doc_id")
    bm.join(dn, Seq("query_id", "doc_id"), "full_outer")
      .select($"query_id", $"doc_id", $"bm_rank", $"dn_rank",
        (rrf($"bm_rank") + rrf($"dn_rank")).as("rrf_e6"))
      .withColumn("rank", row_number().over(byRrf).cast("long"))
      .filter($"rank" <= 10)
      .select($"query_id", $"rank", $"doc_id", $"rrf_e6", $"bm_rank", $"dn_rank")
      .orderBy($"query_id", $"rank")
  }

  /** q74 oracle: BM25 core CTEs + the q25-convention dense ranking + the
    * same integer RRF. */
  val q74Sql: String =
    s"""WITH $Bm25CoreSql,
       |bmr AS (
       |  SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS bm_rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY score_e6 DESC, doc_id) AS rnk FROM scored) z
       |  WHERE rnk <= 50),
       |e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
       |dprs AS (
       |  SELECT dq.vec_id AS query_id, n.vec_id AS doc_id,
       |    round(list_sum([dq.v[i] * n.v[i] for i in range(1, len(dq.v)+1)])
       |      / (sqrt(list_sum([x*x for x in dq.v])) * sqrt(list_sum([x*x for x in n.v]))), 4)
       |      AS cos_r
       |  FROM e dq JOIN e n ON dq.vec_id BETWEEN 1 AND 4 AND n.vec_id <> dq.vec_id),
       |dn AS (
       |  SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS dn_rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos_r DESC, doc_id) AS rnk FROM dprs) z
       |  WHERE rnk <= 50),
       |fused AS (
       |  SELECT coalesce(b.query_id, d.query_id) AS query_id,
       |    coalesce(b.doc_id, d.doc_id) AS doc_id, b.bm_rank, d.dn_rank,
       |    coalesce(1000000 // (60 + b.bm_rank), 0)
       |      + coalesce(1000000 // (60 + d.dn_rank), 0) AS rrf_e6
       |  FROM bmr b FULL OUTER JOIN dn d
       |    ON b.query_id = d.query_id AND b.doc_id = d.doc_id)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       |  CAST(rrf_e6 AS BIGINT) AS rrf_e6, bm_rank, dn_rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY rrf_e6 DESC, doc_id) AS rnk FROM fused) z
       |WHERE rnk <= 10
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q75

  /** q75_quality_model — LEARNED quality scoring with a frozen linear
    * model: a logistic classifier over cheap text features (saturated
    * length, stopword ratio, type-token ratio, mean token length), the
    * fasttext/DCLM/FineWeb-edu deployment shape — weights are trained
    * OFFLINE and shipped to the scan as literal constants; the pipeline
    * only ever evaluates. Complements q35's hand-rule gates: rules encode
    * policy floors, the model encodes a ranking score you can threshold
    * per mixture (here keep = score ≥ 0.5).
    *
    * Engine-determinism: every feature is a ratio of exact integers
    * (IEEE754 division agrees bit-for-bit across engines); the one
    * transcendental, exp() in the sigmoid, differs by ≤1 ulp and the e6
    * floor absorbs it (q68's convention). Formula text and associativity
    * are identical on both sides.
    *
    * Scale shape: pure narrow column algebra at scan speed — no shuffle
    * except the output sort, no model table at all (the weights live in
    * the instruction stream, the ideal broadcast). Zero-token documents
    * are excluded (features undefined), documented like q70's empty-doc
    * rule. */
  def q75QualityModel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    qualityScored(s, dir)
      .select($"doc_id", $"n_tokens", $"score_e6")
      .withColumn("keep", ($"score_e6" >= 500000L).cast("long"))
      .orderBy($"doc_id")
  }

  /** q75's frozen-weights scoring with `lang` carried through — shared
    * verbatim by q75 (model scores) and q106 (per-source caps), so the
    * score semantics are certified once. */
  private def qualityScored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"text", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", $"lang", size($"toks").cast("long").as("n_tokens"),
        stopRatioE6(col("toks")).as("stop_e6"),
        size(array_distinct($"toks")).cast("double").as("nd"),
        length($"text").cast("double").as("nc"))
      .filter($"n_tokens" >= 1)
      .select($"doc_id", $"lang", $"n_tokens",
        (lit(-3.0) +
          lit(2.0) * (least($"n_tokens", lit(400L)).cast("double") / lit(400.0)) +
          lit(4.0) * ($"stop_e6".cast("double") / lit(1000000.0)) +
          lit(2.0) * ($"nd" / $"n_tokens") +
          lit(1.0) * ($"nc" / $"n_tokens" / lit(10.0))).as("z"))
      .select($"doc_id", $"lang", $"n_tokens",
        floor(lit(1000000.0) / (lit(1.0) + exp(-$"z"))).cast("long").as("score_e6"))
  }

  /** q75 oracle: identical feature ratios and sigmoid text; exp()'s ulp
    * drift is absorbed by the e6 floor. */
  val q75Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    $StopRatioSql AS stop_e6,
       |    CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
       |    CAST(len(text) AS DOUBLE) AS nc
       |  FROM (SELECT doc_id, text, $Toks AS toks FROM documents)
       |  WHERE len(toks) >= 1),
       |z AS (
       |  SELECT doc_id, n_tokens,
       |    -3.0 +
       |    2.0 * (CAST(least(n_tokens, 400) AS DOUBLE) / 400.0) +
       |    4.0 * (CAST(stop_e6 AS DOUBLE) / 1000000.0) +
       |    2.0 * (nd / n_tokens) +
       |    1.0 * (nc / n_tokens / 10.0) AS z
       |  FROM f)
       |SELECT doc_id, n_tokens,
       |  CAST(floor(1000000.0 / (1.0 + exp(-z))) AS BIGINT) AS score_e6,
       |  CAST(CASE WHEN floor(1000000.0 / (1.0 + exp(-z))) >= 500000
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM z
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q77

  /** q77_mixture_temperature — per-source sampling weights with
    * temperature (the mT5/PaLM multilingual mixing recipe: p_i ∝ n_i^α
    * with α = 0.7 — α < 1 upweights low-resource sources relative to
    * their raw token share; α = 1 is proportional sampling, α = 0
    * uniform). Output per source: doc/token counts, raw token share,
    * temperature share, and the relative boost a sampler applies —
    * exactly the table a mixture-configured training run consumes
    * (q57's quota sampler is the downstream that would enforce it).
    *
    * Engine-determinism: pow() is floored onto the e6 grid PER SOURCE
    * before any cross-source arithmetic, so both normalizing sums are
    * exact integer sums and every share is integer division — summation
    * order (engine-private in both systems) cannot move a digit; the one
    * float call's ≤1-ulp drift is absorbed by the floor (q68's
    * convention). The ×1e6 share scaling is exact while total corpus
    * tokens stay below ~9×10¹² (long range / 1e6); past that, pre-divide
    * the totals instead — same grid, one more div.
    *
    * Scale shape: ONE source-keyed count/sum aggregation over the corpus
    * (map-side combined) is the only data-sized work; everything after
    * happens on |sources| rows (thousands at most at 100 TB), where the
    * unpartitioned window sums are bounded by the source list, not the
    * data. */
  def q77MixtureTemperature(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val bySrc = Tables.documents(s, dir)
      .select($"source", TextFunctions.tokenCount($"text").cast("long").as("n"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
    val all = Window.partitionBy(lit(1)) // |sources| rows, bounded
    bySrc
      .withColumn("p_e6",
        floor(lit(1000000.0) * pow($"n_tokens".cast("double"), lit(0.7))).cast("long"))
      .withColumn("raw_share_e6", idiv($"n_tokens" * 1000000L, sum($"n_tokens").over(all)))
      .withColumn("temp_share_e6", idiv($"p_e6" * 1000000L, sum($"p_e6").over(all)))
      .select($"source", $"n_docs", $"n_tokens", $"raw_share_e6", $"temp_share_e6",
        when($"raw_share_e6" === 0L, lit(null).cast("long"))
          .otherwise(idiv($"temp_share_e6" * 1000000L, $"raw_share_e6")).as("boost_e6"))
      .orderBy($"source")
  }

  /** q77 oracle: identical per-source e6 floor before the integer
    * normalization (DuckDB's HUGEINT sums cast back losslessly). */
  val q77Sql: String =
    s"""WITH b AS (
       |  SELECT source, count(*) AS n_docs, CAST(sum(len(toks)) AS BIGINT) AS n_tokens
       |  FROM (SELECT source, $Toks AS toks FROM documents) GROUP BY 1),
       |p AS (SELECT *,
       |  CAST(floor(1000000.0 * pow(CAST(n_tokens AS DOUBLE), 0.7)) AS BIGINT) AS p_e6
       |  FROM b),
       |sh AS (SELECT source, n_docs, n_tokens,
       |  CAST(n_tokens * 1000000 // (SELECT sum(n_tokens) FROM p) AS BIGINT) AS raw_share_e6,
       |  CAST(p_e6 * 1000000 // (SELECT sum(p_e6) FROM p) AS BIGINT) AS temp_share_e6
       |  FROM p)
       |SELECT source, n_docs, n_tokens, raw_share_e6, temp_share_e6,
       |  CASE WHEN raw_share_e6 = 0 THEN NULL
       |       ELSE CAST(temp_share_e6 * 1000000 // raw_share_e6 AS BIGINT) END AS boost_e6
       |FROM sh
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q78

  /** q78_snapshot_diff — corpus version diffing: given snapshot v1 and its
    * next crawl v2, classify every document `added` / `removed` /
    * `changed` / `unchanged` by primary key + content fingerprint. This is
    * the maintenance loop of any living corpus (incremental ingestion,
    * re-crawl reconciliation, training-set release notes): downstream,
    * `changed`∪`added` is the re-processing worklist and `removed` the
    * tombstone feed for the merge sink (O26). v2 is simulated
    * deterministically from the corpus itself — doc_id % 13 slices get
    * dropped (removed), re-texted (changed) or re-keyed (added) — so both
    * engines construct identical snapshots and the diff is fully
    * hash-checkable.
    *
    * Scale shape: fingerprints are computed IN THE SCAN (narrow md5 — the
    * text never shuffles), and the diff is ONE pk-keyed full-outer join of
    * (doc_id, fp) pairs. At 100 TB, store snapshots bucketed by pk
    * ([[graft.sql.CleanRoom.loadBucketed]]) and even that join runs with
    * no exchange — the q69 layout-as-shuffle recipe; diff cost then tracks
    * snapshot WIDTH (two narrow columns), never content volume. */
  def q78SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v1 = Tables.documents(s, dir).select($"doc_id", $"text")
    // the simulated next crawl: % 13 == 3 dropped, == 5 edited, == 7 also
    // re-published under a fresh id (the base row stays)
    val v2 = v1.filter($"doc_id" % 13 =!= 3)
      .withColumn("text", when($"doc_id" % 13 === 5, concat($"text", lit(" rev2")))
        .otherwise($"text"))
      .unionAll(v1.filter($"doc_id" % 13 === 7)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
    def fp(df: DataFrame, name: String): DataFrame =
      df.select($"doc_id", md5($"text".cast("binary")).as(name))
    fp(v1, "fp_old").join(fp(v2, "fp_new"), Seq("doc_id"), "full_outer")
      .select($"doc_id",
        when($"fp_old".isNull, "added")
          .when($"fp_new".isNull, "removed")
          .when($"fp_old" === $"fp_new", "unchanged")
          .otherwise("changed").as("verdict"),
        $"fp_old", $"fp_new")
      .orderBy($"doc_id")
  }

  /** q78 oracle: the same deterministic v2 construction and pk-keyed
    * full-outer fingerprint compare. */
  val q78Sql: String =
    """WITH v1 AS (SELECT doc_id, text FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 5 THEN text || ' rev2' ELSE text END AS text
      |  FROM v1 WHERE doc_id % 13 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM v1 WHERE doc_id % 13 = 7),
      |o AS (SELECT doc_id, md5(text) AS fp_old FROM v1),
      |n AS (SELECT doc_id, md5(text) AS fp_new FROM v2)
      |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.fp_old IS NULL THEN 'added'
      |       WHEN n.fp_new IS NULL THEN 'removed'
      |       WHEN o.fp_old = n.fp_new THEN 'unchanged'
      |       ELSE 'changed' END AS verdict,
      |  o.fp_old, n.fp_new
      |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q88

  /** q88_vocab_drift — distributional drift between corpus snapshots: the
    * top-20 tokens by absolute contribution to KL(v1 ‖ v2), where v2 is
    * q78's deterministic next-crawl simulation and both token
    * distributions are add-one smoothed over the UNION vocabulary. q78
    * answers "which DOCUMENTS changed"; this answers "did the LANGUAGE
    * change" — the telemetry a training pipeline watches between crawls
    * to catch topic collapse, spam floods, or scraper regressions before
    * they reach a training run (the q71 histogram's lexical sibling).
    *
    * Engine-determinism (the q68/q73 ln convention): per token ONE double
    * expression — 1e6 · p1 · ln(p1/p2) with p = (c+1)/(n+|V|) — written
    * with identical literals and associativity in both engines over exact
    * integer inputs (counts, totals, vocab size), floored onto the e6
    * grid; ranking then compares integers with a token tie-break, so an
    * ulp cannot flip the export.
    *
    * Scale shape: two explode → token-keyed count aggregations (partial
    * aggs carry counts, not tokens), one |V|-sized full-outer join on the
    * token key, totals as a broadcast 1-row aggregate, and a top-20 over
    * |V| rows (WindowGroupLimit prunes map-side). Nothing scales with
    * corpus size except the two count shuffles — the q36/q37 shape. */
  /** q88's pre-checkpoint join stage — (token, c1, c2) over the union
    * vocabulary of v1 and q78's v2 — factored out so DumpPlans can show
    * the join + count-shuffle shape the scaladoc describes (the public
    * query checkpoints it, which cuts the executed plan; q70's pattern). */
  private[graft] def vocabDriftJoined(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v1 = Tables.documents(s, dir).select($"doc_id", $"text")
    // q78's simulated next crawl (verbatim — the two queries must describe
    // the same v2 or their telemetry diverges)
    val v2 = v1.filter($"doc_id" % 13 =!= 3)
      .withColumn("text", when($"doc_id" % 13 === 5, concat($"text", lit(" rev2")))
        .otherwise($"text"))
      .unionAll(v1.filter($"doc_id" % 13 === 7)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
    def counts(df: DataFrame, name: String): DataFrame =
      df.select(explode(TextFunctions.tokens($"text")).as("token"))
        .groupBy($"token").agg(count(lit(1)).as(name))
    counts(v1, "c1").join(counts(v2, "c2"), Seq("token"), "full_outer")
      .select($"token",
        coalesce($"c1", lit(0L)).as("c1"), coalesce($"c2", lit(0L)).as("c2"))
  }

  def q88VocabDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // lazy localCheckpoint (q52's pattern): `joined` feeds BOTH the 1-row
    // totals aggregate and the scored output — without the barrier the
    // full-outer join executes twice (with reused shuffles, but still
    // 2x the |V|-row merge work)
    val joined = vocabDriftJoined(s, dir).localCheckpoint(false)
    val stats = joined.agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
      count(lit(1)).as("vsz"))
    val p1 = ($"c1" + lit(1.0)) / ($"n1" + $"vsz")
    val p2 = ($"c2" + lit(1.0)) / ($"n2" + $"vsz")
    val w = Window.orderBy(abs($"kl_e6").desc, $"token")
    joined.crossJoin(broadcast(stats))
      .select($"token", $"c1", $"c2",
        floor(lit(1000000.0) * p1 * log(p1 / p2)).cast("long").as("kl_e6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 20)
      .select($"rank", $"token", $"c1", $"c2", $"kl_e6")
      .orderBy($"rank")
  }

  /** q88 oracle: q78's v2, the same smoothed-KL contribution text, the
    * same integer ranking. */
  val q88Sql: String =
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
       |v2 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 13 = 5 THEN text || ' rev2' ELSE text END AS text
       |  FROM v1 WHERE doc_id % 13 <> 3
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text FROM v1 WHERE doc_id % 13 = 7),
       |t1 AS (SELECT token, count(*) AS c1
       |       FROM (SELECT unnest($Toks) AS token FROM v1) GROUP BY token),
       |t2 AS (SELECT token, count(*) AS c2
       |       FROM (SELECT unnest($Toks) AS token FROM v2) GROUP BY token),
       |j AS (SELECT coalesce(t1.token, t2.token) AS token,
       |        coalesce(t1.c1, 0) AS c1, coalesce(t2.c2, 0) AS c2
       |      FROM t1 FULL OUTER JOIN t2 ON t1.token = t2.token),
       |st AS (SELECT sum(c1) AS n1, sum(c2) AS n2, count(*) AS vsz FROM j),
       |k AS (SELECT token, c1, c2,
       |        CAST(floor(1000000.0 * ((c1 + 1.0) / (n1 + vsz))
       |          * ln(((c1 + 1.0) / (n1 + vsz)) / ((c2 + 1.0) / (n2 + vsz))))
       |          AS BIGINT) AS kl_e6
       |      FROM j, st)
       |SELECT CAST(rank AS BIGINT) AS rank, token, c1, c2, kl_e6 FROM (
       |  SELECT *, row_number() OVER (ORDER BY abs(kl_e6) DESC, token) AS rank
       |  FROM k) r
       |WHERE rank <= 20
       |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- q79

  /** q79_curriculum — difficulty staging for curriculum learning: every
    * document is assigned a quartile bucket (1 = most fluent … 4 = most
    * perplexing) by its q68 bigram-LM perplexity, with the quartile
    * BOUNDARIES computed once and broadcast — NOT a global NTILE sort, the
    * anti-pattern at 100 TB (NTILE needs a total order over every row;
    * boundary assignment needs three comparisons per row against three
    * broadcast scalars). The same shape serves any score-staged sampling:
    * difficulty curricula, quality tiers, decontamination severity bands.
    *
    * Engine-determinism: boundaries are exact percentiles (the q39
    * Spark-percentile ≡ DuckDB-quantile_cont convention) of the INTEGER
    * e6 scores, floored back onto the grid, so bucket assignment is pure
    * integer comparison on both engines. Documents with no bigrams score
    * NULL and get a NULL bucket. */
  def q79Curriculum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = q68BigramPpl(s, dir)
      .select($"doc_id", $"nll_per_bigram_e6")
    val bounds = scored.filter($"nll_per_bigram_e6".isNotNull)
      .agg(
        floor(expr("percentile(nll_per_bigram_e6, 0.25)")).cast("long").as("b1"),
        floor(expr("percentile(nll_per_bigram_e6, 0.50)")).cast("long").as("b2"),
        floor(expr("percentile(nll_per_bigram_e6, 0.75)")).cast("long").as("b3"))
    scored.crossJoin(broadcast(bounds))
      .select($"doc_id", $"nll_per_bigram_e6",
        when($"nll_per_bigram_e6".isNull, lit(null).cast("long"))
          .otherwise(lit(1L) +
            ($"nll_per_bigram_e6" > $"b1").cast("long") +
            ($"nll_per_bigram_e6" > $"b2").cast("long") +
            ($"nll_per_bigram_e6" > $"b3").cast("long")).as("bucket"))
      .orderBy($"doc_id")
  }

  /** q79 oracle: the q68 scoring core + quantile_cont boundaries floored
    * to the grid + the same integer-compare assignment. */
  val q79Sql: String =
    s"""WITH $BigramPplCoreSql,
       |bounds AS (
       |  SELECT CAST(floor(quantile_cont(nll_per_bigram_e6, 0.25)) AS BIGINT) AS b1,
       |    CAST(floor(quantile_cont(nll_per_bigram_e6, 0.50)) AS BIGINT) AS b2,
       |    CAST(floor(quantile_cont(nll_per_bigram_e6, 0.75)) AS BIGINT) AS b3
       |  FROM ppl WHERE nll_per_bigram_e6 IS NOT NULL)
       |SELECT doc_id, nll_per_bigram_e6,
       |  CASE WHEN nll_per_bigram_e6 IS NULL THEN NULL
       |       ELSE CAST(1 + (CASE WHEN nll_per_bigram_e6 > b1 THEN 1 ELSE 0 END)
       |                   + (CASE WHEN nll_per_bigram_e6 > b2 THEN 1 ELSE 0 END)
       |                   + (CASE WHEN nll_per_bigram_e6 > b3 THEN 1 ELSE 0 END)
       |            AS BIGINT) END AS bucket
       |FROM ppl, bounds
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q90

  /** q90_weighted_sample — weighted sampling WITHOUT replacement by the
    * Efraimidis–Spirakis A-ES priority rule: each document draws a uniform
    * u from a CONTENT HASH (not an RNG) and gets priority u^(1/w) with
    * w = n_chars; the top-50 priorities are the sample. Longer documents
    * are proportionally likelier to be picked — the standard size-weighted
    * corpus subsample — while the hash-derived u keeps the pick set
    * REPRODUCIBLE: stable under repartitioning, retries, and corpus growth
    * (existing picks only change if a higher-priority newcomer displaces
    * the cutoff), exactly q43's determinism argument extended to weights.
    *
    * Ranking uses ln(u)/w (monotone in u^(1/w)) floored onto the e6 grid —
    * ONE double expression with one `ln`, the q68 convention, so both
    * engines rank identical integers; doc_id breaks grid ties.
    *
    * Scale shape: a narrow scan computes priorities (no shuffle), and
    * top-k-by-priority is Spark's TakeOrdered — per-partition partial
    * top-50 merged on a single reduce, never a global sort. At 100 TB this
    * is scan + O(k) state per partition, the only shape a weighted
    * subsample can afford. */
  def q90WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hx = substring(md5($"doc_id".cast("string").cast("binary")), 1, 8)
    val v = conv(hx, 16, 10).cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(4294967296.0)
    val keyE6 = floor(lit(1000000.0) * log(u) / $"n_chars").cast("long")
    val picked = Tables.documents(s, dir)
      .filter($"n_chars" > 0)
      .select($"doc_id", $"n_chars", keyE6.as("key_e6"))
      .orderBy($"key_e6".desc, $"doc_id")
      .limit(50)
    // global window AFTER the limit: 50 rows, not a corpus sort
    picked
      .withColumn("rank",
        row_number().over(Window.orderBy($"key_e6".desc, $"doc_id")).cast("long"))
      .orderBy($"rank")
  }

  val q90Sql: String =
    """WITH h AS (
      |  SELECT doc_id, n_chars, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hx
      |  FROM documents WHERE n_chars > 0),
      |k AS (
      |  SELECT doc_id, n_chars,
      |    CAST(floor(1000000.0 * ln((CAST(('0x' || hx) AS BIGINT) + 0.5) / 4294967296.0) / n_chars) AS BIGINT) AS key_e6
      |  FROM h)
      |SELECT doc_id, n_chars, key_e6,
      |  CAST(row_number() OVER (ORDER BY key_e6 DESC, doc_id) AS BIGINT) AS rank
      |FROM k ORDER BY key_e6 DESC, doc_id LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q91

  /** q91_heavy_hitters — frequent-items estimation with a FIXED-MEMORY
    * sketch, certified against exact counts (the q45 sketch-contract
    * pattern): per partition, one [[graft.functions.HeavyHitters]]
    * Misra-Gries pass (k = 256 counters, one `mapPartitions` — genuine
    * per-partition imperative state, the documented RDD-tier exception);
    * the partial summaries merge by a plain associative
    * `groupBy(token).sum` whose shuffle carries ≤ partitions·256 rows.
    * This is the sketch a 100 TB vocabulary scan reaches for when q36's
    * exact |vocabulary|-row shuffle would dominate: state is O(k) per
    * partition no matter the corpus.
    *
    * What the oracle gates: raw estimates are partition-layout-dependent
    * (like q45's raw sketch values), so the exported rows are the exact
    * top-10 tokens plus the Misra-Gries CONTRACT as an integer verdict —
    * found ⇒ `est ≤ true` and `(true − est)·(k+1) ≤ N`; missing allowed
    * only when `true·(k+1) ≤ N`. The oracle states literal 1s next to
    * DuckDB's exact counts; any sketch bug flips a verdict and fails the
    * hash. HeavyHitterSpec asserts the underlying bounds directly. */
  def q91HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kCounters = 256
    val toks = Tables.documents(s, dir)
      .select(explode(TextFunctions.tokens($"text")).as("token"))
    val est = toks.as[String]
      .mapPartitions(it => graft.functions.HeavyHitters.summarize(it, kCounters))
      .toDF("token", "est")
      .groupBy($"token").agg(sum($"est").as("est"))
    // one exact vocabulary agg feeds BOTH the top-10 and the total (N =
    // Σ counts) — no third tokenization pass
    val exactAll = toks.groupBy($"token").agg(count(lit(1)).as("n_occurrences"))
    val total = exactAll.agg(sum($"n_occurrences").as("n_total")) // 1 row
    val exact = exactAll.orderBy($"n_occurrences".desc, $"token").limit(10)
    val bound = lit((kCounters + 1).toLong)
    exact.join(est, Seq("token"), "left").crossJoin(total)
      .select($"token", $"n_occurrences",
        (when($"est".isNotNull,
            ($"est" <= $"n_occurrences") &&
              (($"n_occurrences" - $"est") * bound <= $"n_total"))
          .otherwise($"n_occurrences" * bound <= $"n_total")).cast("long").as("hh_ok"))
      .withColumn("rank",
        row_number().over(Window.orderBy($"n_occurrences".desc, $"token")).cast("long"))
      .select($"rank", $"token", $"n_occurrences", $"hh_ok")
      .orderBy($"rank")
  }

  val q91Sql: String =
    s"""WITH toks AS (SELECT unnest($Toks) AS token FROM documents)
       |SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS BIGINT) AS rank,
       |  token, count(*) AS n_occurrences, CAST(1 AS BIGINT) AS hh_ok
       |FROM toks GROUP BY token
       |ORDER BY count(*) DESC, token LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q99

  /** q99_connected_components — EXACT near-dup cluster assignment: min-label
    * propagation over the verified LSH pair graph (q40's edges) run to
    * FIXPOINT with convergence detection, plus the component size each doc
    * belongs to. q40 deliberately fixes the round count (static, oracle-
    * replayable plan; diameter ≤ 2 on this corpus); this query is the
    * general operator a pipeline needs when cluster diameter is UNKNOWN —
    * chains of borderline near-dups can be arbitrarily long, and a
    * too-small fixed k silently splits clusters. The oracle certifies the
    * TRUE transitive closure (a recursive CTE), not a k-round
    * approximation — so a premature convergence exit fails the hash.
    *
    * Scale shape: each round is one edge join + one min-agg (the hash-min
    * step of the standard distributed CC family — large-star/small-star
    * shortcutting is the O(log n)-round upgrade, same per-round plan);
    * labels are localCheckpointed per round so lineage stays flat. The
    * driver loop is CONTROL only — a per-round `changed` count, bounded by
    * the cluster diameter (converged-in-3 here; cap 50), never data on the
    * driver. Rounds cost one shuffle of the (capped, observed) edge list —
    * Σ bucket² edges, never N². */
  def q99ConnectedComponents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val verts = docs
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", TextFunctions.shingles($"toks", 3).as("sh"))
      .filter(size($"sh") > 0)
      .select($"doc_id")
    val pairs = q24DedupMinhash(s, dir).select($"doc_a", $"doc_b")
      .localCheckpoint(true) // materialize the mined edges once
    val edges = pairs.unionByName(
        pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .localCheckpoint(true)

    var labels = verts.select($"doc_id", $"doc_id".as("label")).localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val nbrMin = edges.join(labels.withColumnRenamed("doc_id", "nbr"),
          $"doc_b" === $"nbr")
        .groupBy($"doc_a").agg(min($"label").as("nbr_label"))
      val next = labels.join(nbrMin, $"doc_id" === $"doc_a", "left")
        .select($"doc_id",
          least($"label", coalesce($"nbr_label", $"label")).as("label"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
        .filter($"label" =!= $"old").count()
      labels = next
      rounds += 1
    }
    val sizes = labels.groupBy($"label").agg(count(lit(1)).as("csize"))
    labels.join(sizes, "label")
      .select($"doc_id", $"label".as("component"), $"csize")
      .orderBy($"doc_id")
  }

  /** q99 oracle: the true transitive closure — labels flow along edges via
    * a recursive CTE (UNION dedup terminates it), each doc takes the MIN
    * reachable id, sizes counted per component. Edges are the exact-Jaccard
    * pair semantics the q24/q40 oracles share. */
  val q99Sql: String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, $Shingles3 AS s
       |  FROM (SELECT doc_id, $Toks AS toks FROM documents)
       |  WHERE len(toks) >= 3),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
       |        / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
       |edges AS (SELECT doc_a, doc_b FROM pairs
       |          UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs),
       |reach(doc_id, label) AS (
       |  SELECT doc_id, doc_id FROM sh
       |  UNION
       |  SELECT e.doc_a, r.label
       |  FROM reach r JOIN edges e ON e.doc_b = r.doc_id),
       |comp AS (SELECT doc_id, min(label) AS component FROM reach GROUP BY doc_id),
       |sz AS (SELECT component, count(*) AS csize FROM comp GROUP BY component)
       |SELECT c.doc_id, c.component, sz.csize
       |FROM comp c JOIN sz USING (component)
       |ORDER BY c.doc_id""".stripMargin

  // ---------------------------------------------------------------- q100

  /** q100_fuzzy_capped — q70's `verifyPrefixChars` dial UNDER THE GATE at
    * a SECOND setting (128 chars; 256 is q70's default since round 9):
    * certifies the dial's PARAMETRICITY — prefix truncation on both
    * sides, `eff_len = least(max_len, cap)` in the gate and the exported
    * ratio — replays exactly in SQL at an arbitrary setting, so turning
    * the dial at 100 TB cannot silently change what the operator
    * computes. Q70PrefixCapSpec measures the recall cost per setting
    * (1.00 at 128 on this corpus); the uncapped semantics stay gated as
    * `q70_uncapped`. */
  def q100FuzzyCapped(s: SparkSession, dir: String): DataFrame =
    q70FuzzyMatchWith(s, dir, verifyPrefixChars = Some(128))

  val q100Sql: String = fuzzyCappedSql(128)

  // ---------------------------------------------------------------- q102

  /** q102_incr_dedup — INCREMENTAL dedup: probe only the crawl DELTA
    * against the previous snapshot's content-fingerprint index, instead of
    * re-deduplicating the whole corpus. q78 answers "which documents
    * changed between crawls"; this continues: "of the added/changed ones,
    * which are content we already have" — the O(|Δ|) admission check a
    * 100 TB pipeline runs per crawl, where q23's full-corpus dedup is the
    * O(N) job it replaces for steady-state ingest.
    *
    * Semantics: v2 is q78's deterministic next-crawl simulation. A v2 doc
    * is DELTA if its doc_id is new or its content fingerprint (q23's
    * shingle-set md5 — so a re-published copy under a fresh id still
    * matches) differs from v1's under the same id. Each delta doc probes
    * the v1 index (fp → min doc_id, q23's canonical convention):
    * `dup_of_v1` names the canonical prior copy, `known_dup` is the
    * BIGINT 0/1 admission verdict.
    *
    * Scale shape: delta detection is one pk-keyed left join (q78's
    * exchange); the probe is one fp-keyed join whose LEFT side is only the
    * delta — an unchanged corpus probes nothing. At 100 TB the index is a
    * MAINTAINED artifact: a bucketed-by-fp table kept current by q96's
    * incremental-fold discipline (append new fps per admitted batch), so
    * the per-crawl cost is O(|Δ|) scan + O(|Δ|) probe, never O(N). Here
    * the index build is in-plan because the oracle must replay it. */
  def q102IncrDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v1 = Tables.documents(s, dir).select($"doc_id", $"text")
    // q78's crawl: % 13 == 3 dropped, == 5 edited, == 7 re-published fresh
    val v2 = v1.filter($"doc_id" % 13 =!= 3)
      .withColumn("text", when($"doc_id" % 13 === 5, concat($"text", lit(" rev2")))
        .otherwise($"text"))
      .unionAll(v1.filter($"doc_id" % 13 === 7)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
    def fp(df: DataFrame): DataFrame =
      df.select($"doc_id", contentFp(TextFunctions.tokens($"text")).as("fp"))
    val v1fp = fp(v1)
    val index = v1fp.groupBy($"fp").agg(min($"doc_id").as("dup_of_v1"))
    val delta = fp(v2)
      .join(v1fp.select($"doc_id", $"fp".as("fp_old")), Seq("doc_id"), "left_outer")
      .filter($"fp_old".isNull || $"fp_old" =!= $"fp")
    delta.join(index, Seq("fp"), "left_outer")
      .select($"doc_id", $"fp",
        when($"fp_old".isNull, "added").otherwise("changed").as("delta_kind"),
        $"dup_of_v1",
        $"dup_of_v1".isNotNull.cast("long").as("known_dup"))
      .orderBy($"doc_id")
  }

  /** q102 oracle: v2 construction (q78's text), fingerprints (q23's
    * fragments), delta filter, and index probe replayed verbatim. */
  val q102Sql: String =
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
       |v2 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 13 = 5 THEN text || ' rev2' ELSE text END AS text
       |  FROM v1 WHERE doc_id % 13 <> 3
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text FROM v1 WHERE doc_id % 13 = 7),
       |f1 AS (SELECT doc_id, $FpSql AS fp
       |       FROM (SELECT doc_id, $Toks AS toks FROM v1)),
       |f2 AS (SELECT doc_id, $FpSql AS fp
       |       FROM (SELECT doc_id, $Toks AS toks FROM v2)),
       |idx AS (SELECT fp, min(doc_id) AS dup_of_v1 FROM f1 GROUP BY fp),
       |delta AS (
       |  SELECT f2.doc_id, f2.fp, f1.fp AS fp_old
       |  FROM f2 LEFT JOIN f1 ON f2.doc_id = f1.doc_id
       |  WHERE f1.fp IS NULL OR f1.fp <> f2.fp)
       |SELECT d.doc_id, d.fp,
       |  CASE WHEN d.fp_old IS NULL THEN 'added' ELSE 'changed' END AS delta_kind,
       |  i.dup_of_v1,
       |  CAST(CASE WHEN i.dup_of_v1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS known_dup
       |FROM delta d LEFT JOIN idx i ON d.fp = i.fp
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q104

  /** q104_sparse_cosine — SPARSE-vector cosine similarity join over TF-IDF
    * weights via an inverted-index postings join: the sparse complement to
    * the dense-embedding family (q25/q26/q64) and the token-SET family
    * (q52's Jaccard) — pairs score by WEIGHTED lexical overlap, the
    * classic near-dup signal when embeddings don't exist yet (first-pass
    * crawl triage runs exactly this).
    *
    * Semantics: per-(doc, token) weight = tf·idf floored onto the e6 grid
    * (q37's scoring, integerized); tokens in more than 20% of the corpus
    * (df·5 > N — RELATIVE, so the cap means the same thing at every
    * scale) are dropped from the VECTORS (not from the tf denominator or
    * idf corpus stats) — the standard stopword-grade mass cut — AND
    * tokens with df > 2000 are dropped (absolute postings bound). Pairs
    * with cos ≥ 0.3 emit; cos is ONE double
    * expression over three exact int64 sums (dot, two norms — products of
    * e6 ints sum exactly in int64), floored onto the e6 grid; sqrt is
    * IEEE-correctly-rounded in both engines (the q68/q93 convention).
    *
    * Scale shape: the only quadratic surface is the token-keyed postings
    * self-join, and the RELATIVE cap alone does NOT bound it — a token
    * sitting at a constant sub-cap document frequency r keeps a posting
    * of r·N rows, so its pair output grows (r·N)²: the round-11 ×10
    * protocol MEASURED exactly that (q104 1 s at sf0.1 → killed at 6 min
    * on ×10, one token bucket holding a 27-CPU-minute shuffle task; the
    * corpus-wide function words the scale salt deliberately preserves sit
    * at 10–20% df and are precisely such tokens). The ABSOLUTE df bound
    * is what linearizes it: postings ≤ 2000 ⇒ Σ df² ≤ 2000·|postings| —
    * linear in corpus size, the df-limit/prune-list discipline of
    * similarity-join engines (Bayardo et al. 2007's df-ordered pruning
    * family). At the gated SFs (N ≤ 5000) the relative cap N/5 ≤ 1000
    * binds first, so the absolute bound changes no gated result; it
    * engages beyond N = 10000, the regime it exists for. Mid-frequency
    * tokens it cuts carry idf ≤ ln(N/2000) mass and near-dup cosine is
    * driven by the rare-token tail, the same trade every prune list
    * makes. At 100 TB, q52's AllPairs prefix filter composes on top
    * (score-ordered postings, prefix pruning) to shrink candidates
    * further. */
  def q104SparseCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tc = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", size($"toks").as("n_tok"), explode($"toks").as("token"))
      .groupBy($"doc_id", $"n_tok", $"token")
      .agg(count(lit(1)).as("cnt"))
    val dft = tc.groupBy($"token").agg(count(lit(1)).as("df_docs"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val vec = tc.join(dft, "token")
      .crossJoin(broadcast(nDocs))
      .filter($"df_docs" * 5 <= $"n_docs" && $"df_docs" <= 2000)
      .select($"doc_id", $"token",
        floor(lit(1000000.0) * ($"cnt".cast("double") / $"n_tok") *
          log($"n_docs".cast("double") / $"df_docs")).cast("long").as("w"))
    val norms = vec.groupBy($"doc_id").agg(sum($"w" * $"w").as("n2"))
    val dots = vec.select($"doc_id".as("doc_a"), $"token", $"w".as("wa"))
      .join(vec.select($"doc_id".as("doc_b"), $"token", $"w".as("wb")), "token")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(sum($"wa" * $"wb").as("dot"), count(lit(1)).as("n_shared"))
    dots
      .join(norms.select($"doc_id".as("doc_a"), $"n2".as("na")), "doc_a")
      .join(norms.select($"doc_id".as("doc_b"), $"n2".as("nb")), "doc_b")
      .select($"doc_a", $"doc_b", $"n_shared",
        floor(lit(1000000.0) * $"dot".cast("double") /
          (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))))
          .cast("long").as("cos_e6"))
      .filter($"cos_e6" >= 300000L)
      .orderBy($"doc_a", $"doc_b")
  }

  /** q104 oracle: weights, df cap, postings join, and the single-expression
    * cosine replayed with identical formula text and associativity. */
  val q104Sql: String =
    s"""WITH toks AS (SELECT doc_id, $Toks AS toks FROM documents),
       |tc AS (
       |  SELECT doc_id, len(toks) AS n_tok, t.token, count(*) AS cnt
       |  FROM toks, unnest(toks) AS t(token)
       |  GROUP BY doc_id, len(toks), t.token),
       |dft AS (SELECT token, count(*) AS df_docs FROM tc GROUP BY token),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |vec AS (
       |  SELECT tc.doc_id, tc.token,
       |    CAST(floor(1000000.0 * (CAST(tc.cnt AS DOUBLE) / tc.n_tok) *
       |      ln(CAST(n.n_docs AS DOUBLE) / dft.df_docs)) AS BIGINT) AS w
       |  FROM tc JOIN dft USING (token) CROSS JOIN n
       |  WHERE dft.df_docs * 5 <= n.n_docs AND dft.df_docs <= 2000),
       |norms AS (SELECT doc_id, sum(w * w) AS n2 FROM vec GROUP BY doc_id),
       |dots AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    sum(a.w * b.w) AS dot, count(*) AS n_shared
       |  FROM vec a JOIN vec b ON a.token = b.token AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT * FROM (
       |  SELECT d.doc_a, d.doc_b, d.n_shared,
       |    CAST(floor(1000000.0 * CAST(d.dot AS DOUBLE) /
       |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))) AS BIGINT) AS cos_e6
       |  FROM dots d
       |  JOIN norms na ON d.doc_a = na.doc_id
       |  JOIN norms nb ON d.doc_b = nb.doc_id) p
       |WHERE cos_e6 >= 300000
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q106

  /** q106_domain_cap — per-source document caps: keep the top-50 docs per
    * `lang` by the frozen quality model's score (q75's `qualityScored`,
    * shared verbatim — the score semantics are certified once and
    * inherited). The FineWeb/CCNet-style domain-balancing pass: without
    * per-source caps, one over-crawled domain floods the mixture no
    * matter what the q77 temperature weights say — caps bound every
    * source BEFORE mixture math, and the (rank, score) export makes the
    * cut auditable per source.
    *
    * Determinism: rank orders by (score_e6 DESC, doc_id) — integer keys,
    * no float comparisons. Zero-token docs are excluded upstream by the
    * shared scorer (q75's rule).
    *
    * Scale shape: one lang-keyed exchange for the window. At 100 TB the
    * window's within-source sort is the cost — the standard dial is a
    * two-phase top-K (per-partition partial top-K, then merge, q90's
    * TakeOrdered shape) or a pre-filter at an approximate Kth-score
    * threshold from q45's sketches; both leave these semantics (and this
    * oracle) unchanged, which is exactly why the cap is defined by
    * (score, doc_id) order and not by arrival order. */
  def q106DomainCap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"score_e6".desc, $"doc_id")
    qualityScored(s, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 50)
      .select($"lang", $"rank", $"doc_id", $"score_e6")
      .orderBy($"lang", $"rank")
  }

  /** q106 oracle: q75's scoring text with `lang` carried, then the
    * per-source rank window and cap. */
  val q106Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    $StopRatioSql AS stop_e6,
       |    CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
       |    CAST(len(text) AS DOUBLE) AS nc
       |  FROM (SELECT doc_id, lang, text, $Toks AS toks FROM documents)
       |  WHERE len(toks) >= 1),
       |z AS (
       |  SELECT doc_id, lang, n_tokens,
       |    -3.0 +
       |    2.0 * (CAST(least(n_tokens, 400) AS DOUBLE) / 400.0) +
       |    4.0 * (CAST(stop_e6 AS DOUBLE) / 1000000.0) +
       |    2.0 * (nd / n_tokens) +
       |    1.0 * (nc / n_tokens / 10.0) AS z
       |  FROM f),
       |sc AS (
       |  SELECT doc_id, lang,
       |    CAST(floor(1000000.0 / (1.0 + exp(-z))) AS BIGINT) AS score_e6
       |  FROM z)
       |SELECT lang, rank, doc_id, score_e6 FROM (
       |  SELECT lang, doc_id, score_e6,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rank
       |  FROM sc) t
       |WHERE rank <= 50
       |ORDER BY lang, rank""".stripMargin

  // ---------------------------------------------------------------- q152

  /** q152_token_budget — token-budget-constrained corpus selection: take
    * the best-scoring documents (q75's certified frozen-weights model) in
    * (score DESC, doc_id) order until a fixed token budget is exhausted —
    * THE data-selection shape of every "train on the best N tokens" run
    * (quality-ranked greedy selection; q79 buckets by quartile, q57/q77
    * mix by source — this cuts by global rank under a budget).
    *
    * The scale problem is the GLOBAL running sum: declaratively it is one
    * `ORDER BY score` window — a single-partition sort of the corpus, the
    * exact thing that dies at 100 TB. The plan decomposes it exactly
    * (the distributed prefix-sum / terasort-offset pattern): docs bucket
    * by `score_e6 div 10⁴` (integer, order-compatible with the score
    * order by construction), per-bucket token totals fold map-side to a
    * ≤101-row table whose running offsets ARE allowed a global window
    * (tiny); each doc's global cumulative = its bucket's offset
    * (broadcast back) + its within-bucket running sum under a
    * bucket-PARTITIONED window. Bit-identical to the declarative form —
    * the oracle states that form, the plan never builds it.
    *
    * Budget 10⁴ tokens binds at every SF (corpus totals are ≥2.5× it). */
  def q152TokenBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val budget = 10000L
    val bucketed = qualityScored(s, dir)
      .select($"doc_id", $"n_tokens", $"score_e6",
        expr("score_e6 div 10000").as("bkt"))
    val offs = bucketed.groupBy($"bkt").agg(sum($"n_tokens").as("t"))
      .withColumn("off", coalesce(sum($"t").over(
        Window.orderBy($"bkt".desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bkt".as("obkt"), $"off")
    val wIn = Window.partitionBy($"bkt")
      .orderBy($"score_e6".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offs), $"bkt" === $"obkt")
      .withColumn("cum", $"off" + sum($"n_tokens").over(wIn))
      .filter($"cum" <= budget)
      .select($"doc_id", $"n_tokens", $"score_e6", $"cum")
      .orderBy($"doc_id")
  }

  /** q152 oracle: the single declarative global-order running sum the
    * bucket decomposition must equal bit-for-bit. */
  val q152Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    $StopRatioSql AS stop_e6,
       |    CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
       |    CAST(len(text) AS DOUBLE) AS nc
       |  FROM (SELECT doc_id, text, $Toks AS toks FROM documents)
       |  WHERE len(toks) >= 1),
       |z AS (
       |  SELECT doc_id, n_tokens,
       |    -3.0 +
       |    2.0 * (CAST(least(n_tokens, 400) AS DOUBLE) / 400.0) +
       |    4.0 * (CAST(stop_e6 AS DOUBLE) / 1000000.0) +
       |    2.0 * (nd / n_tokens) +
       |    1.0 * (nc / n_tokens / 10.0) AS z
       |  FROM f),
       |sc AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(floor(1000000.0 / (1.0 + exp(-z))) AS BIGINT) AS score_e6
       |  FROM z),
       |sel AS (
       |  SELECT doc_id, n_tokens, score_e6,
       |    CAST(sum(n_tokens) OVER (ORDER BY score_e6 DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM sc)
       |SELECT doc_id, n_tokens, score_e6, cum
       |FROM sel WHERE cum <= 10000 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q108

  /** q108_char_entropy — per-document character-distribution entropy, the
    * classic cheap gibberish/binary-spill detector (low entropy = one
    * symbol dominates: `aaaa…`, padded boilerplate; a natural-language doc
    * over a 27-symbol alphabet sits near 2.4–2.9 nats). Runs after q21's
    * surface stats and alongside q58's repetition gates in the standard
    * reject pass — q58 catches repeated TOKENS/grams, this catches
    * degenerate CHARACTER streams that still tokenize innocently.
    *
    * Formulation: per-doc alphabet counts from the native ONE-PASS
    * [[graft.functions.expressions.CharCounts]] histogram (semantically
    * `cnt(c) = len(t) − len(replace(t, c))` on the lowercased text — the
    * composable formulation ExpressionSpec differentials against, and the
    * one the oracle replays — but reading the bytes once instead of 27
    * copy-and-scan passes: measured 4.25 s → 0.48 s at sf0.1, ×10 ratio
    * 2.04× → 1.33×), then
    * H·n = n·ln(n) − Σ cnt·ln(cnt) entirely inside `aggregate` HOFs.
    * ZERO shuffles, zero explodes: the whole query is a narrow O(chars)
    * column pass at scan speed (the explode-and-groupBy-(doc,char)
    * formulation this replaces shuffles a row per (doc,char) — pointless
    * when the alphabet is a compile-time constant).
    *
    * Engine-determinism (q68's convention): each ln term is ONE double
    * expression floored onto the e6 grid — per-symbol floor(1e6·c·ln c)
    * summed EXACTLY in int64, subtracted from floor(1e6·n·ln n), and the
    * per-char normalization is exact integer division. The low-entropy
    * flag compares integers (ent_num_e6 < τ·n) so no float comparison can
    * flip it; τ = 2.6 nats sits just under this corpus's p05 (measured
    * min/p05/max ≈ 2.55/2.71/2.94 at sf0.001) so the gate flags a real
    * low-entropy tail at every SF without emptying the corpus. */
  def q108CharEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cnts = call_function("graft_char_counts", $"text")
    val base = Tables.documents(s, dir)
      .select($"doc_id", cnts.as("cs"))
      .select($"doc_id",
        aggregate($"cs", lit(0L), (acc, c) => acc + c).as("n_used"),
        aggregate($"cs", lit(0L), (acc, c) => acc +
          when(c > 0,
            floor(lit(1000000.0) * c.cast("double") * log(c.cast("double"))).cast("long"))
            .otherwise(lit(0L))).as("s_e6"))
      .filter($"n_used" >= 1)
    base
      .select($"doc_id", $"n_used",
        (floor(lit(1000000.0) * $"n_used".cast("double") * log($"n_used".cast("double")))
          .cast("long") - $"s_e6").as("ent_num_e6"))
      .select($"doc_id", $"n_used", $"ent_num_e6",
        call_function("div", $"ent_num_e6", $"n_used").as("entropy_e6"),
        when($"ent_num_e6" < lit(2600000L) * $"n_used", lit(1L)).otherwise(lit(0L))
          .as("low_entropy"))
      .orderBy($"doc_id")
  }

  /** q108 oracle: identical alphabet, count formula, grid terms, and
    * integer thresholds — the ln calls are the only cross-library floats
    * and each sits alone under its e6 floor. */
  val q108Sql: String = {
    val alphaSql = (('a' to 'z').map(c => s"'$c'") :+ "' '").mkString("[", ", ", "]")
    s"""WITH lt AS (SELECT doc_id, lower(text) AS t FROM documents),
       |cnt AS (
       |  SELECT doc_id,
       |    [length(t) - length(replace(t, c, '')) for c in $alphaSql] AS cs
       |  FROM lt),
       |agg AS (
       |  SELECT doc_id,
       |    CAST(list_sum(cs) AS BIGINT) AS n_used,
       |    CAST(list_sum([CASE WHEN c > 0 THEN
       |        CAST(floor(1000000.0 * CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS BIGINT)
       |      ELSE 0 END for c in cs]) AS BIGINT) AS s_e6
       |  FROM cnt
       |  WHERE list_sum(cs) >= 1),
       |num AS (
       |  SELECT doc_id, n_used,
       |    CAST(floor(1000000.0 * CAST(n_used AS DOUBLE) * ln(CAST(n_used AS DOUBLE))) AS BIGINT)
       |      - s_e6 AS ent_num_e6
       |  FROM agg)
       |SELECT doc_id, n_used, ent_num_e6,
       |  ent_num_e6 // n_used AS entropy_e6,
       |  CAST(CASE WHEN ent_num_e6 < 2600000 * n_used THEN 1 ELSE 0 END AS BIGINT) AS low_entropy
       |FROM num ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q109

  /** q109_containment — EXACT set-containment join over 3-gram shingles:
    * emit ordered pairs (a, b) with C(a→b) = |Sa∩Sb|/|Sa| ≥ 9/10. The
    * asymmetric complement to q52's Jaccard: containment finds QUOTES and
    * near-subsets — a short doc embedded in a longer one scores C≈1 while
    * its Jaccard (divided by the union) stays low, so symmetric dedup
    * never sees it. This is the quote/excerpt-detection pass (and the
    * direction train-eval contamination actually happens: the small eval
    * doc contained in a big crawl doc).
    *
    * Prefix filter, containment form: under ANY global token order, if
    * none of Sa's first `p = sz_a − ceil(t·sz_a) + 1` tokens is in Sb,
    * then ≥ p of Sa's tokens are missing, so |∩| ≤ sz_a − p < t·sz_a — a
    * true pair must hit Sa's p-prefix. Only the PROBE side prefixes;
    * the indexed side posts its whole set (containment puts no lower
    * bound on |Sb|, so no symmetric prefix or length filter applies —
    * the structural cost gap vs q52, which is why the index is built on
    * the same df-ascending gid order: probe prefixes hold the RAREST
    * grams, so the postings they touch are the short ones).
    *
    * Shares q52's dictionary/sorted-gid machinery ([[shingleGidSets]] —
    * one certified implementation, two gates) and its no-float
    * discipline: the 10·|∩| ≥ 9·|Sa| gate and prefix lengths are pure
    * integer arithmetic.
    *
    * Scale shape: Σ (probe-prefix df × posting length) — posting lists of
    * the FULL index are the dial; at 100 TB the df cap (q104's) or
    * positional filters (PPJoin+) bound the hot tail, and both leave
    * these semantics unchanged. Oracle: all-pairs exact containment. */
  def q109Containment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gids = shingleGidSets(s, dir)
    // probe prefixes for t = 9/10: sz − ceil(9·sz/10) + 1 (integer ceil)
    val p = ($"sz" - floor(($"sz" * 9 + 9) / 10) + 1).cast("int")
    val pre = gids.select($"doc_id".as("doc_a"),
      explode(slice($"ord", lit(1), p)).as("gid"))
    // FULL inverted index on the candidate (superset) side
    val full = gids.select($"doc_id".as("doc_b"), explode($"ord").as("gid"))
    val cand = pre.join(full, "gid")
      .filter($"doc_a" =!= $"doc_b")
      .select($"doc_a", $"doc_b")
      .distinct()
    val gA = gids.select($"doc_id".as("doc_a"), $"ord".as("ord_a"), $"sz".as("sz_a"))
    val gB = gids.select($"doc_id".as("doc_b"), $"ord".as("ord_b"))
    val inter = call_function("graft_intersect_size", $"ord_a", $"ord_b")
    cand.join(gA, "doc_a").join(gB, "doc_b")
      .filter(inter * 10 >= $"sz_a" * 9)
      .select($"doc_a", $"doc_b",
        round(inter.cast("double") / $"sz_a", 6).as("containment"))
      .orderBy($"doc_a", $"doc_b")
  }

  val q109Sql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, $Shingles3 AS s
       |  FROM (SELECT doc_id, $Toks AS toks FROM documents)
       |  WHERE len(toks) >= 3)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  round(len(list_intersect(a.s, b.s))::DOUBLE / len(a.s), 6) AS containment
       |FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
       |WHERE 10 * len(list_intersect(a.s, b.s)) >= 9 * len(a.s)
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q111

  /** q111_pmi_collocations — collocation/phrase mining by pointwise mutual
    * information: PMI(a,b) = ln(p(ab) / (p(a)·p(b))) over adjacent-bigram
    * and unigram corpus distributions, with a min-support floor (c2 ≥ 5)
    * so rare coincidences don't top the list. The classic phrase-table
    * builder (Mikolov et al.'s word2vec phrases pass, Hearst collocation
    * mining): the output IS the vocabulary-extension table a tokenizer or
    * embedding pipeline consumes.
    *
    * Engine-determinism: counts and totals are exact int64; each PMI is
    * ONE double expression — 1e6·ln((c2·N1·N1)/((N2·c1a)·c1b)) with
    * identical literal text and associativity on both sides, floored onto
    * the e6 grid (q68's convention; the double products stay far inside
    * exact range at any SF that fits a cluster). Support filter and
    * ordering are integer-only.
    *
    * Scale shape: shares q68's instance pass (narrow zip_with, no doc_id
    * carried); two map-side-combined count shuffles (bigram types, token
    * types); totals are the only broadcasts (O(1) scalars, q37's rule);
    * the PMI join is keyed on the bigram-TYPE table — vocabulary-sized,
    * not corpus-sized. */
  def q111PmiCollocations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
    val m = greatest(size($"toks") - 1, lit(0))
    val bg = docs.select(explode(
        zip_with(slice($"toks", lit(1), m), slice($"toks", lit(2), m),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select($"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val c2 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val c1 = docs.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c1"))
    val totals = c1.agg(sum($"c1").as("n1"))
      .crossJoin(c2.agg(sum($"c2").as("n2")))
    c2.filter($"c2" >= 5)
      .join(c1.select($"w".as("w1"), $"c1".as("c1a")), "w1")
      .join(c1.select($"w".as("w2"), $"c1".as("c1b")), "w2")
      .crossJoin(broadcast(totals))
      .select($"w1", $"w2", $"c2",
        floor(lit(1000000.0) * log(($"c2".cast("double") * $"n1" * $"n1") /
          (($"n2".cast("double") * $"c1a") * $"c1b"))).cast("long").as("pmi_e6"))
      .orderBy($"pmi_e6".desc, $"w1", $"w2")
  }

  val q111Sql: String =
    s"""WITH t AS (SELECT doc_id, $Toks AS toks FROM documents),
       |bg AS (SELECT toks[CAST(u.i AS INT)] AS w1, toks[CAST(u.i + 1 AS INT)] AS w2
       |       FROM t, UNNEST(range(1, len(toks))) AS u(i)),
       |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT u.t AS w, count(*) AS c1 FROM t, UNNEST(t.toks) AS u(t) GROUP BY 1),
       |tot AS (SELECT (SELECT CAST(sum(c1) AS BIGINT) FROM c1) AS n1,
       |               (SELECT CAST(sum(c2) AS BIGINT) FROM c2) AS n2)
       |SELECT c2.w1, c2.w2, c2.c2,
       |  CAST(floor(1000000.0 * ln((CAST(c2.c2 AS DOUBLE) * n1 * n1) /
       |    ((CAST(n2 AS DOUBLE) * a.c1) * b.c1))) AS BIGINT) AS pmi_e6
       |FROM c2
       |JOIN c1 a ON c2.w1 = a.w
       |JOIN c1 b ON c2.w2 = b.w
       |CROSS JOIN tot
       |WHERE c2.c2 >= 5
       |ORDER BY pmi_e6 DESC, c2.w1, c2.w2""".stripMargin

  // ---------------------------------------------------------------- q112

  /** q112_source_overlap — the cross-source lexical-overlap matrix: for
    * every source pair, how many distinct 3-gram shingle TYPES they share,
    * plus the shingle-set Jaccard on the e6 grid. The corpus-level view of
    * what q63 does per eval-benchmark: before fixing mixture weights
    * (q77) or per-source caps (q106), this matrix is how a pipeline spots
    * near-mirror source pairs (syndication, scraped mirrors) whose
    * documents dodge exact-fp dedup (measured here: ZERO cross-source
    * fp collisions at sf0.01) but still double the effective weight of
    * their content.
    *
    * Scale shape: one distinct-(source, shingle) shuffle (the dominant
    * term — shingle-type-count rows, map-side deduped), then a
    * shingle-keyed self-join whose postings are ≤ |sources| long, so pair
    * work is bounded by |types|·|sources|² with a FIXED source count —
    * linear in vocabulary. With open-ended source counts (per-domain at
    * web scale) the same matrix comes from per-source MinHash signatures
    * (q24's machinery aggregated per source) — SHIPPED as q124, which
    * uses this exact form as its in-row calibration target. Jaccard is
    * one double division under an e6 floor over exact int64 set sizes. */
  def q112SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // NOT spread (r20, reverting r19): the shingle explode feeds the
    // distinct's partial aggregation — the first exchange already
    // parallelizes the postings join, and the driver's r19 bench measured
    // the kept spread at −17% (2.34→2.81 s)
    val sh = Tables.documents(s, dir)
      .select($"source", explode(
        TextFunctions.shingles(TextFunctions.tokens($"text"), 3)).as("g"))
      .distinct()
    val sz = sh.groupBy($"source").agg(count(lit(1)).as("n_types"))
    val shared = sh.select($"source".as("source_a"), $"g")
      .join(sh.select($"source".as("source_b"), $"g"), "g")
      .filter($"source_a" < $"source_b")
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sz.select($"source".as("source_a"), $"n_types".as("na")), "source_a")
      .join(sz.select($"source".as("source_b"), $"n_types".as("nb")), "source_b")
      .select($"source_a", $"source_b", $"n_shared", $"na", $"nb",
        floor(lit(1000000.0) * $"n_shared".cast("double") /
          ($"na" + $"nb" - $"n_shared")).cast("long").as("jaccard_e6"))
      .orderBy($"source_a", $"source_b")
  }

  val q112Sql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT source, g.g
       |  FROM (SELECT source, $Shingles3 AS s
       |        FROM (SELECT source, $Toks AS toks FROM documents)) t,
       |       UNNEST(t.s) AS g(g)),
       |sz AS (SELECT source, count(*) AS n_types FROM sh GROUP BY 1),
       |shared AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
       |  FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT s.source_a, s.source_b, s.n_shared, za.n_types AS na, zb.n_types AS nb,
       |  CAST(floor(1000000.0 * CAST(s.n_shared AS DOUBLE) /
       |    (za.n_types + zb.n_types - s.n_shared)) AS BIGINT) AS jaccard_e6
       |FROM shared s
       |JOIN sz za ON s.source_a = za.source
       |JOIN sz zb ON s.source_b = zb.source
       |ORDER BY source_a, source_b""".stripMargin

  // ---------------------------------------------------------------- q124

  /** q124_source_overlap_minhash — q112's cross-source overlap matrix from
    * PER-SOURCE MINHASH SIGNATURES instead of the exact postings
    * self-join: the open-source-cardinality form q112's scaladoc promises.
    * Each source gets one H=64-lane signature (per lane, the min lane-hash
    * over the source's distinct shingles — q24's machinery aggregated per
    * source: a doc-level signature is the same minima over a doc's
    * shingles, and min is associative, so per-source minima fold from
    * per-doc minima); Ĵ(a,b) = matching lanes / H. Exported per pair:
    * the EXACT matrix (q112's columns, zero-overlap pairs included), the
    * estimate (`n_eq`, `est_e6`), and the `within` verdict — the
    * estimator's statistical contract as integer arithmetic (q45's
    * sketch-contract pattern): |Ĵ−J| ≤ 2/H (two lanes of granularity)
    * plus the 3σ binomial envelope 3·√(J(1−J)/H), squared into
    * `(diff−2g)²·H ≤ 9·J(1−J)` so no float crosses engines. A broken
    * signature (seed drift, lane mixup, lost shingles) flips verdicts to
    * 0 and fails the hash gate.
    *
    * Lane hashes are md5-derived (15 hex chars = 60-bit ints, the q90
    * hex→BIGINT recipe) so the WHOLE estimator — signatures, match
    * counts, estimates — replays bit-exact in the oracle, unlike the
    * xxhash64 doc-signatures of q24 (whose oracle certifies output, not
    * sketch). All 64 lanes of a row are computed in ONE native pass
    * ([[graft.functions.expressions.Md5Lanes]] — bit-identical to the
    * composable conv∘substring∘md5 trees, which cost ~12 s of the
    * query's 13.4 s at sf0.1 as 64 separate expression trees; the native
    * pass reads lane values straight from digest bytes, no hex strings).
    * At 100 TB the lane hash swaps for the codegen'd xxhash64 family
    * (one digest pass per shingle); semantics — min per lane, match
    * fraction — are what this gate certifies.
    *
    * Scale shape: the signature pass is ONE groupBy(source) with 64
    * map-side-combining min aggregates over the distinct (source,
    * shingle) set — the exchange carries |sources| rows of fixed width,
    * NOT the |types|·|sources|² postings self-join q112 pays (which is
    * gone here: the exact side stays only as the calibration target and
    * is what the estimator replaces at open source cardinality). The
    * pair stage is |sources|² over fixed-width signatures. */
  def q124SourceOverlapMinhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val H = 64
    val sh = Tables.spread(Tables.documents(s, dir)
        .select($"source", $"text"), $"text") // see Tables.spread scaladoc
      .select($"source", explode(
        TextFunctions.shingles(TextFunctions.tokens($"text"), 3)).as("g"))
      .distinct()
    // exact calibration target (q112's matrix, plus zero-overlap pairs)
    val sz = sh.groupBy($"source").agg(count(lit(1)).as("n_types"))
    val shared = sh.select($"source".as("source_a"), $"g")
      .join(sh.select($"source".as("source_b"), $"g"), "g")
      .filter($"source_a" < $"source_b")
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_shared"))
    // per-source signature: min of each md5 lane over distinct shingles —
    // all H lane hashes of a row from one native digest pass
    val laneMins = (0 until H).map(j => min(element_at($"ls", j + 1)).as(s"h$j"))
    val sig = sh.select($"source",
        call_function("graft_md5_lanes", $"g", lit(H)).as("ls"))
      .groupBy($"source").agg(laneMins.head, laneMins.tail: _*)
    val a = sig.select(($"source".as("source_a") +:
      (0 until H).map(j => col(s"h$j").as(s"a$j"))): _*)
    val b = sig.select(($"source".as("source_b") +:
      (0 until H).map(j => col(s"h$j").as(s"b$j"))): _*)
    val nEq = (0 until H).map(j =>
      when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L)).reduce(_ + _)
    val pairs = a.join(broadcast(b), col("source_a") < col("source_b"))
      .select($"source_a", $"source_b", nEq.as("n_eq"))
    val g = 1000000L / H
    pairs
      .join(shared, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("n_shared"))
      .join(sz.select($"source".as("source_a"), $"n_types".as("na")), "source_a")
      .join(sz.select($"source".as("source_b"), $"n_types".as("nb")), "source_b")
      .select($"source_a", $"source_b", $"n_shared", $"na", $"nb",
        floor(lit(1000000.0) * $"n_shared".cast("double") /
          ($"na" + $"nb" - $"n_shared")).cast("long").as("jaccard_e6"),
        $"n_eq",
        expr(s"(n_eq * 1000000) DIV $H").as("est_e6"))
      .withColumn("diff", abs($"est_e6" - $"jaccard_e6"))
      .select($"source_a", $"source_b", $"n_shared", $"na", $"nb",
        $"jaccard_e6", $"n_eq", $"est_e6",
        ($"diff" <= lit(2L * g) ||
          ($"diff" - lit(2L * g)) * ($"diff" - lit(2L * g)) * lit(H.toLong) <=
            lit(9L) * $"jaccard_e6" * (lit(1000000L) - $"jaccard_e6"))
          .cast("long").as("within"))
      .orderBy($"source_a", $"source_b")
  }

  val q124Sql: String = {
    val H = 64
    val laneSql = (0 until H).map { j =>
      s"min(CAST(('0x' || substr(md5('$j:' || g), 1, 15)) AS BIGINT)) AS h$j"
    }.mkString(",\n       |    ")
    val eqSql = (0 until H).map(j =>
      s"(CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END)").mkString(" + ")
    val g = 1000000L / H
    s"""WITH sh AS (
       |  SELECT DISTINCT source, g.g
       |  FROM (SELECT source, $Shingles3 AS s
       |        FROM (SELECT source, $Toks AS toks FROM documents)) t,
       |       UNNEST(t.s) AS g(g)),
       |sz AS (SELECT source, count(*) AS n_types FROM sh GROUP BY 1),
       |shared AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
       |  FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
       |  GROUP BY 1, 2),
       |sig AS (
       |  SELECT source,
       |    $laneSql
       |  FROM sh GROUP BY source),
       |prs AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST($eqSql AS BIGINT) AS n_eq
       |  FROM sig a JOIN sig b ON a.source < b.source),
       |m AS (
       |  SELECT p.source_a, p.source_b,
       |    COALESCE(s.n_shared, 0) AS n_shared, za.n_types AS na, zb.n_types AS nb,
       |    CAST(floor(1000000.0 * CAST(COALESCE(s.n_shared, 0) AS DOUBLE) /
       |      (za.n_types + zb.n_types - COALESCE(s.n_shared, 0))) AS BIGINT) AS jaccard_e6,
       |    p.n_eq, p.n_eq * 1000000 // $H AS est_e6
       |  FROM prs p
       |  LEFT JOIN shared s ON p.source_a = s.source_a AND p.source_b = s.source_b
       |  JOIN sz za ON p.source_a = za.source
       |  JOIN sz zb ON p.source_b = zb.source)
       |SELECT source_a, source_b, n_shared, na, nb, jaccard_e6, n_eq, est_e6,
       |  CAST(CASE WHEN abs(est_e6 - jaccard_e6) <= ${2 * g}
       |            OR (abs(est_e6 - jaccard_e6) - ${2 * g})
       |               * (abs(est_e6 - jaccard_e6) - ${2 * g}) * $H
       |               <= 9 * jaccard_e6 * (1000000 - jaccard_e6)
       |       THEN 1 ELSE 0 END AS BIGINT) AS within
       |FROM m
       |ORDER BY source_a, source_b""".stripMargin
  }

  // ---------------------------------------------------------------- q115

  /** q115_stratified_weighted — per-stratum weighted sampling without
    * replacement: 20 docs per `lang`, size-weighted, by composing q90's
    * hash-derived Efraimidis–Spirakis priorities (reproducible, RNG-free,
    * certified there) with the bounded-state `graft_topk` aggregate
    * (certified by q113/TopKSpec). q43 strata + q90 weights in one
    * operator — the per-language size-weighted subsample a mixture
    * pipeline draws per epoch.
    *
    * Scale shape: THE showcase for the aggregate — the window/TakeOrdered
    * formulations either sort every row per stratum or only handle one
    * global top-k (q90's TakeOrdered); here a narrow scan computes
    * priorities and the aggregate carries ≤ 20 pairs per (partition,
    * lang) through one exchange. O(strata·k) exchanged, zero sorts of
    * corpus-sized data, any stratum cardinality. */
  def q115StratifiedWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hx = substring(md5($"doc_id".cast("string").cast("binary")), 1, 8)
    val v = conv(hx, 16, 10).cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(4294967296.0)
    val keyE6 = floor(lit(1000000.0) * log(u) / $"n_chars").cast("long")
    Tables.documents(s, dir)
      .filter($"n_chars" > 0)
      .select($"lang", $"doc_id", keyE6.as("key_e6"))
      .groupBy($"lang")
      .agg(call_function("graft_topk", $"key_e6", $"doc_id", lit(20)).as("top"))
      .select($"lang", posexplode($"top"))
      .select($"lang", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("doc_id"), $"col.score".as("key_e6"))
      .orderBy($"lang", $"rank")
  }

  /** q115 oracle: q90's A-ES key text verbatim, ranked per stratum. */
  val q115Sql: String =
    """WITH h AS (
      |  SELECT lang, doc_id, n_chars, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hx
      |  FROM documents WHERE n_chars > 0),
      |k AS (
      |  SELECT lang, doc_id,
      |    CAST(floor(1000000.0 * ln((CAST(('0x' || hx) AS BIGINT) + 0.5) / 4294967296.0) / n_chars) AS BIGINT) AS key_e6
      |  FROM h)
      |SELECT lang, rank, doc_id, key_e6 FROM (
      |  SELECT lang, doc_id, key_e6,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY key_e6 DESC, doc_id) AS BIGINT) AS rank
      |  FROM k) t
      |WHERE rank <= 20
      |ORDER BY lang, rank""".stripMargin

  // ---------------------------------------------------------------- q119

  /** q119_survivorship — dedup SURVIVORSHIP policy: within each candidate
    * near-dup bucket (q27's 16-bit SimHash — different texts can share a
    * bucket, so the choice is real), keep the HIGHEST-QUALITY member by
    * the frozen q75 score, not the first-seen/min-id member q23/q47
    * canonicalize to. This is the decision layer every production dedup
    * actually needs: "which copy survives" is a policy (best quality,
    * newest crawl, preferred source), and min-id is only the degenerate
    * default. Composes two certified pieces verbatim — q27's blocking key
    * and q75's `qualityScored` — and exports the full audit trail
    * (per-member rank context: bucket, score, survivor, kept flag).
    *
    * Determinism: (score_e6 DESC, doc_id) is an integer total order, and
    * `max_by` over the struct (score_e6, −doc_id) realizes exactly it.
    *
    * Scale shape — STRUCTURALLY saturation-proof (r18 verdict asked that
    * this entry either auto-derive its key width like q127 or be shown
    * unable to saturate; it is the latter, by construction): the survivor
    * choice and member count are COMBINABLE aggregates (max_by/count get
    * map-side partial aggregation), and the audit trail comes from joining
    * that k-row-per-bucket aggregate back on the same key — so a
    * pathological bucket (byte-identical docs share the simhash at EVERY
    * width, so no width can split them) costs linear shuffled rows spread
    * across tasks, never a single-task per-bucket sort the way the
    * previous two-window plan did. Width therefore stays a POLICY dial
    * (how coarse a "near-dup bucket" the survivorship scopes over), fixed
    * at the 32-bit the oracle freezes ([[graft.functions.DedupFunctions
    * .simhashWide]]; per-bucket population N/2^bits in expectation;
    * widening only SPLITS buckets — the 16-bit key is the top of the same
    * vote — so groups get strictly finer, never re-shuffled). The hash
    * relation is persisted (24 B/row) so the aggregate and the join-back
    * share one tokenize+hash pass; harnesses drop it after materializing
    * (Bench per-rep cleanup / VerifyDump per-query sweep — q127's cache
    * contract). */
  def q119Survivorship(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, dir)
      .select($"doc_id",
        DedupFunctions.simhashWide(TextFunctions.tokens($"text"), 32).as("simhash"))
    val scored = qualityScored(s, dir).select($"doc_id", $"score_e6")
    val members = sh.join(scored, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = members.groupBy($"simhash").agg(
      count(lit(1)).as("n_members"),
      max_by($"doc_id", struct($"score_e6", -$"doc_id")).as("survivor_id"))
    members.join(buckets, "simhash")
      .select($"doc_id", $"simhash", $"score_e6", $"n_members", $"survivor_id",
        when($"doc_id" === $"survivor_id", lit(1L)).otherwise(lit(0L)).as("kept"))
      .orderBy($"doc_id")
  }

  /** q119 oracle: q27's simhash fragment + q75's scoring text + the
    * survivorship windows. */
  val q119Sql: String =
    s"""WITH b AS (SELECT doc_id, text, $Toks AS toks FROM documents),
       |h AS (SELECT doc_id, CAST(${simhashBitsSqlOf(32)} AS BIGINT) AS simhash
       |      FROM (SELECT doc_id, list_transform(toks, t -> md5(t)) AS hs FROM b)),
       |f AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    $StopRatioSql AS stop_e6,
       |    CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
       |    CAST(len(text) AS DOUBLE) AS nc
       |  FROM b
       |  WHERE len(toks) >= 1),
       |z AS (
       |  SELECT doc_id,
       |    -3.0 +
       |    2.0 * (CAST(least(n_tokens, 400) AS DOUBLE) / 400.0) +
       |    4.0 * (CAST(stop_e6 AS DOUBLE) / 1000000.0) +
       |    2.0 * (nd / n_tokens) +
       |    1.0 * (nc / n_tokens / 10.0) AS z
       |  FROM f),
       |sc AS (
       |  SELECT doc_id,
       |    CAST(floor(1000000.0 / (1.0 + exp(-z))) AS BIGINT) AS score_e6
       |  FROM z),
       |w AS (
       |  SELECT s.doc_id, h.simhash, s.score_e6,
       |    count(*) OVER (PARTITION BY h.simhash) AS n_members,
       |    row_number() OVER (PARTITION BY h.simhash
       |      ORDER BY s.score_e6 DESC, s.doc_id) AS rn,
       |    first_value(s.doc_id) OVER (PARTITION BY h.simhash
       |      ORDER BY s.score_e6 DESC, s.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS survivor_id
       |  FROM sc s JOIN h USING (doc_id))
       |SELECT doc_id, simhash, score_e6,
       |  CAST(n_members AS BIGINT) AS n_members, survivor_id,
       |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM w ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q129

  /** q129_leakage_split — near-dup-cluster-aware train/val/test split: the
    * LEAKAGE GUARD a training pipeline needs before any eval is trustworthy.
    * Splitting documents independently (q43's per-doc hash) puts near-
    * duplicate copies of the same page on both sides of the train/test
    * fence — the eval then scores memorization, not generalization (the
    * contamination mode Lee et al. 2022 measure). The unit of assignment
    * must be the near-dup CLUSTER, so every copy lands in the same split.
    *
    * Composition: q40's certified cluster labels (LSH pair mining +
    * 3-round min-label propagation, hash-gated against exact transitive
    * closure by q99) → q43's md5-bucket discipline applied to the CLUSTER
    * id, not the doc id: `substr(md5(cluster_id), 1, 2)` against hex fences
    * 'cc' (204/256 ≈ 80% train) and 'e6' (+26/256 ≈ 10% val, rest test).
    * Same-cluster ⇒ same bucket ⇒ same split BY CONSTRUCTION — the guard
    * is an algebraic property of the key choice, not a post-hoc repair
    * join, so it costs ZERO work beyond q40's labels (one narrow md5
    * projection; no extra shuffle).
    *
    * Scale: rides q40/q99's bounded label propagation (the 100 TB cluster
    * machinery already measured in SCALE.md); the split itself is
    * scan-speed column algebra and stays deterministic under
    * repartitioning, retries, and corpus growth — adding a crawl can add
    * clusters but never moves an existing cluster across splits. */
  def q129LeakageSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = substring(md5($"cluster_id".cast("string").cast("binary")), 1, 2)
    q40DedupClusters(s, dir)
      .select($"doc_id", $"cluster_id",
        when(bucket < "cc", lit("train"))
          .when(bucket < "e6", lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy($"doc_id")
  }

  /** q129 oracle: q40's WITH chain verbatim + the md5 fence on the label. */
  val q129Sql: String =
    s"""$q40WithChain
       |SELECT doc_id, label AS cluster_id,
       |  CASE WHEN substr(md5(CAST(label AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       |       WHEN substr(md5(CAST(label AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM l3 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q130

  /** q130_bpe_merges — BPE tokenizer-training statistics (one merge
    * iteration of Sennrich et al. 2016): the frequency of every adjacent
    * CHARACTER pair across the corpus, weighted by word frequency, top-20
    * merge candidates. This is the table a byte-pair tokenizer trainer
    * consumes each round — the highest-count pair becomes the next merge.
    *
    * Two-level shape is the entire scale story: the corpus-sized pass is
    * ONE token-keyed count (map-side partial agg collapses each partition
    * to its distinct tokens before the exchange). Everything after runs on
    * the VOCABULARY — pair explosion is O(|vocab| · avg word length),
    * independent of corpus size, exactly why real BPE trainers operate on
    * (word, count) tables rather than raw text. Top-20 is a TakeOrdered
    * partial top-k, no global sort. Counts are exact int64; the
    * (cnt DESC, pair ASC) order is total, so the cut is deterministic. */
  def q130BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, dir)
      .select(explode(TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
    vocab.filter(length($"tok") >= 2)
      .select(explode(transform(sequence(lit(1), length($"tok") - 1),
        i => $"tok".substr(i, lit(2)))).as("pair"), $"n")
      .groupBy($"pair").agg(sum($"n").as("cnt"))
      .orderBy($"cnt".desc, $"pair").limit(20)
  }

  /** q130 oracle: same vocab fold + per-position 2-char slices (1-based
    * char semantics in both engines). */
  val q130Sql: String =
    s"""WITH toks AS (
       |  SELECT unnest($Toks) AS tok FROM documents),
       |vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
       |prs AS (
       |  SELECT unnest([tok[i:i+1] for i in range(1, len(tok))]) AS pair, n
       |  FROM vocab WHERE len(tok) >= 2)
       |SELECT pair, CAST(sum(n) AS BIGINT) AS cnt
       |FROM prs GROUP BY pair
       |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q137

  /** q137_shard_export — the training-data delivery last mile: q55's
    * packed shards EXPORTED to files with a checksummed manifest, the
    * artifact a training job actually consumes (and the only thing that
    * lets a consumer verify, shard by shard, that what it downloaded is
    * what the pipeline packed — the q125/q126 round-trip discipline
    * applied to the delivery format).
    *
    * Each (lang, shard) becomes one JSON record whose `content` is the
    * shard's doc inventory in doc_id order (`id:tokens|id:tokens|…` —
    * deterministic under any partitioning: the order comes from an
    * array_sort over collected structs, not from partition layout). The
    * records are WRITTEN to disk and READ BACK, and the manifest —
    * (lang, shard_id, n_docs, tot_tokens, content_md5) — is computed from
    * the read-back rows, so the gate hashes the full write→read round
    * trip, not just the in-engine plan. The oracle rebuilds the same
    * inventory with an ordered string_agg and the same md5.
    *
    * Scale shape: one (lang, shard) aggregation (shard content is bounded
    * by the 2048-token pack cap, so collect_list state is capped by
    * construction); the export is one file write per shard — at 100 TB
    * the manifest is the natural unit of retry/verification for a
    * delivery of millions of shards. */
  def q137ShardExport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.util.HarnessDirs.newDir("q137")
    val entries = q55PackShards(s, dir)
      .select($"lang", $"shard_id", $"n_tokens",
        struct($"doc_id",
          concat($"doc_id".cast("string"), lit(":"), $"n_tokens".cast("string"))
            .as("entry")).as("e"))
    entries
      .groupBy($"lang", $"shard_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("tot_tokens"),
        concat_ws("|", transform(array_sort(collect_list($"e")),
          x => x.getField("entry"))).as("content"))
      .write.mode("overwrite").json(s"$root/shards")
    s.read
      .schema("lang STRING, shard_id LONG, n_docs LONG, tot_tokens LONG, content STRING")
      .json(s"$root/shards")
      .select($"lang", $"shard_id", $"n_docs", $"tot_tokens",
        md5($"content".cast("binary")).as("content_md5"))
      .orderBy($"lang", $"shard_id")
  }

  /** q137 oracle: q55's packing + an ordered string_agg inventory + md5 —
    * the export round trip must be invisible in the manifest. */
  val q137Sql: String =
    s"""WITH counted AS (
       |  SELECT doc_id, lang, CAST(len($Toks) AS BIGINT) AS n_tokens
       |  FROM documents),
       |cum AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
       |  FROM counted),
       |sh AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(floor(tokens_before / 2048) AS BIGINT) AS shard_id
       |  FROM cum)
       |SELECT lang, shard_id, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
       |  md5(string_agg(doc_id || ':' || n_tokens, '|' ORDER BY doc_id)) AS content_md5
       |FROM sh GROUP BY lang, shard_id
       |ORDER BY lang, shard_id""".stripMargin

  // ---------------------------------------------------------------- q181

  /** q181_auc — exact ROC-AUC via the tie-corrected Mann–Whitney rank
    * statistic (Mann & Whitney 1947; AUC ≡ U/(P·N), Hanley–McNeil 1982):
    * how well the stopword ratio separates English from non-English
    * documents — the model-evaluation family (classifier AUC, ranking
    * quality) computed EXACTLY, no trapezoid approximation.
    *
    * Engine form: AUC needs global ranks, which naively means a global
    * sort. Instead the corpus folds to per-SCORE (positive, negative)
    * counts — the score is the e6-grid stop ratio, a bounded domain —
    * and U decomposes over score groups: U2 = Σ_g 2·np_g·negBefore_g +
    * np_g·nn_g (doubled to keep the ½-tie credit integral). negBefore
    * splits into a bucket prefix (window over ≤101 bucket rows) plus a
    * within-bucket prefix (window PARTITIONED by bucket — parallel, the
    * q152 bucket-decomposed-prefix discipline); no corpus-sized relation
    * ever enters a single-partition window. All counts exact longs; the
    * final AUC is ONE double division floored onto e6 (int64-safe to
    * ~10⁸ docs per class; decimal widening is the documented escape). */
  def q181Auc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .select($"lang", TextFunctions.tokens($"text").as("toks"))
      .select(when($"lang" === "en", 1L).otherwise(0L).as("pos"),
        stopRatioE6($"toks").as("score"))
      .filter($"score".isNotNull)
    val g = scored.groupBy($"score")
      .agg(sum($"pos").as("np"), (count(lit(1)) - sum($"pos")).as("nn"))
      .withColumn("bucket", expr("score div 10000"))
    val bPre = g.groupBy($"bucket").agg(sum($"nn").as("bn"))
      .withColumn("negBeforeBucket",
        coalesce(sum($"bn").over(
          Window.orderBy($"bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select($"bucket", $"negBeforeBucket")
    val wIn = Window.partitionBy($"bucket").orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.join(broadcast(bPre), "bucket")
      .withColumn("neg_before",
        $"negBeforeBucket" + coalesce(sum($"nn").over(wIn), lit(0L)))
      .agg(sum($"np").as("p"), sum($"nn").as("n"),
        sum(lit(2L) * $"np" * $"neg_before" + $"np" * $"nn").as("u2"))
      .select($"p", $"n", $"u2",
        floor($"u2" / (lit(2.0) * $"p" * $"n") * 1000000 + 0.5)
          .cast("long").as("auc_e6"))
  }

  /** q181 oracle: the same tie-corrected U statistic with a single
    * declarative prefix — DuckDB needs no bucket split at oracle scale. */
  val q181Sql: String =
    s"""WITH s AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
       |         $StopRatioSql AS score
       |  FROM (SELECT lang, $Toks AS toks FROM documents)),
       |s2 AS (SELECT pos, score FROM s WHERE score IS NOT NULL),
       |g AS (SELECT score, CAST(sum(pos) AS BIGINT) AS np,
       |             CAST(count(*) - sum(pos) AS BIGINT) AS nn
       |      FROM s2 GROUP BY 1),
       |pre AS (
       |  SELECT score, np, nn,
       |    COALESCE(sum(nn) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_before
       |  FROM g),
       |u AS (SELECT CAST(sum(2 * np * neg_before + np * nn) AS BIGINT) AS u2,
       |             CAST(sum(np) AS BIGINT) AS p, CAST(sum(nn) AS BIGINT) AS n
       |      FROM pre)
       |SELECT p, n, u2,
       |  CAST(floor(CAST(u2 AS DOUBLE) / (2.0 * p * n) * 1000000 + 0.5)
       |       AS BIGINT) AS auc_e6
       |FROM u""".stripMargin

  // ---------------------------------------------------------------- q186

  /** q186_stratified_split — stratified train/val/test assignment with
    * EXACT largest-remainder quotas per stratum (Neyman-style
    * stratification meets the q176 Hamilton apportionment): every
    * document lands in exactly one split, each (lang, size-bucket)
    * stratum contributes 80/10/10 to the seat, and conservation
    * (Σ splits = stratum size) holds by construction — the property
    * naive per-row `hash % 10 < 8` sampling only hits in expectation.
    * Next to q129 (which fences LEAKAGE clusters), this is the quota
    * half of the split toolbox a training pipeline needs.
    *
    * Determinism: assignment order within a stratum is (md5 hash,
    * doc_id) — the established hex-parse idiom both engines share —
    * so the split is a pure function of the corpus, reproducible on
    * re-run and auditable row by row. Quotas are ALL integer
    * arithmetic (floor shares, remainder ranks, fixed split-order
    * tie-break): no float anywhere.
    *
    * Scale shape: ranks within a stratum are BUCKET-DECOMPOSED (the
    * q182/q152 discipline): the top-8-hex-bits bucket is monotone in
    * the hash, so prefix counts come from a |strata|·256-row window
    * and the corpus only meets (stratum, bucket)-PARTITIONED
    * row_numbers — a mega-stratum never funnels through one
    * partition. The quota table (3 rows per stratum) broadcasts. */
  def q186StratifiedSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select($"doc_id",
      concat($"lang", lit("/"), expr("n_chars div 1000").cast("string"))
        .as("stratum"),
      conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .withColumn("bucket", expr("h div 4503599627370496")) // 2^52: top 8 bits
    val sz = d.groupBy($"stratum").agg(count(lit(1)).as("n"))
    val splits = Seq(("train", 8L), ("val", 1L), ("test", 1L))
      .toDF("split", "w")
      .withColumn("ord", when($"split" === "train", 0)
        .when($"split" === "val", 1).otherwise(2))
    val q = sz.crossJoin(splits)
      .withColumn("fl", expr("(n * w) div 10"))
      .withColumn("rem", expr("(n * w) % 10"))
    val lo = q.groupBy($"stratum")
      .agg((first($"n") - sum($"fl")).as("leftover"))
    val wRem = Window.partitionBy($"stratum").orderBy($"rem".desc, $"split")
    val quotas = q.join(lo, "stratum")
      .withColumn("quota", $"fl" +
        when(row_number().over(wRem) <= $"leftover", 1L).otherwise(0L))
    val wOrd = Window.partitionBy($"stratum").orderBy($"ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = quotas
      .withColumn("lo_b", coalesce(sum($"quota").over(wOrd), lit(0L)))
      .select($"stratum", $"split", $"quota", $"lo_b")
    val wPre = Window.partitionBy($"stratum").orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bpre = d.groupBy($"stratum", $"bucket").agg(count(lit(1)).as("bn"))
      .withColumn("nBefore", coalesce(sum($"bn").over(wPre), lit(0L)))
      .select($"stratum", $"bucket", $"nBefore")
    val wIn = Window.partitionBy($"stratum", $"bucket").orderBy($"h", $"doc_id")
    val rk = d.join(broadcast(bpre), Seq("stratum", "bucket"))
      .withColumn("i", $"nBefore" + row_number().over(wIn))
    rk.join(broadcast(bounds),
        rk("stratum") === bounds("stratum") &&
          $"i" > $"lo_b" && $"i" <= $"lo_b" + $"quota")
      .select($"doc_id", rk("stratum").as("stratum"), $"split")
      .orderBy($"doc_id")
  }

  /** q186 oracle: declarative global per-stratum ranks + the identical
    * integer quota pipeline. */
  val q186Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    lang || '/' || CAST(n_chars // 1000 AS VARCHAR) AS stratum,
      |    CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |         AS BIGINT) AS h
      |  FROM documents),
      |sz AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      |q AS (
      |  SELECT stratum, n, s.split, s.w,
      |    (n * s.w) // 10 AS fl, (n * s.w) % 10 AS rem
      |  FROM sz CROSS JOIN (SELECT unnest(['train','val','test']) AS split,
      |                             unnest([8, 1, 1]) AS w) s),
      |lo AS (SELECT stratum, CAST(n - sum(fl) AS BIGINT) AS leftover
      |       FROM q GROUP BY stratum, n),
      |qr AS (
      |  SELECT q.stratum, q.split, q.fl +
      |    CASE WHEN row_number() OVER (PARTITION BY q.stratum
      |           ORDER BY q.rem DESC, q.split) <= lo.leftover
      |         THEN 1 ELSE 0 END AS quota
      |  FROM q JOIN lo USING (stratum)),
      |b AS (
      |  SELECT stratum, split, quota,
      |    CAST(coalesce(sum(quota) OVER (PARTITION BY stratum
      |      ORDER BY CASE split WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS lo_b
      |  FROM qr),
      |rk AS (
      |  SELECT doc_id, stratum,
      |    row_number() OVER (PARTITION BY stratum ORDER BY h, doc_id) AS i
      |  FROM d)
      |SELECT rk.doc_id, rk.stratum, b.split
      |FROM rk JOIN b ON b.stratum = rk.stratum
      |  AND rk.i > b.lo_b AND rk.i <= b.lo_b + b.quota
      |ORDER BY rk.doc_id""".stripMargin

  // ---------------------------------------------------------------- q190

  /** q190_blocklist — domain blocklist filtering with WILDCARD-SUFFIX
    * matching (`dom13.t4` blocks every subdomain of it; `t6` blocks the
    * whole TLD): the content-filtering pass every crawl-derived corpus
    * runs (URL/domain deny lists), whose join shape SQL states as a
    * quadratic `LIKE` join. Domains are synthesized deterministically
    * from doc_id (the q138/q164 synthesized-dimension discipline —
    * the corpus carries no real URLs); the blocklist is a literal
    * policy table.
    *
    * Engine form: a suffix match is a PREFIX match on the reversed
    * string, so the join blocks on the reversed-suffix key (first 2
    * chars of the reversed domain = the TLD tail) — an equi-join
    * against the BROADCAST policy list with a residual exact/suffix
    * verify, never a corpus × patterns LIKE cross. Per-doc work =
    * |patterns sharing the TLD block| (the blocklist is O(1) policy
    * config, so fixed block count is correct here — unlike q164's
    * registry, it does not grow with the corpus). The most specific
    * (longest, then lexicographic) pattern wins per doc — a 1-row
    * window over the ≤|patterns| matches per doc. */
  def q190Blocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select($"doc_id",
      concat(lit("sub"), ($"doc_id" % 3).cast("string"),
        lit(".dom"), ($"doc_id" % 97).cast("string"),
        lit(".t"), ($"doc_id" % 7).cast("string")).as("domain"))
      .withColumn("blk", substring(reverse($"domain"), 1, 2))
    val bl = Seq("sub0.dom0.t0", "sub1.dom31.t5", "dom13.t4", "dom77.t0",
        "dom5.t2", "t6", "dom90.t6").toDF("pattern")
      .withColumn("blk", substring(reverse($"pattern"), 1, 2))
    val w = Window.partitionBy($"doc_id")
      .orderBy(length($"pattern").desc, $"pattern")
    d.join(broadcast(bl), "blk")
      .filter($"domain" === $"pattern" ||
        $"domain".endsWith(concat(lit("."), $"pattern")))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"doc_id", $"domain", $"pattern".as("matched"))
      .orderBy($"doc_id")
  }

  /** q190 oracle: the declarative exact-or-suffix LIKE join. */
  val q190Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    'sub' || CAST(doc_id % 3 AS VARCHAR) ||
      |    '.dom' || CAST(doc_id % 97 AS VARCHAR) ||
      |    '.t' || CAST(doc_id % 7 AS VARCHAR) AS domain
      |  FROM documents),
      |bl AS (SELECT * FROM (VALUES ('sub0.dom0.t0'), ('sub1.dom31.t5'),
      |        ('dom13.t4'), ('dom77.t0'), ('dom5.t2'), ('t6'),
      |        ('dom90.t6')) AS v(pattern)),
      |m AS (
      |  SELECT d.doc_id, d.domain, bl.pattern
      |  FROM d JOIN bl ON d.domain = bl.pattern
      |     OR d.domain LIKE '%.' || bl.pattern),
      |best AS (
      |  SELECT doc_id, domain, pattern,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY len(pattern) DESC, pattern) AS rn
      |  FROM m)
      |SELECT doc_id, domain, pattern AS matched
      |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q192

  /** q192_phrase_query — positional-index phrase search (the classic
    * IR adjacency query, Manning/Raghavan/Schütze ch. 2): for each
    * two-term phrase, the documents and occurrence counts where the
    * terms appear ADJACENT in order — what q73's BM25 bag-of-words
    * retrieval cannot express, and the reason real inverted indexes
    * store positions.
    *
    * Engine form: `posexplode` builds the positional postings
    * relation once; the phrase table (policy-sized) broadcasts onto
    * the first-term postings; the adjacency check is ONE
    * co-partitioned self-join on (doc, pos+1) — output-proportional,
    * never a corpus cross. The fold to |phrases| rows is
    * map-side-combinable.
    *
    * Scale shape: postings are |tokens| rows — linear in corpus
    * bytes, the same relation an index build materializes anyway; at
    * 100 TB the (doc_id, pos) join key partitions evenly by
    * construction (positions are within-doc). Counts are exact longs. */
  def q192PhraseQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables.documents(s, dir)
      .select($"doc_id", posexplode(TextFunctions.tokens($"text")))
      .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("term"))
    val ph = Seq(("key agg", "key", "agg"), ("row scan", "row", "scan"),
        ("slow fast", "slow", "fast"), ("table value", "table", "value"),
        ("part hash", "part", "hash")).toDF("phrase", "t1", "t2")
    // both sides semi-filter on the broadcast term lists BEFORE the
    // adjacency shuffle: only ~|matching tokens| rows move, not the
    // whole postings relation
    val t2s = ph.select($"t2".as("term2")).distinct()
    val rt = t.toDF("d2", "p2", "term2").join(broadcast(t2s), "term2")
    t.join(broadcast(ph), $"term" === $"t1")
      .select($"phrase", $"doc_id", $"pos", $"t2")
      .join(rt,
        $"d2" === $"doc_id" && $"p2" === $"pos" + 1 && $"term2" === $"t2")
      .groupBy($"phrase")
      .agg(countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
      .orderBy($"phrase")
  }

  /** q192 oracle: the same postings relation via the shared tokenizer
    * fragment, adjacency stated declaratively. */
  val q192Sql: String =
    s"""WITH d AS (SELECT doc_id, $Toks AS toks FROM documents),
       |t AS (
       |  SELECT doc_id, unnest(toks) AS term,
       |         generate_subscripts(toks, 1) AS pos
       |  FROM d),
       |ph AS (SELECT * FROM (VALUES ('key agg','key','agg'),
       |        ('row scan','row','scan'), ('slow fast','slow','fast'),
       |        ('table value','table','value'),
       |        ('part hash','part','hash')) AS v(phrase, t1, t2)),
       |m AS (
       |  SELECT ph.phrase, a.doc_id
       |  FROM ph JOIN t a ON a.term = ph.t1
       |  JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
       |          AND b.term = ph.t2)
       |SELECT phrase, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_occ
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q199

  /** q199_trending_terms — week-over-week trending-term detection (the
    * Kleinberg-burst family's batch staple): per week, the top-3 terms
    * by document-frequency growth over the prior week, floored onto
    * e6, with a prior-week support floor (≥ 3 docs) so division noise
    * never ranks. Document dates are synthesized deterministically
    * from doc_id (the q138/q190 discipline — the corpus carries no
    * timestamps). The content-intelligence query an editorial or
    * drift-watch layer runs next to q88's distribution-level KL.
    *
    * Scale shape: distinct-terms explode → one map-side fold to
    * |weeks|·|vocabulary| rows; the growth self-join and top-3 windows
    * run on that vocabulary-bounded relation, partitioned by week. */
  def q199TrendingTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tw = Tables.documents(s, dir)
      .select(expr("(doc_id % 90) div 7").as("week"),
        explode(array_distinct(TextFunctions.tokens($"text"))).as("term"))
    val wc = tw.groupBy($"week", $"term").agg(count(lit(1)).as("docs"))
    val w = Window.partitionBy($"week").orderBy($"growth_e6".desc, $"term")
    wc.join(wc.toDF("pw", "pterm", "prev_docs"),
        $"pterm" === $"term" && $"pw" === $"week" - 1 && $"prev_docs" >= 3)
      .withColumn("growth_e6",
        floor($"docs".cast("double") / $"prev_docs" * 1000000 + 0.5)
          .cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"week", $"rank", $"term", $"docs", $"prev_docs", $"growth_e6")
      .orderBy($"week", $"rank")
  }

  /** q199 oracle: the same weekly document-frequency fold and growth
    * ranks via the shared tokenizer fragment. */
  val q199Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, $Toks AS toks FROM documents),
       |tw AS (
       |  SELECT (doc_id % 90) // 7 AS week,
       |         unnest(list_distinct(toks)) AS term
       |  FROM d),
       |wc AS (SELECT week, term, CAST(count(*) AS BIGINT) AS docs
       |       FROM tw GROUP BY 1, 2),
       |g AS (
       |  SELECT cur.week, cur.term, cur.docs, prev.docs AS prev_docs,
       |    CAST(floor(CAST(cur.docs AS DOUBLE) / prev.docs * 1000000 + 0.5)
       |         AS BIGINT) AS growth_e6
       |  FROM wc cur JOIN wc prev
       |    ON prev.term = cur.term AND prev.week = cur.week - 1
       |   AND prev.docs >= 3),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY week
       |        ORDER BY growth_e6 DESC, term) AS rn FROM g)
       |SELECT week, rn AS rank, term, docs, prev_docs, growth_e6
       |FROM rk WHERE rn <= 3 ORDER BY week, rank""".stripMargin

  // ---------------------------------------------------------------- q208

  /** q208_calibration — calibration / reliability curve: model score
    * binned into deciles of the score RANGE, observed positive rate vs
    * mean predicted score per bin — the third leg of the model-eval
    * triad (q181 discrimination, q188 targeting lift, THIS one answers
    * "does 0.8 mean 80%?" — the property ranking metrics cannot see).
    * Score = a logistic of document length, response = is-English.
    *
    * One codegen scan folds the corpus to ≤ 10 bin rows map-side; the
    * score is the established exp/e6 idiom; two divisions per bin. */
  def q208Calibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sc = Tables.documents(s, dir).select(
      floor(lit(1000000.0) / (lit(1.0) +
        exp(-($"n_chars".cast("double") / 400.0 - 1.5)))).cast("long")
        .as("score_e6"),
      when($"lang" === "en", 1L).otherwise(0L).as("pos"))
    sc.groupBy(expr("score_e6 div 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"),
        sum($"score_e6").as("s"))
      .select($"bin", $"n", $"n_pos",
        floor($"s".cast("double") / $"n" + 0.5).cast("long")
          .as("mean_score_e6"),
        floor($"n_pos".cast("double") / $"n" * 1000000 + 0.5).cast("long")
          .as("obs_rate_e6"))
      .orderBy($"bin")
  }

  /** q208 oracle: identical scoring and bin folds. */
  val q208Sql: String =
    """WITH sc AS (
      |  SELECT doc_id,
      |    CAST(floor(1000000.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE)
      |         / 400.0 - 1.5)))) AS BIGINT) AS score_e6,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents),
      |b AS (
      |  SELECT score_e6 // 100000 AS bin, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(pos) AS BIGINT) AS n_pos,
      |    CAST(sum(score_e6) AS BIGINT) AS s
      |  FROM sc GROUP BY 1)
      |SELECT bin, n, n_pos,
      |  CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS mean_score_e6,
      |  CAST(floor(CAST(n_pos AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT)
      |    AS obs_rate_e6
      |FROM b ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q209

  /** q209_ks_test — exact two-sample Kolmogorov–Smirnov statistic
    * (source cohort A = src0–9 vs B = src10–19 on the length
    * distribution): D = max |F₁ − F₂|, kept EXACT by cross-multiplying
    * through n₁·n₂ — the integer |f₁·n₂ − f₂·n₁| argmax, one division
    * at the end. Completes the drift family with a nonparametric TEST:
    * q88's KL and q131's PSI measure divergence, KS gives the
    * statistic supremum and where it occurs.
    *
    * Scale shape: one fold to the |value domain| relation, one
    * calendar... domain-bounded prefix window, one argmax. Int64 bound
    * f·n < 2⁶³ to ~3×10⁹ rows per cohort; decimal widening is the
    * escape. */
  def q209KsTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select($"n_chars".as("v"),
      when(substring($"source", 4, 10).cast("long") < 10, "A").otherwise("B")
        .as("g"))
    val n = d.agg(
      sum(when($"g" === "A", 1L).otherwise(0L)).as("n1"),
      sum(when($"g" === "B", 1L).otherwise(0L)).as("n2"))
    val c = d.groupBy($"v").agg(
      sum(when($"g" === "A", 1L).otherwise(0L)).as("c1"),
      sum(when($"g" === "B", 1L).otherwise(0L)).as("c2"))
    val wCum = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)
    val wBest = Window.orderBy($"dnum".desc, $"v")
    c.withColumn("f1", sum($"c1").over(wCum))
      .withColumn("f2", sum($"c2").over(wCum))
      .crossJoin(broadcast(n))
      .withColumn("dnum", abs($"f1" * $"n2" - $"f2" * $"n1"))
      .withColumn("rn", row_number().over(wBest)).filter($"rn" === 1)
      .select($"n1", $"n2", $"v".as("argmax_value"), $"dnum".as("d_scaled"),
        floor($"dnum".cast("double") / ($"n1" * $"n2") * 1000000 + 0.5)
          .cast("long").as("d_e6"))
  }

  /** q209 oracle: identical integer KS supremum. */
  val q209Sql: String =
    """WITH d AS (
      |  SELECT n_chars AS v,
      |    CASE WHEN CAST(substr(source, 4) AS BIGINT) < 10
      |         THEN 'A' ELSE 'B' END AS g
      |  FROM documents),
      |n AS (SELECT CAST(sum(CASE WHEN g='A' THEN 1 ELSE 0 END) AS BIGINT)
      |        AS n1,
      |      CAST(sum(CASE WHEN g='B' THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |      FROM d),
      |c AS (
      |  SELECT v, CAST(sum(CASE WHEN g='A' THEN 1 ELSE 0 END) AS BIGINT)
      |         AS c1,
      |       CAST(sum(CASE WHEN g='B' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM d GROUP BY 1),
      |cum AS (
      |  SELECT v,
      |    CAST(sum(c1) OVER (ORDER BY v
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS f1,
      |    CAST(sum(c2) OVER (ORDER BY v
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS f2
      |  FROM c),
      |ks AS (
      |  SELECT v, abs(f1 * n.n2 - f2 * n.n1) AS dnum, n.n1, n.n2
      |  FROM cum CROSS JOIN n),
      |best AS (SELECT *, row_number() OVER (ORDER BY dnum DESC, v) AS rn
      |         FROM ks)
      |SELECT n1, n2, v AS argmax_value, dnum AS d_scaled,
      |  CAST(floor(CAST(dnum AS DOUBLE) / (n1 * n2) * 1000000 + 0.5)
      |       AS BIGINT) AS d_e6
      |FROM best WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q210

  /** q210_negative_sampling — deterministic negative sampling for
    * contrastive training: per anchor doc, 16 hash-walk candidates
    * ((a·31 + i·7919) mod N), rejected if self or an exact duplicate
    * (fingerprint match), first 4 survivors kept in walk order. The
    * contrastive-pairs builder every embedding-training pipeline runs —
    * and because the walk is pure arithmetic, the sample is
    * reproducible and auditable (the property `rand()` negatives
    * forfeit).
    *
    * Scale shape: anchors × 16 is anchor-proportional; the candidate
    * resolution and duplicate rejection are two co-partitioned joins
    * on doc_id; the keep-4 window partitions per anchor. */
  def q210NegativeSampling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val nn = docs.agg(count(lit(1)).as("n"))
    val fp = docs.select($"doc_id", md5(trim($"text")).as("f"))
    val anchors = fp.filter($"doc_id" < 50).select($"doc_id".as("a"), $"f".as("fa"))
    val cand = anchors.crossJoin(broadcast(nn))
      .withColumn("i", explode(array((0 until 16).map(lit(_)): _*)))
      .select($"a", $"fa", $"i".cast("long").as("i"),
        (($"a" * 31 + $"i" * 7919) % $"n").as("c"))
    val w = Window.partitionBy($"a").orderBy($"i")
    cand.join(fp.toDF("cid", "fc"), $"cid" === $"c")
      .filter($"c" =!= $"a" && $"fc" =!= $"fa")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 4)
      .select($"a".as("doc_id"), $"rank", $"c".as("negative"))
      .orderBy($"doc_id", $"rank")
  }

  /** q210 oracle: the identical hash walk and rejection rules. */
  val q210Sql: String =
    """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |fp AS (SELECT doc_id, md5(trim(text)) AS f FROM documents),
      |anchors AS (SELECT doc_id AS a, f AS fa FROM fp WHERE doc_id < 50),
      |cand AS (
      |  SELECT anchors.a, anchors.fa, CAST(u.i AS BIGINT) AS i,
      |         (anchors.a * 31 + u.i * 7919) % nn.n AS c
      |  FROM anchors CROSS JOIN unnest(range(0, 16)) AS u(i) CROSS JOIN nn),
      |ok AS (
      |  SELECT cand.a, cand.i, cand.c
      |  FROM cand JOIN fp ON fp.doc_id = cand.c
      |  WHERE cand.c <> cand.a AND fp.f <> cand.fa),
      |pick AS (SELECT a, i, c,
      |         CAST(row_number() OVER (PARTITION BY a ORDER BY i) AS BIGINT)
      |           AS rn
      |         FROM ok)
      |SELECT a AS doc_id, rn AS rank, c AS negative
      |FROM pick WHERE rn <= 4 ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------- q219

  /** q219_pii_redact — PII detection + redaction over the corpus (the
    * compliance pass every training-data pipeline runs before anything
    * else sees the text): emails, US-phone shapes, and SSN shapes are
    * counted and replaced with typed placeholders, and the gate
    * hash-pins the md5 of every REDACTED document — so the oracle
    * proves byte-identical redaction output, not just matching counts.
    *
    * The synthetic corpus carries no organic PII, so deterministic PII
    * is PLANTED (the q218 discipline — known ground truth makes recall
    * provable): doc_id%7==0 gains an email, %11==0 a phone, %13==0 an
    * SSN shape. Patterns are plain character classes (identical under
    * Java regex and RE2); redaction order is fixed (email, phone, SSN)
    * in both engines.
    *
    * Scale shape: one embarrassingly-parallel projection pass — three
    * codegen'd regexps per document, no shuffle before the final
    * order. At 100 TB this is scan-bound, exactly as it should be. */
  def q219PiiRedact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val ssnRe   = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
    val planted = Tables.documents(s, dir).select($"doc_id", concat($"text",
      when($"doc_id" % 7 === 0,
        concat(lit(" contact user"), $"doc_id", lit("@example.com")))
        .otherwise(lit("")),
      when($"doc_id" % 11 === 0,
        concat(lit(" call 415-555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when($"doc_id" % 13 === 0,
        concat(lit(" id 987-65-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit(""))).as("t"))
    planted.select($"doc_id",
        regexp_count($"t", lit(emailRe)).cast("long").as("n_email"),
        regexp_count($"t", lit(phoneRe)).cast("long").as("n_phone"),
        regexp_count(regexp_replace($"t", phoneRe, "<PHONE>"), lit(ssnRe))
          .cast("long").as("n_ssn"),
        md5(regexp_replace(regexp_replace(regexp_replace($"t",
          emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ssnRe, "<SSN>")
          .cast("binary")).as("redacted_md5"))
      .filter($"n_email" + $"n_phone" + $"n_ssn" > 0)
      .orderBy($"doc_id")
  }

  /** q219 oracle: identical planting, patterns, and redaction order
    * (DuckDB regexp_replace needs the explicit 'g' flag; Spark's is
    * global by default — the one cross-engine asymmetry to pin). */
  val q219Sql: String =
    """WITH planted AS (
      |  SELECT doc_id, text
      |    || CASE WHEN doc_id % 7 = 0
      |         THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      |    || CASE WHEN doc_id % 11 = 0
      |         THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |         ELSE '' END
      |    || CASE WHEN doc_id % 13 = 0
      |         THEN ' id 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |         ELSE '' END AS t
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      |    CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
      |    CAST(len(regexp_extract_all(
      |      regexp_replace(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
      |      '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_ssn,
      |    md5(regexp_replace(regexp_replace(regexp_replace(t,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
      |      '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g')) AS redacted_md5
      |  FROM planted)
      |SELECT * FROM scored
      |WHERE n_email + n_phone + n_ssn > 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q220

  /** q220_decontam — eval-set decontamination by exact word-5-gram
    * overlap (the GPT-3/PaLM-style benchmark-contamination check): eval
    * docs (doc_id%50==0) are scored by the fraction of their distinct
    * 5-gram shingles that also appear anywhere in the training split
    * (everything else). The "is my test set leaked into my training
    * corpus" audit, run before every evaluation claim.
    *
    * Engine form: eval shingles explode to (doc, shingle) distinct
    * pairs; train shingles to a distinct shingle set; one left join
    * counts the hits. Scale shape: the train side dominates — at
    * 100 TB you hash shingles to 64-bit, partition by shingle hash,
    * and map-side-distinct before the exchange (the shingle set is
    * corpus-sized but the JOIN output is eval-sized); the eval side is
    * tiny by construction and never broadcasts the train side. */
  def q220Decontam(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = TextFunctions.tokens($"text")
    val withToks = Tables.spread(Tables.documents(s, dir)
        .select($"doc_id", $"text"), $"doc_id") // see Tables.spread scaladoc
      .withColumn("toks", toks)
      .select($"doc_id", $"toks")
      .withColumn("sh", when(size($"toks") < 5, array().cast("array<string>"))
        .otherwise(expr(
          "transform(sequence(1, size(toks) - 4), i -> concat_ws(' ', slice(toks, i, 5)))")))
    val pairs = withToks.select($"doc_id", explode(array_distinct($"sh")).as("sh"))
    val evalSh = pairs.filter($"doc_id" % 50 === 0)
    val trainSh = pairs.filter($"doc_id" % 50 =!= 0).select($"sh").distinct()
    val hits = evalSh.join(trainSh.withColumnRenamed("sh", "tsh"),
        $"sh" === $"tsh", "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"tsh".isNotNull, 1L).otherwise(0L)).as("n_hit"))
    hits.select($"doc_id", $"n_shingles", $"n_hit",
        floor($"n_hit".cast("double") / $"n_shingles" * 1000000 + 0.5)
          .cast("long").as("contam_e6"))
      .orderBy($"doc_id")
  }

  /** q220 oracle: identical shingling (the [[Toks]] empty-doc rule),
    * distinct sets, and hit fold. */
  val q220Sql: String =
    s"""WITH tok AS (SELECT doc_id, $Toks AS toks FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(toks) < 5 THEN []::VARCHAR[]
      |         ELSE [list_aggregate(toks[i:i+4], 'string_agg', ' ')
      |               for i in range(1, len(toks) - 3)] END)) AS sh
      |  FROM tok),
      |ev AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
      |tr AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 <> 0),
      |hits AS (
      |  SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
      |    CAST(sum(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_hit
      |  FROM ev LEFT JOIN tr ON ev.sh = tr.sh
      |  GROUP BY 1)
      |SELECT doc_id, n_shingles, n_hit,
      |  CAST(floor(CAST(n_hit AS DOUBLE) / n_shingles * 1000000 + 0.5)
      |    AS BIGINT) AS contam_e6
      |FROM hits ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q221

  /** q221_url_canonical — URL canonicalization + dedup (the crawl-
    * ingestion step that collapses tracking-param and fragment variants
    * before any content dedup runs): lowercase scheme/host, strip a
    * leading `www.`, drop the fragment, drop `utm_*` params, sort the
    * survivors — then count how many raw variants collapse onto each
    * canonical form. Synthetic URLs are built deterministically from
    * the order ledger (mixed-case host, shuffled params, optional
    * fragment), so the collapse ratio is a known ground truth.
    *
    * Scale shape: canonicalization is a pure projection (split/filter/
    * sort over short in-row arrays — no explode); the dedup is one
    * hash aggregation on the canonical string. At 100 TB: scan-bound
    * projection + one exchange keyed by canonical URL. */
  def q221UrlCanonical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val url = concat(lit("HTTP://WWW.Shop"), ($"o_custkey" % 5),
      lit(".COM/item/"), ($"o_orderkey" % 100),
      lit("?utm_source=feed"), ($"o_orderkey" % 3),
      lit("&ref="), ($"o_orderkey" % 7),
      lit("&id="), ($"o_orderkey" % 50),
      when($"o_orderkey" % 2 === 0, lit("#top")).otherwise(lit("")))
    val o = Tables.spread(Tables.orders(s, dir) // see Tables.spread scaladoc
      .select($"o_orderkey", $"o_custkey"), $"o_orderkey")
      .select($"o_orderkey", url.as("url"))
      .withColumn("u1", split_part($"url", lit("#"), lit(1)))
      .withColumn("scheme", lower(split_part($"u1", lit("://"), lit(1))))
      .withColumn("rest", split_part($"u1", lit("://"), lit(2)))
      .withColumn("hostraw", split_part($"rest", lit("/"), lit(1)))
      .withColumn("host",
        regexp_replace(lower($"hostraw"), "^www\\.", ""))
      .withColumn("pathq", $"rest".substr(length($"hostraw") + 1, lit(1 << 20)))
      .withColumn("path", split_part($"pathq", lit("?"), lit(1)))
      .withColumn("query",
        when(instr($"pathq", "?") === 0, lit(""))
          .otherwise(substring_index($"pathq", "?", -1)))
      .withColumn("keep", array_sort(expr(
        "filter(CASE WHEN query = '' THEN array() ELSE split(query, '&') END," +
          " p -> NOT startswith(p, 'utm_'))")))
      .withColumn("canon", concat($"scheme", lit("://"), $"host", $"path",
        when(size($"keep") > 0, concat(lit("?"), concat_ws("&", $"keep")))
          .otherwise(lit(""))))
    o.groupBy($"canon")
      .agg(count(lit(1)).as("n_variants"), min($"o_orderkey").as("first_key"))
      .orderBy($"canon")
  }

  /** q221 oracle: identical construction and canonicalization chain. */
  val q221Sql: String =
    """WITH raw AS (
      |  SELECT o_orderkey, 'HTTP://WWW.Shop' || (o_custkey % 5)
      |    || '.COM/item/' || (o_orderkey % 100)
      |    || '?utm_source=feed' || (o_orderkey % 3)
      |    || '&ref=' || (o_orderkey % 7)
      |    || '&id=' || (o_orderkey % 50)
      |    || CASE WHEN o_orderkey % 2 = 0 THEN '#top' ELSE '' END AS url
      |  FROM orders),
      |parts AS (
      |  SELECT o_orderkey, split_part(url, '#', 1) AS u1 FROM raw),
      |sp AS (
      |  SELECT o_orderkey, lower(split_part(u1, '://', 1)) AS scheme,
      |         split_part(u1, '://', 2) AS rest
      |  FROM parts),
      |hp AS (
      |  SELECT o_orderkey, scheme, split_part(rest, '/', 1) AS hostraw,
      |         substr(rest, len(split_part(rest, '/', 1)) + 1) AS pathq
      |  FROM sp),
      |pq AS (
      |  SELECT o_orderkey, scheme,
      |         regexp_replace(lower(hostraw), '^www\.', '') AS host,
      |         split_part(pathq, '?', 1) AS path,
      |         CASE WHEN strpos(pathq, '?') = 0 THEN ''
      |              ELSE split_part(pathq, '?', 2) END AS query
      |  FROM hp),
      |canon AS (
      |  SELECT o_orderkey, scheme || '://' || host || path ||
      |    CASE WHEN len(keep) > 0
      |         THEN '?' || array_to_string(keep, '&') ELSE '' END AS canon
      |  FROM (SELECT *, list_sort(list_filter(
      |          CASE WHEN query = '' THEN []::VARCHAR[]
      |               ELSE string_split(query, '&') END,
      |          p -> NOT starts_with(p, 'utm_'))) AS keep
      |        FROM pq))
      |SELECT canon, CAST(count(*) AS BIGINT) AS n_variants,
      |       CAST(min(o_orderkey) AS BIGINT) AS first_key
      |FROM canon GROUP BY 1 ORDER BY canon""".stripMargin

  // ---------------------------------------------------------------- q229

  /** q229_split_stability — train/val/test assignment stability under
    * corpus growth: the property that makes content-hash splitting THE
    * 100 TB discipline, measured against the naive alternative. Docs
    * are assigned two ways: (a) hash-mod — md5(doc_id) bucket 0–999,
    * train < 800 ≤ val < 900 ≤ test; (b) positional — the row's rank
    * percentile in ITS corpus snapshot. Then the corpus "grows" from
    * yesterday's crawl (even doc_ids) to the full corpus, and the gate
    * counts docs whose assignment MOVED: hash-mod moves zero by
    * construction (assignment is a pure function of the doc, not the
    * corpus); positional reshuffles a third of the corpus — which at
    * 100 TB means silent train/test contamination on every ingest.
    *
    * Scale shape: two scans + one rank window per snapshot (the
    * positional strategy's cost is itself the lesson: a global
    * ordering per snapshot), one co-keyed join to compare. */
  def q229SplitStability(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def hashSplit(c: Column): Column = {
      val b = conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000
      when(b < 800, "train").when(b < 900, "val").otherwise("test")
    }
    def posSplit(rnk: Column, n: Column): Column = {
      val b = (rnk - 1) * 1000 / n
      when(b < 800, "train").when(b < 900, "val").otherwise("test")
    }
    val docs = Tables.documents(s, dir).select($"doc_id")
    val old = docs.filter($"doc_id" % 2 === 0)
    def assigned(snap: DataFrame): DataFrame = {
      val n = snap.agg(count(lit(1)).as("nn"))
      snap.withColumn("rnk", row_number().over(Window.orderBy($"doc_id")).cast("long"))
        .crossJoin(broadcast(n))
        .select($"doc_id", hashSplit($"doc_id").as("hash_split"),
          posSplit($"rnk", $"nn").as("pos_split"))
    }
    val a = assigned(old).toDF("doc_id", "h_old", "p_old")
    val b = assigned(docs).toDF("did", "h_new", "p_new")
    a.join(b, $"doc_id" === $"did")
      .agg(count(lit(1)).as("n_old"),
        sum(when($"h_old" =!= $"h_new", 1L).otherwise(0L)).as("moved_hash"),
        sum(when($"p_old" =!= $"p_new", 1L).otherwise(0L)).as("moved_pos"))
      .select(lit(1L).as("row"), $"n_old", $"moved_hash", $"moved_pos")
  }

  /** q229 oracle: identical hash parse (the q215 lane), rank windows,
    * and move counts. */
  val q229Sql: String =
    """WITH docs AS (SELECT doc_id FROM documents),
      |old AS (SELECT doc_id FROM docs WHERE doc_id % 2 = 0),
      |ao AS (
      |  SELECT doc_id,
      |    CASE WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 1000 < 800 THEN 'train'
      |         WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 1000 < 900 THEN 'val'
      |         ELSE 'test' END AS h_old,
      |    CASE WHEN (row_number() OVER (ORDER BY doc_id) - 1) * 1000
      |              / (SELECT count(*) FROM old) < 800 THEN 'train'
      |         WHEN (row_number() OVER (ORDER BY doc_id) - 1) * 1000
      |              / (SELECT count(*) FROM old) < 900 THEN 'val'
      |         ELSE 'test' END AS p_old
      |  FROM old),
      |an AS (
      |  SELECT doc_id,
      |    CASE WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 1000 < 800 THEN 'train'
      |         WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)),
      |              1, 15)) AS BIGINT) % 1000 < 900 THEN 'val'
      |         ELSE 'test' END AS h_new,
      |    CASE WHEN (row_number() OVER (ORDER BY doc_id) - 1) * 1000
      |              / (SELECT count(*) FROM docs) < 800 THEN 'train'
      |         WHEN (row_number() OVER (ORDER BY doc_id) - 1) * 1000
      |              / (SELECT count(*) FROM docs) < 900 THEN 'val'
      |         ELSE 'test' END AS p_new
      |  FROM docs)
      |SELECT CAST(1 AS BIGINT) AS row, CAST(count(*) AS BIGINT) AS n_old,
      |  CAST(sum(CASE WHEN h_old <> h_new THEN 1 ELSE 0 END) AS BIGINT)
      |    AS moved_hash,
      |  CAST(sum(CASE WHEN p_old <> p_new THEN 1 ELSE 0 END) AS BIGINT)
      |    AS moved_pos
      |FROM ao JOIN an USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------- q235

  /** q235_filter_funnel — first-failing-rule attribution for the
    * quality-filter cascade (the "where did my corpus go" report):
    * every curation pipeline drops documents through an ordered rule
    * chain, and when 40% of a crawl vanishes the ONLY useful telemetry
    * is which rule fired first per document. Rules, in their stated
    * order: too_short (< 5 tokens), low_stop (stop ratio NULL or
    * < 10%), repetitive (distinct-token ratio < 50% — the integer
    * cross-multiplication 2·uniq < n, no float), unknown_lang (q21's
    * langId says 'und'). Survivors report 'pass'.
    *
    * The rule columns are the SAME shared fragments q21/q47 score with
    * (one tokenize pass, [[stopRatioE6]], [[TextFunctions.langId]]), so
    * this funnel is provably attributing the production rules, not a
    * parallel reimplementation.
    *
    * Scale shape: one narrow codegen pass per document folding
    * map-side to ≤5 verdict rows. At 100 TB: scan-bound, shuffle is 5
    * rows per task. */
  def q235FilterFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", size($"toks").cast("long").as("n"),
        size(array_distinct($"toks")).cast("long").as("uniq"),
        stopRatioE6($"toks").as("sr"),
        TextFunctions.langId($"toks").as("lang"))
    val verdict = when($"n" < 5, "1_too_short")
      .when($"sr".isNull || $"sr" < 100000, "2_low_stop")
      .when($"uniq" * 2 < $"n", "3_repetitive")
      .when($"lang" === "und", "4_unknown_lang")
      .otherwise("pass")
    scored.groupBy(verdict.as("verdict"))
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"))
      .orderBy($"verdict")
  }

  /** q235 oracle: the same rule chain over the shared [[Toks]] /
    * [[StopRatioSql]] / [[LangCaseSql]] fragments. */
  val q235Sql: String =
    s"""WITH tok AS (SELECT doc_id, $Toks AS toks FROM documents),
       |scored AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS uniq,
       |    $StopRatioSql AS sr,
       |    $LangCaseSql AS lang
       |  FROM tok),
       |v AS (
       |  SELECT doc_id,
       |    CASE WHEN n < 5 THEN '1_too_short'
       |         WHEN sr IS NULL OR sr < 100000 THEN '2_low_stop'
       |         WHEN uniq * 2 < n THEN '3_repetitive'
       |         WHEN lang = 'und' THEN '4_unknown_lang'
       |         ELSE 'pass' END AS verdict
       |  FROM scored)
       |SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(min(doc_id) AS BIGINT) AS first_doc
       |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin

  // ---------------------------------------------------------------- q251

  /** q251_dataset_card — the per-source dataset card (the summary table
    * a curated-corpus release ships: HuggingFace dataset cards, data
    * statements): per source, document and character volume, token
    * volume under the engine's own tokenizer, language spread and
    * English share, and the exact-duplicate count (docs beyond the
    * first per md5(text)). One pass composes the signals the corpus
    * operators compute separately (q21 stats, q23 fingerprints) into
    * the release-audit artifact.
    *
    * Scale shape: ONE scan, one (source)-keyed fold; the two DISTINCT
    * aggregates (langs, fingerprints) ride the same exchange via
    * Spark's multi-distinct Expand. Output is |sources| rows. */
  def q251DatasetCard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"source", $"lang", $"n_chars",
        size(TextFunctions.tokens($"text")).cast("long").as("n_toks"),
        md5($"text").as("fp"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        sum($"n_toks").as("sum_toks"),
        countDistinct($"lang").as("n_langs"),
        count(when($"lang" === "en", 1)).as("n_en"),
        (count(lit(1)) - countDistinct($"fp")).as("n_dup_docs"))
      .orderBy($"source")
  }

  /** q251 oracle: identical tokenizer fragment (the q21 idiom) and
    * md5 fingerprints. */
  val q251Sql: String =
    s"""WITH d AS (
       |  SELECT source, lang, n_chars,
       |    CAST(len($Toks) AS BIGINT) AS n_toks,
       |    md5(text) AS fp
       |  FROM documents)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(n_toks) AS BIGINT) AS sum_toks,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |  CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS n_en,
       |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup_docs
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q261

  /** q261_class_rebalance — class-balanced downsampling (the label-
    * rebalancing step before training a classifier on skewed data):
    * every language class is cut to the MINORITY class's size by
    * deterministic keep-first (lowest doc_id — reproducible builds, no
    * RNG), the standard undersampling baseline. The gate audits the
    * selection itself (per-class kept count, id range, id checksum),
    * not just the sizes, so a different keep rule can't pass.
    *
    * Scale shape: one |classes|-row size fold broadcasts back into a
    * class-partitioned row_number — one corpus exchange; the quota
    * compare is an integer predicate. */
  def q261ClassRebalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select($"doc_id", $"lang")
    val mn = d.groupBy($"lang").agg(count(lit(1)).as("n"))
      .agg(min($"n").as("mn"))
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
    d.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(mn))
      .filter($"rn" <= $"mn")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"), min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"), sum($"doc_id").as("sum_id"))
      .orderBy($"lang")
  }

  /** q261 oracle: identical quota (scalar subquery) and keep rule. */
  val q261Sql: String =
    """WITH sizes AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      |mn AS (SELECT min(n) AS mn FROM sizes),
      |ranked AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_id
      |FROM ranked, mn WHERE rn <= mn
      |GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q261_class_rebalance" -> (q261ClassRebalance _),
    "q251_dataset_card" -> (q251DatasetCard _),
    "q235_filter_funnel" -> (q235FilterFunnel _),
    "q229_split_stability" -> (q229SplitStability _),
    "q219_pii_redact" -> (q219PiiRedact _),
    "q220_decontam" -> (q220Decontam _),
    "q221_url_canonical" -> (q221UrlCanonical _),
    "q208_calibration" -> (q208Calibration _),
    "q209_ks_test" -> (q209KsTest _),
    "q210_negative_sampling" -> (q210NegativeSampling _),
    "q199_trending_terms" -> (q199TrendingTerms _),
    "q190_blocklist" -> (q190Blocklist _),
    "q192_phrase_query" -> (q192PhraseQuery _),
    "q186_stratified_split" -> (q186StratifiedSplit _),
    "q181_auc"           -> (q181Auc _),
    "q137_shard_export"  -> (q137ShardExport _),
    "q129_leakage_split" -> (q129LeakageSplit _),
    "q130_bpe_merges"    -> (q130BpeMerges _),
    "q119_survivorship" -> (q119Survivorship _),
    "q115_stratified_weighted" -> (q115StratifiedWeighted _),
    "q124_source_overlap_minhash" -> (q124SourceOverlapMinhash _),
    "q112_source_overlap"   -> (q112SourceOverlap _),
    "q111_pmi_collocations" -> (q111PmiCollocations _),
    "q109_containment"      -> (q109Containment _),
    "q108_char_entropy"     -> (q108CharEntropy _),
    "q152_token_budget"     -> (q152TokenBudget _),
    "q106_domain_cap"       -> (q106DomainCap _),
    "q104_sparse_cosine"    -> (q104SparseCosine _),
    "q102_incr_dedup"       -> (q102IncrDedup _),
    "q100_fuzzy_capped"     -> (q100FuzzyCapped _),
    "q99_connected_components" -> (q99ConnectedComponents _),
    "q90_weighted_sample"   -> (q90WeightedSample _),
    "q91_heavy_hitters"     -> (q91HeavyHitters _),
    "q74_hybrid_rrf"        -> (q74HybridRrf _),
    "q75_quality_model"     -> (q75QualityModel _),
    "q77_mixture_temperature" -> (q77MixtureTemperature _),
    "q78_snapshot_diff"     -> (q78SnapshotDiff _),
    "q79_curriculum"        -> (q79Curriculum _),
    "q72_repeat_spans"      -> (q72RepeatSpans _),
    "q87_span_scrub"        -> (q87SpanScrub _),
    "q88_vocab_drift"       -> (q88VocabDrift _),
    "q73_bm25"              -> (q73Bm25 _),
    "q71_token_histogram"   -> (q71TokenHistogram _),
    "q70_fuzzy_match"       -> (q70FuzzyMatch _),
    "q70_uncapped"          -> (q70Uncapped _),
    "q68_bigram_ppl"        -> (q68BigramPpl _),
    "q66_dsir_weights"      -> (q66DsirWeights _),
    "q65_cdc_chunk"         -> (q65CdcChunk _),
    "q63_decontaminate"     -> (q63Decontaminate _),
    "q62_chunk_overlap"     -> (q62ChunkOverlap _),
    "q61_boilerplate_scrub" -> (q61BoilerplateScrub _),
    "q58_repetition_signals" -> (q58RepetitionSignals _),
    "q57_mixture_sample"    -> (q57MixtureSample _),
    "q55_pack_shards"       -> (q55PackShards _),
    "q53_winnow_fingerprint" -> (q53WinnowFingerprint _),
    "q52_ngram_jaccard"     -> (q52NgramJaccard _),
    "q47_training_prep"     -> (q47TrainingPrep _),
    "q40_dedup_clusters"    -> (q40DedupClusters _),
    "q41_redact"            -> (q41Redact _),
    "q43_stratified_sample" -> (q43StratifiedSample _),
    "q21_text_stats"        -> (q21TextStats _),
    "q23_dedup_fingerprint" -> (q23DedupFingerprint _),
    "q24_dedup_minhash"     -> (q24DedupMinhash _),
    "q27_simhash"           -> (q27Simhash _),
    "q35_quality_filter"    -> (q35QualityFilter _),
    "q36_vocab_topk"        -> (q36VocabTopK _),
    "q37_tfidf"             -> (q37Tfidf _),
    "q38_normalize"         -> (q38Normalize _))

  val oracles: Map[String, String] = Map(
    "q261_class_rebalance" -> q261Sql,
    "q251_dataset_card" -> q251Sql,
    "q235_filter_funnel" -> q235Sql,
    "q229_split_stability" -> q229Sql,
    "q219_pii_redact" -> q219Sql,
    "q220_decontam" -> q220Sql,
    "q221_url_canonical" -> q221Sql,
    "q208_calibration" -> q208Sql,
    "q209_ks_test" -> q209Sql,
    "q210_negative_sampling" -> q210Sql,
    "q199_trending_terms" -> q199Sql,
    "q190_blocklist" -> q190Sql,
    "q192_phrase_query" -> q192Sql,
    "q186_stratified_split" -> q186Sql,
    "q181_auc"           -> q181Sql,
    "q137_shard_export"  -> q137Sql,
    "q129_leakage_split" -> q129Sql,
    "q130_bpe_merges"    -> q130Sql,
    "q119_survivorship" -> q119Sql,
    "q115_stratified_weighted" -> q115Sql,
    "q124_source_overlap_minhash" -> q124Sql,
    "q112_source_overlap"   -> q112Sql,
    "q111_pmi_collocations" -> q111Sql,
    "q109_containment"      -> q109Sql,
    "q108_char_entropy"     -> q108Sql,
    "q152_token_budget"     -> q152Sql,
    "q106_domain_cap"       -> q106Sql,
    "q104_sparse_cosine"    -> q104Sql,
    "q102_incr_dedup"       -> q102Sql,
    "q100_fuzzy_capped"     -> q100Sql,
    "q99_connected_components" -> q99Sql,
    "q90_weighted_sample"   -> q90Sql,
    "q91_heavy_hitters"     -> q91Sql,
    "q74_hybrid_rrf"        -> q74Sql,
    "q75_quality_model"     -> q75Sql,
    "q77_mixture_temperature" -> q77Sql,
    "q78_snapshot_diff"     -> q78Sql,
    "q79_curriculum"        -> q79Sql,
    "q72_repeat_spans"      -> q72Sql,
    "q87_span_scrub"        -> q87Sql,
    "q88_vocab_drift"       -> q88Sql,
    "q73_bm25"              -> q73Sql,
    "q71_token_histogram"   -> q71Sql,
    "q70_fuzzy_match"       -> q70Sql,
    "q70_uncapped"          -> q70UncappedSql,
    "q68_bigram_ppl"        -> q68Sql,
    "q66_dsir_weights"      -> q66Sql,
    "q65_cdc_chunk"         -> q65Sql,
    "q63_decontaminate"     -> q63Sql,
    "q62_chunk_overlap"     -> q62Sql,
    "q61_boilerplate_scrub" -> q61Sql,
    "q58_repetition_signals" -> q58Sql,
    "q57_mixture_sample"    -> q57Sql,
    "q55_pack_shards"       -> q55Sql,
    "q53_winnow_fingerprint" -> q53Sql,
    "q52_ngram_jaccard"     -> q52Sql,
    "q47_training_prep"     -> q47Sql,
    "q40_dedup_clusters"    -> q40Sql,
    "q41_redact"            -> q41Sql,
    "q43_stratified_sample" -> q43Sql,
    "q21_text_stats"        -> q21Sql,
    "q23_dedup_fingerprint" -> q23Sql,
    "q24_dedup_minhash"     -> q24Sql,
    "q27_simhash"           -> q27Sql,
    "q35_quality_filter"    -> q35Sql,
    "q36_vocab_topk"        -> q36Sql,
    "q37_tfidf"             -> q37Sql,
    "q38_normalize"         -> q38Sql)
}
