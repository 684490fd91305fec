package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous corpus curation — the q47 batch prep pipeline re-expressed
  * over a document STREAM, so a live feed (a crawler, a CDC'd document
  * store) is scored, gated, deduplicated and sampled incrementally instead
  * of by nightly re-runs over the full corpus.
  *
  * Stage reuse is literal, not parallel-implementation: the narrow
  * score → quality-gate → fingerprint stage is
  * [[graft.queries.TextQueries.prepScored]] — the SAME code the batch
  * query runs — and the sample bucket is the shared q43/q47 md5 bucket.
  * Only dedup changes shape: batch picks the min-doc_id canonical per
  * fingerprint with a window; a stream cannot see the future, so
  * [[curated]] keeps the FIRST-ARRIVAL doc per fingerprint in
  * `flatMapGroupsWithState` (ties within one micro-batch break to the
  * lowest doc_id). The two rules agree whenever documents arrive in id
  * order — CorpusStreamSpec replays the corpus in id-ordered batches and
  * asserts stream ≡ q47 exactly — and first-arrival is the operationally
  * right rule live: the already-published canonical must stay canonical.
  *
  * Scale shape: score/gate/fingerprint are stateless column algebra (scan
  * speed, no state); dedup holds ONE (fp → seen) entry per DISTINCT
  * fingerprint — state grows with unique content, not stream length.
  * At 100 TB feed sizes, bound it with `stateTtlMs` (a processing-time
  * state TTL: a fingerprint unseen for the horizon is dropped from state
  * and its next duplicate re-admitted — the standard recall/state trade,
  * now config) and/or back the state store with RocksDB.
  */
object CorpusStream {

  /** One quality-surviving scored document (prepScored's row shape). */
  final case class ScoredDoc(doc_id: Long, lang: String, n_tokens: Long, fp: String)

  /** Apply score+gates+fingerprint, cross-batch first-arrival dedup, and
    * the deterministic hash-bucket sample to a (possibly streaming)
    * documents DataFrame. Append-mode safe: each doc is emitted at most
    * once, in the micro-batch that first admits its fingerprint.
    *
    * `stateTtlMs`: optional state TTL. Every sighting of a fingerprint
    * (admission AND later duplicates) refreshes its horizon, so hot
    * boilerplate stays deduplicated forever and only fingerprints unseen
    * for the full horizon age out. Spark fires the timeout in the first
    * micro-batch after expiry in which the key carries no data; a
    * duplicate arriving after the state was dropped is re-admitted (and
    * re-emitted) — the documented recall trade for bounded state. With
    * None, state never expires (exact dedup over the stream's lifetime). */
  def curated(docs: DataFrame, stateTtlMs: Option[Long] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val deduped = graft.queries.TextQueries.prepScored(docs)
      .as[ScoredDoc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Long, ScoredDoc](
        OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[ScoredDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // horizon passed with no sighting: forget the fp
            Iterator.empty
          } else if (state.exists) {
            stateTtlMs.foreach(state.setTimeoutDuration) // duplicate sighting refreshes
            Iterator.empty
          } else if (rows.isEmpty) Iterator.empty
          else {
            val first = rows.minBy(_.doc_id) // in-batch tie-break = batch rule
            state.update(first.doc_id)
            stateTtlMs.foreach(state.setTimeoutDuration)
            Iterator.single(first)
          }
      }
    deduped.toDF()
      .filter(graft.queries.TextQueries.sampleBucket($"doc_id") < lit("80"))
      .select($"doc_id", $"lang", $"n_tokens", $"fp",
        graft.queries.TextQueries.sampleBucket($"doc_id").as("bucket"))
  }
}
