package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline: token
  * counting, shingling, quality scoring, language ID. All built from
  * codegen'd `org.apache.spark.sql.functions` — no UDFs — so they fuse into
  * whole-stage codegen over the document scan and scale linearly.
  */
object TextFunctions {

  /** Whitespace tokens; empty string → empty array (split would give [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word unit count: runs of word chars or single punctuation —
    * a cheap, deterministic proxy for tokenizer cost. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-grams (shingles), distinct, joined with single spaces, in
    * first-occurrence order; empty when the document has fewer than n
    * tokens. Native one-pass implementation
    * ([[graft.functions.expressions.Shingles]]) — it feeds three branches
    * of the LSH dedup plan, so per-row cost is paid three times. */
  def shingles(toks: Column, n: Int): Column =
    call_function("graft_shingles", toks, lit(n))

  /** Composable reference formulation of [[shingles]] (executable spec for
    * the differential test): `zip_with` over n shifted slices — argument
    * arrays evaluate once per row, lambdas touch only element variables
    * (an indexed `transform` would re-run the tokenizer per element). */
  private[graft] def shinglesComposable(toks: Column, n: Int): Column = {
    val m = greatest(size(toks) - (n - 1), lit(0))
    val grams = (1 until n).foldLeft(slice(toks, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), m), (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(grams)
  }

  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "is", "in", "it")

  def stopwordCount(toks: Column, stops: Seq[String] = EnStop): Column =
    size(filter(toks, t => t.isin(stops.map(_.asInstanceOf[Any]): _*)))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Per-language marker lists for the n-gram/stopword language heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "y", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Language ID: marker-hit argmax with first-listed-wins tie-break;
    * "und" (undetermined) when nothing matches. Deterministic, so it is
    * oracle-checkable as a CASE cascade. */
  def langId(toks: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> stopwordCount(toks, ms) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, sc), els) =>
      when(sc > 0 && sc === best, lit(lang)).otherwise(els)
    }
  }
}
