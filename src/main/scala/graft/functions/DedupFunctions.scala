package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Near-duplicate detection building blocks (training-data pipeline):
  * MinHash signatures and LSH band keys over shingle sets, plus SimHash.
  *
  * Hash function choice: `md5(seed || '|' || shingle)` with the MIN taken in
  * STRING order. md5 is available and bit-identical in both Spark and DuckDB,
  * which makes every signature — and therefore the whole LSH candidate set —
  * replayable by the SQL oracle. Any total order works for MinHash; string
  * order over fixed-width hex is one.
  *
  * All column algebra (higher-order functions over arrays) — no UDFs, no
  * explode of the shingle sets; per-row cost is O(shingles × hashes) inside
  * whole-stage codegen, and the only shuffle in the LSH pipeline is the
  * band-bucket join on (band index, band key).
  */
object DedupFunctions {

  /** MinHash signature: `numHashes` minima of seeded xxhash64 over the
    * shingle array, via the native codegen'd
    * [[graft.functions.expressions.MinHashSignature]] (any uniform hash
    * family works for MinHash — the correctness oracle verifies the OUTPUT
    * pairs against exact all-pairs Jaccard, not the signatures). NULL for
    * empty shingle arrays — filter upstream. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    call_function("graft_minhash", shingles, lit(numHashes))

  /** LSH band keys: hash of each `rowsPerBand`-slice of the signature,
    * band index mixed in so equal slices in different bands don't collide.
    * `sig` should be a materialized column (attribute), so the per-band
    * element_at lookups are array reads, not recomputation. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b +: (1 to rowsPerBand).map(r =>
        element_at(sig, b * lit(rowsPerBand) + lit(r))): _*))

  /** Ordered pairs (a < b) from a sorted id array — in-bucket candidate
    * expansion. Quadratic in bucket size BY DESIGN (LSH buckets are tiny);
    * a pathological hot bucket should be salted or capped upstream. */
  def pairExpand(ids: Column): Column =
    flatten(transform(sequence(lit(0), size(ids) - 2), i =>
      transform(sequence(i + 1, size(ids) - 1), j =>
        struct(element_at(ids, i + 1).as("a"), element_at(ids, j + 1).as("b")))))

  /** Exact Jaccard similarity of two string sets (arrays assumed distinct). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** SimHash bit width used by [[simhash]]. One bit per md5 hex nibble:
    * bit j of a token's hash = high bit of hex digit j. */
  val SimhashBits = 16

  /** 16-bit SimHash fingerprint via the native one-pass
    * [[graft.functions.expressions.SimHash16]] expression. */
  def simhash(toks: Column): Column = call_function("graft_simhash", toks)

  /** Width-parametric SimHash ([[graft.functions.expressions.SimHashWide]],
    * bits ≤ 32): the blocking-cardinality dial — bucket population is
    * N/2^bits in expectation, so the width a deployment runs grows with
    * log N. The 16-bit [[simhash]] is the top 16 bits of the same vote. */
  def simhashWide(toks: Column, bits: Int): Column =
    call_function("graft_simhash", toks, lit(bits))

  /** Per-token md5 hex hashes — materialize this as its own column before
    * calling [[simhashOfHashes]], which references it 16 times (multi-use
    * aliases survive CollapseProject, so the md5 pass runs once per row). */
  def tokenHashes(toks: Column): Column = transform(toks, t => md5(t))

  /** Composable (interpreted) SimHash over pre-hashed tokens — the
    * executable spec [[simhash]] is differential-tested against: per bit,
    * majority vote of the tokens' hash bits (ties round up). Documents
    * differing in a few tokens land on nearby (often equal) fingerprints —
    * grouping by fingerprint is the cheapest near-dup bucketing (one
    * shuffle on a 2-byte key). */
  private[graft] def simhashOfHashes(hashes: Column): Column = {
    val n = size(hashes)
    val bitCols = (1 to SimhashBits).map { j =>
      val ones = size(filter(hashes, h =>
        substring(h, j, 1).isin("8", "9", "a", "b", "c", "d", "e", "f")))
      when(ones * 2 >= n, lit(1L << (SimhashBits - j))).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _).cast("long")
  }
}
