package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build + probe over public DataFrame API — an
  * explicit, deterministic runtime filter for semi-joins whose build side
  * is too big to broadcast but whose KEY MEMBERSHIP compresses into a few
  * kilobytes of bits (the classic Bloom 1970 trade: false positives, never
  * false negatives — so an exact join downstream keeps the result exact
  * while the pre-filter keeps the big side's shuffle small).
  *
  * Build is fully distributed: each key explodes into `numHashes` bit
  * positions (xxhash64 seeded by hash index), positions reduce to at most
  * `numBits/64` words via a partial-aggregated `bit_or` — the shuffle moves
  * word fragments, not keys. The only driver materialization is the final
  * word array, whose size is a CONFIG (numBits/8 bytes; 128 KiB at 2^20
  * bits), independent of data volume — the same bounded-model-collect
  * justification as [[graft.vector.Ivf]]'s k×d centroid pull.
  *
  * Spark's own `InjectRuntimeFilter` does this implicitly when its
  * thresholds and plan shapes line up; this explicit version is for when
  * the planner declines (or the filter must be reused/persisted), and its
  * false-positive rate is a measured spec contract rather than a hope:
  * fpp ≈ (1 − e^(−k·n/m))^k — at m=2^20, k=5, n=30 000 keys that is ~4e−5.
  */
object BloomFilter {

  /** Bit positions of `key` under hash index `i`: pmod(xxhash64(key, i), m).
    * Seeding via the extra hashed column gives `numHashes` independent
    * functions from one 64-bit hash family. */
  private def position(key: Column, i: Int, numBits: Int): Column =
    pmod(xxhash64(key, lit(i)), lit(numBits.toLong))

  /** Build the filter over the (already deduplicated or not — duplicates
    * are harmless) `key` column of `keys`. Runs one Spark job. */
  def build(keys: DataFrame, key: Column, numBits: Int, numHashes: Int): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    require(numHashes >= 1)
    val positions = (0 until numHashes).map(position(key, _, numBits))
    val words = keys
      .select(explode(array(positions: _*)).as("p"))
      .select(
        floor(col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64)).cast("int")).as("mask"))
      .groupBy(col("w"))
      .agg(call_function("bit_or", col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership predicate: true for every inserted key (no false
    * negatives), true for a non-member with probability ≈ fpp. Pure
    * codegen'd column algebra (hash, array index, bit test) — evaluated at
    * scan speed below any exchange. */
  def mightContain(bf: Array[Long], key: Column, numBits: Int, numHashes: Int): Column = {
    require(bf.length == numBits / 64)
    val bfLit = typedLit(bf)
    (0 until numHashes).map { i =>
      val p = position(key, i, numBits)
      val word = element_at(bfLit, floor(p / 64).cast("int") + lit(1))
      val mask = call_function("shiftleft", lit(1L), pmod(p, lit(64)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }
}
