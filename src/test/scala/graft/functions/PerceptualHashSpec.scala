package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential + property coverage for the q127 perceptual-hash family
  * ([[graft.functions.expressions.PerceptualHash]],
  * [[graft.functions.expressions.MediaRendition]]). */
class PerceptualHashSpec extends SparkSpec {

  import spark.implicits._

  /** Straight-line reference implementation of the documented definition
    * (independent of the one-pass production code's loop structure). */
  private def refAHash(bytes: Array[Byte]): Long = {
    val v = refCells(bytes)
    val t = v.sum / 64
    v.zipWithIndex.collect { case (x, i) if x > t => 1L << i }.foldLeft(0L)(_ | _)
  }
  private def refDHash(bytes: Array[Byte]): Long =
    (0 until 64).collect { case i if refCells(bytes)(i) > refCells(bytes)((i + 1) % 64) =>
      1L << i }.foldLeft(0L)(_ | _)
  private def refCells(bytes: Array[Byte]): Array[Long] = {
    val groups = bytes.indices.groupBy(p => (p.toLong * 64 / bytes.length).toInt)
    Array.tabulate(64)(i => groups.get(i) match {
      case Some(ps) => ps.map(p => (bytes(p) & 0xff).toLong).sum / ps.size
      case None => 0L
    })
  }

  test("graft_ahash/graft_dhash match the straight-line reference definition") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps on running far",
      "a" * 64, "ab" * 100, ("z" * 63) + " ",
      "key agg row scan slow fast table value part hash value table part zz")
    val df = texts.toDF("text").select($"text".cast("binary").as("c"))
      .select(call_function("graft_ahash", $"c").as("ah"),
        call_function("graft_dhash", $"c").as("dh"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = texts.map(t => (refAHash(t.getBytes), refDHash(t.getBytes)))
    assert(got.toSeq == want)
  }

  test("aHash and dHash are exactly invariant under the re-exposure rendition") {
    // +1 on every byte shifts each pooled value AND the threshold by
    // exactly 1 (floor((S + C) / C) = floor(S / C) + 1), so every bit
    // comparison is unchanged — the brightness-invariance property the
    // q127 gate pins per pair
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(length($"text") >= 64)
      .select($"text".cast("binary").as("c"))
    val diff = docs.select(
        call_function("graft_ahash", $"c").as("ah0"),
        call_function("graft_dhash", $"c").as("dh0"),
        call_function("graft_ahash",
          call_function("graft_media_rendition", $"c", lit(1))).as("ah1"),
        call_function("graft_dhash",
          call_function("graft_media_rendition", $"c", lit(1))).as("dh1"))
      .filter($"ah0" =!= $"ah1" || $"dh0" =!= $"dh1")
    assert(diff.count() == 0L)
  }

  test("the noise rendition lands within a small Hamming distance") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(length($"text") >= 64)
      .select($"text".cast("binary").as("c"))
    val hams = docs.select(bit_count(
        call_function("graft_ahash", $"c").bitwiseXOR(
          call_function("graft_ahash",
            call_function("graft_media_rendition", $"c", lit(2))))).as("h"))
      .agg(max($"h"), expr("percentile(h, 0.5)")).head()
    assert(hams.getInt(0) <= 16, s"noise rendition drifted too far: $hams")
    assert(hams.getDouble(1) <= 4.0, s"median noise Hamming too large: $hams")
  }

  test("rendition modes: identity, exposure, every-16th; unknown mode throws") {
    val bytes = "0123456789abcdef0123456789abcdef".getBytes
    import graft.functions.expressions.MediaRendition.render
    assert(render(bytes, 0).toSeq == bytes.toSeq)
    assert(render(bytes, 1).toSeq == bytes.map(b => (b + 1).toByte).toSeq)
    val noisy = render(bytes, 2)
    assert(noisy(0) == (bytes(0) + 1).toByte && noisy(16) == (bytes(16) + 1).toByte)
    assert(noisy.toSeq.zipWithIndex.count { case (b, i) => b != bytes(i) } == 2)
    intercept[IllegalArgumentException](render(bytes, 3))
  }

  test("empty and sub-64-byte content hash without error") {
    import graft.functions.expressions.PerceptualHash
    assert(PerceptualHash.ahash(Array.empty[Byte]) == 0L)
    assert(PerceptualHash.dhash(Array.empty[Byte]) == 0L)
    // len < 64: empty cells pool to 0; still deterministic
    val tiny = "abc".getBytes
    assert(PerceptualHash.ahash(tiny) == refAHash(tiny))
    assert(PerceptualHash.dhash(tiny) == refDHash(tiny))
  }
}
