package graft.functions.expressions

import java.util.HashSet

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): Karp-Rabin rolling hashes of every `k`-char gram,
  * then per window of `w` consecutive hashes keep the minimum (rightmost on
  * ties), emitting the sorted distinct selected hash values. Winnowing
  * guarantees every shared substring of length ≥ `w + k - 1` between two
  * documents yields at least one shared fingerprint — position-shift
  * invariant, unlike fixed-stride sampling.
  *
  * Hash: polynomial base 31 mod 2^20 over UTF-16 code units (= code points
  * for ASCII/BMP text, aligning with the oracle's `ascii()`), computed as a
  * TRUE rolling hash — O(1) per position after the first gram, so a row
  * costs O(chars), not O(chars·k). The window minimum uses the standard
  * incremental trick (a new position only competes with the last selected
  * one), so selection is O(chars) amortized too.
  *
  * Whole-stage codegen'd like [[Shingles]]: the generated code calls the
  * static [[Winnow.compute]] — one loop, no boxing in the hot path.
  */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 1 && w >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.Winnow.compute($s, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Winnow {
  /** Modulus 2^20: small enough that `h·2^20 + pos` stays exact in the
    * oracle's BIGINT/double arithmetic, large enough that fingerprint
    * collisions within a document are rare. Power of two, so `& Mask` is
    * the mod — exact for negative intermediates too (two's complement). */
  private val Mask = (1L << 20) - 1

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    val npos = n - k + 1
    if (npos < w) return new GenericArrayData(Array.empty[Any])

    // Karp-Rabin: h_0 by Horner, then roll with p = 31^(k-1) mod 2^20.
    // Intermediates fit: c is a UTF-16 unit (< 2^16), p < 2^20, so
    // |h - c·p|·31 < 2^41 ≪ Long range. (Raising the modulus M shrinks
    // that headroom as 2^16·M·31 — at M = 2^31 the bound is ~2^52, within
    // a factor of ~2000 of overflow; re-derive before widening.)
    val hs = new Array[Long](npos)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * 31 + s.charAt(j)) & Mask; j += 1 }
    hs(0) = h
    var p = 1L
    j = 0
    while (j < k - 1) { p = (p * 31) & Mask; j += 1 }
    var i = 1
    while (i < npos) {
      h = ((h - s.charAt(i - 1) * p) * 31 + s.charAt(i + k - 1)) & Mask
      hs(i) = h
      i += 1
    }

    // winnow: rightmost-min per window; when the previous selection is
    // still inside the window only the newly entered position can displace
    // it (ties go right), so re-scans happen only when the selection ages out
    val seen = new HashSet[java.lang.Long]()
    var lastSel = -1
    var t = 0
    while (t <= npos - w) {
      if (lastSel < t) {
        var best = t
        var u = t + 1
        while (u < t + w) { if (hs(u) <= hs(best)) best = u; u += 1 }
        lastSel = best
        seen.add(hs(best))
      } else {
        val u = t + w - 1
        if (hs(u) <= hs(lastSel)) { lastSel = u; seen.add(hs(u)) }
      }
      t += 1
    }

    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
