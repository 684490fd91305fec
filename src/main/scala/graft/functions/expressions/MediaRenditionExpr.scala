package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** `graft_media_rendition(content, mode)` — deterministic stub for media
  * re-encoding, the q127 fixture generator: produces the alternate
  * renditions of one media object that a perceptual-hash near-dup pass must
  * reunite with the original. Part of the stub-codec seam
  * ([[graft.multimodal.Multimodal.StubCodec]]): a real pipeline gets these
  * rows from genuinely re-encoded files; the transforms below are the
  * byte-level stand-ins for the corresponding pixel-level edits.
  *
  *  - mode 0: identity (the original bytes);
  *  - mode 1: "re-exposure" — every byte + 1. [[PerceptualHash]] is EXACTLY
  *    invariant to this (value and threshold shift together), the aHash
  *    brightness-invariance property;
  *  - mode 2: "quantization noise" — byte + 1 at every 16th position,
  *    a re-encode artifact; moves a few pooled cells by ±1, so the hash
  *    lands a small Hamming distance away (≤ ~8 on the test corpus).
  *
  * Bytes wrap at 255 (`& 0xff`); the oracle's codepoint arithmetic has no
  * wrap, so gate inputs must stay below 0xff — true of any ASCII corpus.
  * `mode` is a runtime column (one exploded media row per rendition), not a
  * literal.
  */
case class MediaRendition(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_media_rendition expects (binary, int), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_media_rendition"

  override def nullSafeEval(content: Any, mode: Any): Any =
    MediaRendition.render(content.asInstanceOf[Array[Byte]], mode.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, m) =>
      s"${ev.value} = graft.functions.expressions.MediaRendition.render($c, $m);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MediaRendition {
  def render(bytes: Array[Byte], mode: Int): Array[Byte] = mode match {
    case 0 => bytes
    case 1 =>
      val out = new Array[Byte](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = (((bytes(i) & 0xff) + 1) & 0xff).toByte; i += 1 }
      out
    case 2 =>
      val out = java.util.Arrays.copyOf(bytes, bytes.length)
      var i = 0
      while (i < out.length) { out(i) = (((out(i) & 0xff) + 1) & 0xff).toByte; i += 16 }
      out
    case other => throw new IllegalArgumentException(
      s"graft_media_rendition: unknown mode $other (expected 0, 1, or 2)")
  }
}
