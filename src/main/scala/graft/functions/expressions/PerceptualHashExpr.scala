package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native perceptual hashes over an opaque media `binary` column — the
  * image near-dup primitive (q127), public aHash/dHash recipe (average /
  * difference hash over a downscaled grayscale thumbnail).
  *
  * The DECODE step is the deterministic stub this environment dictates
  * (no image codecs; see [[graft.multimodal.Multimodal.StubCodec]]): the
  * byte stream stands in for the decoded pixel stream, and "downscale to
  * an 8×8 = 64-cell thumbnail" is average-pooling the bytes into 64
  * contiguous cells. Swapping in a real decoder changes only the byte
  * source, not the pooling/threshold/bit logic, the banding, or any plan
  * shape. All arithmetic is INTEGER (floor division) so the DuckDB oracle
  * replays it bit-exactly:
  *
  *  - byte p (unsigned) belongs to cell `p * 64 / len` (floor);
  *  - cell value v_i = floor(sum / count) over its bytes (0 if empty —
  *    only possible when len < 64, which q127 filters out);
  *  - aHash bit i = v_i > floor(Σ v / 64)   (brightness vs global mean);
  *  - dHash bit i = v_i > v_{(i+1) mod 64}  (circular gradient sign).
  *
  * Bit i has weight `1L << i`. One pass over the bytes, fixed 64-slot
  * state, no allocation beyond the two 64-long arrays — stays inside
  * whole-stage codegen via a static call.
  */
abstract class PerceptualHashBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
}

case class AHash(child: Expression) extends PerceptualHashBase {
  override def prettyName: String = "graft_ahash"
  override def nullSafeEval(input: Any): Any =
    PerceptualHash.ahash(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.PerceptualHash.ahash($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class DHash(child: Expression) extends PerceptualHashBase {
  override def prettyName: String = "graft_dhash"
  override def nullSafeEval(input: Any): Any =
    PerceptualHash.dhash(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.PerceptualHash.dhash($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PerceptualHash {
  final val Cells = 64

  /** 64 pooled cell values (floor-average of each cell's unsigned bytes). */
  private def cellValues(bytes: Array[Byte]): Array[Long] = {
    val avgs = new Array[Long](Cells)
    val len = bytes.length
    if (len == 0) return avgs
    val sums = new Array[Long](Cells)
    val cnts = new Array[Long](Cells)
    var p = 0
    while (p < len) {
      val c = (p.toLong * Cells / len).toInt
      sums(c) += (bytes(p) & 0xff)
      cnts(c) += 1
      p += 1
    }
    var i = 0
    while (i < Cells) {
      if (cnts(i) > 0) avgs(i) = sums(i) / cnts(i)
      i += 1
    }
    avgs
  }

  def ahash(bytes: Array[Byte]): Long = {
    val v = cellValues(bytes)
    var tot = 0L
    var i = 0
    while (i < Cells) { tot += v(i); i += 1 }
    val t = tot / Cells
    var h = 0L
    i = 0
    while (i < Cells) { if (v(i) > t) h |= (1L << i); i += 1 }
    h
  }

  def dhash(bytes: Array[Byte]): Long = {
    val v = cellValues(bytes)
    var h = 0L
    var i = 0
    while (i < Cells) { if (v(i) > v((i + 1) % Cells)) h |= (1L << i); i += 1 }
    h
  }
}
