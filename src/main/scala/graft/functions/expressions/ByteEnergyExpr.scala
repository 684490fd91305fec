package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Sum of UNSIGNED byte values of a binary column — the stub "frame energy"
  * of the audio segmentation pass (q132): with opaque content standing in
  * for decoded PCM blocks (the [[graft.multimodal.Multimodal]] stub-codec
  * convention), per-frame energy is Σ sample values, the statistic an
  * energy-threshold voice-activity detector (VAD) thresholds.
  *
  * One codegen'd per-row loop, O(bytes), no allocation — the native dial
  * for what would otherwise be an interpreted split/transform/aggregate
  * lambda chain re-tokenizing the frame per element. Bytes are read
  * UNSIGNED (& 0xff); the DuckDB oracle sums codepoints, identical on the
  * ASCII corpus (the q84/q127 precondition — a ≥0x80 byte would diverge
  * and the hash gate would catch it). */
case class ByteEnergy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_byte_energy expects binary, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_byte_energy"

  override def nullSafeEval(b: Any): Any =
    ByteEnergy.compute(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.expressions.ByteEnergy.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteEnergy {
  def compute(b: Array[Byte]): Long = {
    var i = 0
    var s = 0L
    while (i < b.length) { s += (b(i) & 0xff); i += 1 }
    s
  }
}
