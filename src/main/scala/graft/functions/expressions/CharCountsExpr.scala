package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 27-slot character histogram: counts of `a`–`z`
  * (case-insensitive) and the space character, in that order — exactly
  * `[length(lower(t)) - length(replace(lower(t), c, '')) for c in a..z,' ']`
  * for ASCII text.
  *
  * Why custom: that composable formulation walks (and COPIES) the string
  * once per alphabet slot — 27 O(chars) passes with a fresh string
  * allocation each, the dominant cost of the q108 entropy scan. Here the
  * UTF8String's bytes are read ONCE with zero allocation beyond the
  * 27-long result. Multi-byte UTF-8 code units are ≥ 0x80 and ASCII
  * continuation never aliases a letter byte, so non-ASCII characters
  * simply count nothing — identical to the replace() formulation for the
  * ASCII alphabet as long as the text contains no exotic case mappings
  * that LOWER to ASCII letters (İ → i̇ being the canonical offender);
  * the q108 oracle gate would surface such drift immediately.
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_counts expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_counts"

  override def nullSafeEval(input: Any): Any =
    CharCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.expressions.CharCounts.compute($s);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CharCounts {
  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): GenericArrayData = {
    val counts = new Array[Long](27)
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
      else if (b >= 'A' && b <= 'Z') counts(b - 'A') += 1
      else if (b == ' ') counts(26) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }
}
