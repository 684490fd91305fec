package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two keys — the multi-dimensional
  * clustering key: sorting rows by z and cutting the sort into files makes
  * every file cover a small RANGE OF BOTH dimensions, so parquet min/max
  * stats prune the scan for predicates on either column alone or both
  * (linear clustering prunes only its leading column). Standard bit-trick
  * spread (each input bit moves to position 2i via the log-step mask
  * cascade), O(1) per row, codegen'd.
  *
  * Inputs are masked to their low 31 bits: the result then uses bits 0..61
  * and stays POSITIVE as a signed long, so Spark's signed sort is the
  * unsigned z order. Clustering only needs order preservation, not
  * bijectivity — keys wider than 31 bits should be pre-scaled (e.g. divide
  * by bucket width); dropping low-order key bits costs locality precision,
  * never correctness, since the scan predicate re-applies exactly. */
case class ZOrder(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_zorder expects two bigint keys, got ${l.simpleString}, ${r.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.ZOrder.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrder {
  /** Spread the low 31 bits of x to even bit positions (0, 2, 4, …, 60). */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
