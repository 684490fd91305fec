package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| of two SORTED-ascending long arrays via a single merge scan —
  * O(|A|+|B|) primitive comparisons, no hash set, no boxing. Built for
  * q52's similarity verification, where `size(array_intersect(...))` per
  * candidate pair (hash-set build + probe over boxed elements, evaluated
  * twice once filter pushdown re-inlines the alias) dominated the query.
  *
  * The sortedness precondition is the caller's (q52 builds the arrays with
  * `sort_array`); duplicate elements are counted once per matching pair of
  * positions, which for set-semantics inputs (distinct elements) is
  * exactly the intersection size.
  */
case class IntersectSize(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, false), ArrayType(LongType, false)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckFailure(
      "graft_intersect_size requires array<bigint> with non-null elements " +
        "(ArrayData.getLong is undefined for null entries); wrap inputs in " +
        "array_compact or build them null-free")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_intersect_size expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectSize.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.IntersectSize.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object IntersectSize {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}
