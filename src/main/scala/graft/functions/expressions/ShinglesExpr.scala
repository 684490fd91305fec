package graft.functions.expressions

import java.util.{ArrayList, HashSet}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling: distinct space-joined n-grams in first-
  * occurrence order — byte-for-byte the semantics of the composable
  * `zip_with` formulation in [[graft.functions.TextFunctions.shingles]]
  * (differential-tested).
  *
  * Why custom: the shingle column feeds three plan branches of the LSH
  * pipeline (signature, verify-left, verify-right), so its per-row cost is
  * paid three times; the interpreted zip-with chain allocates an
  * intermediate array per fold step plus a quadratic-ish distinct pass.
  * Here it is one loop with a hash-set dedupe.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.expressions.Shingles.compute($arr, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Shingles {
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val m = len - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new HashSet[UTF8String](m * 2)
    val out = new ArrayList[UTF8String](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](2 * n - 1)
      var k = 0
      while (k < n) {
        parts(2 * k) = toks.getUTF8String(i + k)
        if (k < n - 1) parts(2 * k + 1) = Space
        k += 1
      }
      val gram = UTF8String.concat(parts: _*)
      if (seen.add(gram)) out.add(gram)
      i += 1
    }
    new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size())))
  }
}
