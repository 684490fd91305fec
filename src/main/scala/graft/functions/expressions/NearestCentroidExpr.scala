package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Index of the nearest centroid (squared L2) for a vector against a small
  * centroid table — the IVF cell-assignment primitive.
  *
  * Why custom: assignment via a join-and-rank (crossJoin centroids →
  * distance → window argmin) multiplies every row k× and adds a shuffle for
  * the window; assignment via nested `transform` lambdas is interpreted.
  * This expression keeps assignment a per-row O(k·d) codegen'd loop — zero
  * shuffle, zero row multiplication — which is what lets IVF indexing run
  * as a single pass over 100 TB of vectors. Ties break to the lower index
  * (deterministic).
  *
  * `right` must be a foldable `array<array<double>>` literal (the centroids
  * are driver-side k-means output, a few KB — captured in the plan like any
  * broadcast literal).
  */
case class NearestCentroid(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("centroids must be foldable (a literal)")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid expects (array<double>, array<array<double>>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  // centroids materialized once at plan time, not per row
  @transient private lazy val centroids: Array[Array[Double]] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i =>
      arr.getArray(i).toDoubleArray())
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toDoubleArray()
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var dist = 0.0
      val n = math.min(v.length, ctr.length)
      var i = 0
      while (i < n) { val d = v(i) - ctr(i); dist += d * d; i += 1 }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctrRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val v = ctx.freshName("v")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val dist = ctx.freshName("dist")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      s"""
         |double[] $v = $a.toDoubleArray();
         |int $best = 0;
         |double $bestDist = Double.MAX_VALUE;
         |for (int $c = 0; $c < $ctrRef.length; $c++) {
         |  double $dist = 0.0;
         |  int $n = java.lang.Math.min($v.length, $ctrRef[$c].length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $v[$i] - $ctrRef[$c][$i];
         |    $dist += $d * $d;
         |  }
         |  if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
