package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over an `array<string>` shingle column:
  * `numHashes` minima of seeded xxhash64, one tight two-level loop.
  *
  * Why custom: the composable formulation
  * (`transform(seq, j -> array_min(transform(sh, s -> xxhash64(j, s))))`)
  * interprets every hash call through boxed lambda dispatch and walks the
  * shingle array once PER HASH. Here the shingle bytes are hashed against
  * all seeds in one pass via the same `XXH64` primitive Spark's `xxhash64`
  * uses, inside whole-stage codegen. Seeds are `XXH64.hashLong(j, 42)`,
  * fixed at plan time.
  *
  * Returns null for null or EMPTY input (an empty set has no minima) —
  * matching `array_min`'s null on the composable path.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(j => XXH64.hashLong(j.toLong, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < len) {
      val s = arr.getUTF8String(i)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashUTF8String(s, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |int $len = $arr.numElements();
         |if ($len == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $len; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($s, $seedsRef[$j]);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
