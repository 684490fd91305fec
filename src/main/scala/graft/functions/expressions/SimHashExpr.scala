package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 16-bit SimHash over a token array.
  *
  * Bit semantics — pinned by the DuckDB oracle, which replays them from the
  * md5 HEX string: bit j (1-based, weight `1L << (16-j)`) is set iff
  * `2 * |{tokens whose j-th md5 hex digit ∈ [8..f]}| >= |tokens|` — i.e.
  * the majority vote of the top bit of hex nibble j. Natively that nibble
  * is byte `(j-1)/2` of the digest, high half for odd j.
  *
  * Why custom: the composable path filters the hash array 16 times through
  * interpreted lambdas. Here each token is digested ONCE and all 16
  * counters update in one pass. The MD5 instance is per generated-class
  * instance (one per task), reset between tokens — no per-row allocation.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash16.compute(arr, SimHash16.localMd5.get())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "simhashMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.expressions.SimHash16.compute($arr, $md);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Width-parametric SimHash (`graft_simhash(toks, bits)`, bits ∈ [1, 32]):
  * same per-nibble majority vote as [[SimHash16]], over the first `bits`
  * md5 hex nibbles. The width is the blocking-cardinality dial — expected
  * bucket population is N/2^bits, so width grows with log N to hold
  * bucket sizes constant (q119 runs 32 at gate scale; the 16-bit default
  * is q27/q70's documented blocking key). The 16-bit value is exactly the
  * top 16 bits of the same vote, so widening only ever SPLITS buckets. */
case class SimHashWide(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 32,
    s"graft_simhash width must be in [1, 32], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash16.compute(arr, SimHash16.localMd5.get(), bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "simhashMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.expressions.SimHash16.compute($arr, $md, $bits);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash16 {
  private[expressions] val localMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, md: MessageDigest): Long =
    compute(arr, md, 16)

  /** Width-parametric vote: one digest per token, `bits` counters updated
    * in the same pass (bits ≤ 32 = the full md5 nibble budget). */
  def compute(arr: ArrayData, md: MessageDigest, bits: Int): Long = {
    val n = arr.numElements()
    val ones = new Array[Int](bits)
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < bits) {
        val b = digest(j >> 1) & 0xff
        val nibble = if ((j & 1) == 0) b >> 4 else b & 0xf
        if (nibble >= 8) ones(j) += 1
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < bits) {
      if (2 * ones(j) >= n) acc |= 1L << (bits - 1 - j)
      j += 1
    }
    acc
  }
}
