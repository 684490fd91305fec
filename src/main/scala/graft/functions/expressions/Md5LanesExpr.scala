package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_md5_lanes(g, H)` — all H oracle-replayable MinHash lane values of
  * one string in ONE native pass: lane j is the first 15 hex digits of
  * `md5("<j>:" || g)` read as a base-16 number, i.e. the top 60 bits of the
  * digest (`first 8 bytes big-endian >>> 4` — always positive). Bit-for-bit
  * the value of the composable
  * `conv(substring(md5(concat(lit(s"$j:"), g)), 1, 15), 16, 10)` the DuckDB
  * oracle replays (pinned differentially in ExpressionSpec).
  *
  * Why custom: q124's per-source signature needs H=64 lanes per distinct
  * (source, shingle) row; as 64 independent expression trees each row pays
  * 64 × (concat allocation + hex-string render + substring + base-16
  * string parse) — measured ~12 s of q124's 13.4 s at sf0.1. Here the row
  * digests H seeded prefixes with one reused MessageDigest and reads the
  * lane value straight from the digest bytes — no hex string ever exists.
  * The md5-family cousin of [[MinHashSignature]] (which hashes xxhash64
  * lanes of a whole array per row; this hashes H lanes of ONE string for
  * aggregate-side minima, where the oracle must replay the hash).
  */
case class Md5Lanes(child: Expression, lanes: Int) extends UnaryExpression {

  require(lanes >= 1 && lanes <= 4096, s"graft_md5_lanes: H must be in [1, 4096], got $lanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_lanes expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_lanes"

  override def nullSafeEval(input: Any): Any =
    Md5Lanes.compute(input.asInstanceOf[UTF8String], lanes, Md5Lanes.localMd5.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "md5LanesMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, g =>
      s"${ev.value} = graft.functions.expressions.Md5Lanes.compute($g, $lanes, $md);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Md5Lanes {
  private[expressions] val localMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** ASCII "<j>:" prefixes, precomputed once per JVM for the small j's any
    * realistic H uses. */
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(4096)(j => s"$j:".getBytes("US-ASCII"))

  def compute(g: UTF8String, lanes: Int, md: MessageDigest): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val gBytes = g.getBytes
    val out = new Array[Long](lanes)
    var j = 0
    while (j < lanes) {
      md.reset()
      md.update(prefixes(j))
      md.update(gBytes)
      val d = md.digest()
      // first 15 hex digits base-16 = top 60 bits = first-8-bytes BE >>> 4
      val top =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(j) = top >>> 4
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
