package graft.functions.expressions

import java.util.HashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics for Gopher-style quality filtering
  * (Rae et al. 2021 §A1.1: "repetitious documents are typically
  * machine-generated"): token multiset stats, the most frequent token and
  * 2-gram, and the duplicate-3-gram count, all in ONE O(tokens) pass per
  * row. The composable alternative (explode → groupBy(doc, gram) →
  * groupBy(doc)) costs two hash shuffles of the full token stream — at
  * 100 TB that is the difference between a scan-speed column pass and a
  * corpus-wide shuffle, which is why this is a native expression rather
  * than DataFrame algebra (the same scan-not-shuffle call q53 makes).
  *
  * Ties for "most frequent" go to the lexicographically SMALLEST gram
  * (bytewise UTF8String order = DuckDB's default ASCII collation), so the
  * q58 oracle can replay the selection deterministically.
  *
  * Output struct (null top_tok/top_bigram when no token/bigram exists):
  * n_tokens, n_distinct, top_tok, top_tok_cnt, top_bigram, top_bigram_cnt,
  * n_trigrams, n_distinct_trigrams.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull=true is accepted because `split` DECLARES nullable
    // elements while never producing them; null entries, if any, are
    // skipped explicitly in compute (defined behavior, not undefined reads
    // — contrast graft_intersect_size, whose primitive getLong forces the
    // strict rejection)
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = RepetitionStats.Schema
  override def prettyName: String = "graft_repetition"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.expressions.RepetitionStats.compute($arr);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_tok", StringType, nullable = true),
    StructField("top_tok_cnt", LongType, nullable = false),
    StructField("top_bigram", StringType, nullable = true),
    StructField("top_bigram_cnt", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("n_distinct_trigrams", LongType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  /** (count, lexicographically-smallest-on-tie) argmax over a count map. */
  private def argmax(m: HashMap[UTF8String, Array[Int]]): (UTF8String, Long) = {
    var bestKey: UTF8String = null
    var bestCnt = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > bestCnt || (c == bestCnt && bestKey != null && e.getKey.compareTo(bestKey) < 0)) {
        bestKey = e.getKey
        bestCnt = c
      }
    }
    (bestKey, bestCnt.toLong)
  }

  private def bump(m: HashMap[UTF8String, Array[Int]], k: UTF8String): Unit = {
    val v = m.get(k)
    if (v == null) m.put(k, Array(1)) else v(0) += 1
  }

  def compute(arr: ArrayData): InternalRow = {
    val nIn = arr.numElements()
    val toks = new Array[UTF8String](nIn)
    var n = 0
    var k = 0
    while (k < nIn) { // null tokens are skipped (see checkInputDataTypes)
      if (!arr.isNullAt(k)) { toks(n) = arr.getUTF8String(k); n += 1 }
      k += 1
    }
    var i = 0

    val tokCnt = new HashMap[UTF8String, Array[Int]](n * 2)
    i = 0
    while (i < n) { bump(tokCnt, toks(i)); i += 1 }

    val bigramCnt = new HashMap[UTF8String, Array[Int]](n * 2)
    i = 0
    while (i < n - 1) {
      bump(bigramCnt, UTF8String.concatWs(Space, toks(i), toks(i + 1)))
      i += 1
    }

    val triSeen = new java.util.HashSet[UTF8String](n * 2)
    var nTri = 0L
    i = 0
    while (i < n - 2) {
      triSeen.add(UTF8String.concatWs(Space, toks(i), toks(i + 1), toks(i + 2)))
      nTri += 1
      i += 1
    }

    val (topTok, topTokCnt) = argmax(tokCnt)
    val (topBg, topBgCnt) = argmax(bigramCnt)
    new GenericInternalRow(Array[Any](
      n.toLong, tokCnt.size().toLong,
      topTok, topTokCnt,
      topBg, topBgCnt,
      nTri, triSeen.size().toLong))
  }
}
