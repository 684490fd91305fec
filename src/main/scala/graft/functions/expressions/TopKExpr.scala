package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Bounded-state grouped top-K: the aggregate that makes "top K per group"
  * survive 100 TB. `graft_topk(score, id, k)` keeps the K largest
  * (score DESC, id ASC) pairs per group and returns them as a sorted
  * `array<struct<score bigint, id bigint>>`.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY s)` (q106's shape) shuffles and SORTS every row of every
  * group; this aggregate is a TypedImperativeAggregate with partial
  * merge, so the map side reduces each partition's contribution to ≤ K
  * pairs per group BEFORE the exchange — only k-sized states cross the
  * wire, and nothing is ever globally sorted. Same trick as Spark's own
  * `percentile_approx`/`collect_top_k` family: state is O(K), merges are
  * associative, result is order-insensitive — exactly the semiring
  * contract q96 gates for incremental maintenance, so a topk VIEW can be
  * maintained at change-volume cost too (inserts only; retractions need
  * the window twin).
  *
  * Scores ride the engine's e6 integer grid (Grid.scala convention), so
  * ordering is exact and engine-portable; ties break by id ASC, making
  * the result a deterministic function of the input SET (spec-pinned
  * against input order).
  *
  * Buffer: a flat growable long array holding (score, id) pairs,
  * compacted back to K by a partial quickselect-via-sort whenever it
  * reaches 4·K — amortized O(log K) per row, allocation-free steady
  * state. Serialization is the raw little-endian long pairs (compacted
  * first, so spilled/exchanged states are always ≤ K pairs). */
case class TopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"graft_topk: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  // analysis-time type contract: both score and id ride the engine's
  // bigint grid. Without this, a double score fails mid-execution with a
  // ClassCastException inside the aggregate instead of a clear error.
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq("score" -> score, "id" -> id).collect {
      case (n, e) if e.dataType != LongType => s"$n is ${e.dataType.simpleString}"
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk requires BIGINT score and id, got: ${bad.mkString(", ")}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    // null score or id = no entry for this row (SQL-agg convention)
    if (s != null && i != null) buf.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.addAll(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val arr = buf.sortedTopK()
    new GenericArrayData(arr.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): AnyRef
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_topk"
}

/** Growable (score, id) pair store bounded at 4·K with compaction to K.
  * Pairs are interleaved in one long array: [s0, i0, s1, i1, …]. */
final class TopKBuffer(val k: Int) {
  private var data = new Array[Long](math.min(4 * k, 64) * 2)
  private var n = 0 // pairs

  def add(s: Long, i: Long): Unit = {
    if (2 * n == data.length) {
      if (n >= 4 * k) compact()
      else data = java.util.Arrays.copyOf(data, data.length * 2)
    }
    data(2 * n) = s; data(2 * n + 1) = i; n += 1
  }

  def addAll(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.n) { add(other.data(2 * j), other.data(2 * j + 1)); j += 1 }
  }

  /** (score DESC, id ASC) order of pair p. */
  private def lt(a: Int, b: Int): Boolean = {
    val sa = data(2 * a); val sb = data(2 * b)
    if (sa != sb) sa > sb else data(2 * a + 1) < data(2 * b + 1)
  }

  private def compact(): Unit = {
    val idx = Array.range(0, n).sortWith(lt)
    val keep = math.min(k, n)
    val nd = new Array[Long](data.length)
    var j = 0
    while (j < keep) { nd(2 * j) = data(2 * idx(j)); nd(2 * j + 1) = data(2 * idx(j) + 1); j += 1 }
    data = nd; n = keep
  }

  def sortedTopK(): Array[(Long, Long)] = {
    compact()
    Array.tabulate(n)(j => (data(2 * j), data(2 * j + 1)))
  }

  def toBytes: Array[Byte] = {
    compact()
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var j = 0
    while (j < n) { bb.putLong(data(2 * j)); bb.putLong(data(2 * j + 1)); j += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.add(bb.getLong, bb.getLong); j += 1 }
    buf
  }
}
