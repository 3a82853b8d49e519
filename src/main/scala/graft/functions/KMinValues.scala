package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-Minimum-Values distinct-count sketch as a native Catalyst AGGREGATE
  * (`TypedImperativeAggregate`) — the custom-aggregate tier of the
  * extension ladder (scalar expressions live in SketchExpressions).
  *
  * The sketch is the set of the k smallest DISTINCT hash values seen
  * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream"). Cardinality estimate: if fewer than k distinct values were
  * seen the sketch IS the exact distinct set; otherwise
  * n̂ = (k-1)·H / kth-minimum, where H is the hash range. Unlike
  * HyperLogLog the sketch is a pure function of the input SET — no
  * stochastic averaging — so with an engine-portable hash (60-bit md5
  * slice, [[graft.operators.TextAnalysis]] discipline) another engine
  * reproduces the sketch, and the estimate, bit-for-bit: an
  * approximation algorithm with an EXACT differential oracle.
  *
  * Scale shape: partial aggregation keeps at most k longs per group per
  * partition; merges are linear in k. The shuffle carries k·8 bytes per
  * (group, partition) instead of every distinct value — the property
  * that makes distinct-count rollups affordable at 100 TB (same role as
  * the documented HLL swap for g5, but oracle-checkable).
  *
  * Buffer: a sorted, distinct, bounded-to-k Array[Long].
  */
case class KMinValues(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(k > 0, s"k must be positive, got $k")

  // Analysis-time contract: update() casts the child's value straight to
  // Long, so anything but LongType must fail before execution, not with a
  // ClassCastException mid-aggregation. (ExpectsInputTypes would say the
  // same thing, but its Seq[AbstractDataType] is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a BIGINT child (got ${child.dataType.sql}); " +
        "hash non-long inputs first (md5-slice discipline)")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  /** Insert one value: keep the buffer sorted+distinct, capped at k. */
  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than the current k minima
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else insert(buf, v.asInstanceOf[Long])
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    var i = 0
    while (i < b.length) { out = insert(out, b(i)); i += 1 }
    out
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): KMinValues =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinValues =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinValues =
    copy(child = newChildren.head)
}

object KMinValues {
  /** Column form: `kmv_sketch(hashCol, k)` → sorted array of the k
    * smallest distinct values. */
  def kmv_sketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KMinValues(ColumnBridge.expression(c), k).toAggregateExpression())
}
