package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002): the buffer is
  * the k smallest DISTINCT hash values seen; the estimator
  * (k−1)·H/u_(k) (H the hash range) needs only that buffer, and two
  * buffers merge by union-and-retake-k — a true bounded-state monoid, so
  * partial aggregation, cross-snapshot merging, and streaming state all
  * work with k·8 bytes per group.
  *
  * Unlike HyperLogLog++ (`approx_count_distinct`, whose register layout and
  * estimate are engine-specific), KMV over md5-derived hashes is EXACTLY
  * reproducible in any engine — the oracle recomputes the same k minima
  * and the same estimate, so the driver hash-compare covers the sketch
  * itself, not just a tolerance band.
  *
  * Input rows are 60-bit non-negative hash values (the caller derives them
  * from md5 — 15 hex digits keep BIGINT arithmetic portable); nulls are
  * skipped. Output: sorted array<long> of at most k distinct minima.
  */
case class KmvAgg(child: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "KmvAgg: k must be >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[java.lang.Long]()
    while (bb.hasRemaining) s.add(bb.getLong)
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SketchFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** The k smallest distinct values of `hash60` per group (see [[KmvAgg]]). */
  def kmv_agg(hash60: Column, k: Int): Column =
    ColumnBridge.column(KmvAgg(
      ColumnBridge.expression(hash60.cast("long")), k).toAggregateExpression())
}
