package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

import scala.collection.mutable

/** Bounded-heap TOP-K aggregate — the scale-correct form of "top k
  * rows per group".
  *
  * The declarative spellings both pay full freight at 100 TB: a
  * window `row_number() <= k` shuffles and SORTS every row of every
  * group; `slice(sort_array(collect_list(...)))` partial-aggregates
  * map-side but the buffer still accumulates EVERY row, so the
  * shuffle carries the whole group anyway. This aggregate's buffer is
  * a k-bounded heap (O(log k) insert, O(k) memory), so the map-side
  * partial reduces each group to AT MOST k rows per input partition
  * before the exchange — the shuffle volume drops from O(rows) to
  * O(k · partitions · groups), the same reduction TakeOrderedAndProject
  * gives the global top-k (SortsSets O3), now per group.
  *
  * Ordering is the struct's lexicographic order over ALL fields
  * (deterministic when the caller includes a unique tiebreak field —
  * same contract as every orderBy in this library). `smallest` keeps
  * the k minimum rows, otherwise the k maximum; eval returns them
  * best-first.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    smallest: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"top_k_rows: k must be positive, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  /** Total order on the candidate structs. */
  private lazy val keepOrd: Ordering[InternalRow] = {
    val base = TypeUtils.getInterpretedOrdering(structType)
    new Ordering[InternalRow] {
      def compare(a: InternalRow, b: InternalRow): Int = base.compare(a, b)
    }
  }

  /** Heap order: the element the queue dequeues first is the one to
    * EVICT (the worst kept row).
    */
  private lazy val evictOrd: Ordering[InternalRow] =
    if (smallest) keepOrd else keepOrd.reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](evictOrd)

  private def offer(buf: mutable.PriorityQueue[InternalRow],
      row: InternalRow): Unit = {
    if (buf.size < k) buf.enqueue(row)
    else if (evictOrd.lt(row, buf.head)) { buf.dequeue(); buf.enqueue(row) }
  }

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(b1: mutable.PriorityQueue[InternalRow],
      b2: mutable.PriorityQueue[InternalRow])
      : mutable.PriorityQueue[InternalRow] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any = {
    val rows = buf.toArray.sorted(
      if (smallest) keepOrd else keepOrd.reverse)
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: mutable.PriorityQueue[InternalRow])
      : Array[Byte] = {
    // proj reuses ONE target buffer and getBytes may return its
    // backing array uncopied — clone per row or every serialized row
    // aliases the last one
    val rows = buf.toArray.map { r =>
      val b = proj(r).getBytes
      java.util.Arrays.copyOf(b, b.length)
    }
    val bb = java.nio.ByteBuffer.allocate(
      4 + rows.map(_.length + 4).sum)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[InternalRow] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "top_k_rows"

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {
  import org.apache.spark.sql.graftbridge.Bridge

  /** `top_k_rows(struct(...), k)`: the k lexicographically largest
    * (or smallest) struct rows of the group, best-first.
    */
  def top_k_rows(c: Column, k: Int, smallest: Boolean = false): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(c), k, smallest).toAggregateExpression())
}
