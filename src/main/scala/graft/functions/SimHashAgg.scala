package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash vote aggregate — a custom `TypedImperativeAggregate` whose
  * buffer is the 64 bit-vote counters and whose result is the packed
  * 64-bit signature.
  *
  * The declarative formulation (64 parallel `sum(when(shiftright...)))`
  * columns + a 64-term bitwiseOR projection) is semantically identical
  * but generates a 64-buffer aggregate whose update method exceeds the
  * JIT's huge-method limit, dropping the hot loop to interpreted
  * execution. One imperative buffer keeps the update a tight 64-step
  * loop and the shuffle payload a 256-byte blob, and folds the
  * pack-to-long step into eval — the same "custom Catalyst only where
  * built-ins can't express it efficiently" bar as CosineSimilarity
  * (SURVEY.md §4). Null hashes are skipped (contribute no votes).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < 64) {
        buf(k) += (((h >>> k) & 1L).toInt << 1) - 1
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var k = 0
    while (k < 64) { b1(k) += b2(k); k += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var r = 0L
    var k = 0
    while (k < 64) {
      if (buf(k) > 0) r |= 1L << k
      k += 1
    }
    r
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(256)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  import org.apache.spark.sql.graftbridge.Bridge

  /** `simhash_agg(hash_col)`: packed 64-bit SimHash of a group. */
  def simhash_agg(c: Column): Column =
    Bridge.column(SimHashAgg(Bridge.expression(c)).toAggregateExpression())
}
