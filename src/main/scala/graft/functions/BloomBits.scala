package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bloom-filter bitmap as a `TypedImperativeAggregate`: each input row
  * contributes an `ARRAY<BIGINT>` of bit positions (the k hash slots of
  * one item), the buffer is the m-bit bitmap as `Array[Long]` words, and
  * both update and merge are bitwise OR — fully associative and
  * commutative, so the result is deterministic under ANY partitioning
  * and merge order (unlike count-style sketches, a bloom bitmap has no
  * order-dependent state at all).
  *
  * The position computation is left to the caller so it can be built
  * from engine-portable primitives (md5 hex → integer double hashing)
  * that a SQL oracle reproduces bit-for-bit; this class is only the
  * distributed OR-reduction. Map-side partial aggregation reduces every
  * task to one m/64-word array before the exchange, so the shuffle
  * carries O(tasks × m/8) bytes for any input size — the standard
  * "build a filter on 100 TB in one pass" shape. The result is emitted
  * as `ARRAY<BIGINT>` so the probe side can test bits with built-in
  * (codegen) array/bit functions instead of a custom expression.
  */
case class BloomBitsAgg(
    positions: Expression,
    words: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(positions)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = positions.eval(input)
    if (arr != null) {
      val data = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < data.numElements()) {
        val pos = data.getLong(i)
        buf((pos >>> 6).toInt) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * words)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBitsAgg =
    copy(positions = newChildren(0))
}

object BloomBitsAgg {
  /** Column surface: `bloom_bits(positions, mBits)`; `mBits` must be a
    * multiple of 64.
    */
  def bloomBits(positions: Column, mBits: Int): Column = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    ColumnBridge.column(
      BloomBitsAgg(ColumnBridge.expression(positions), mBits / 64)
        .toAggregateExpression())
  }
}
