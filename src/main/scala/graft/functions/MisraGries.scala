package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a `TypedImperativeAggregate`: at
  * most k (key, count) entries survive in the buffer, with the MERGEABLE
  * combine of Agarwal et al. 2012 ("Mergeable Summaries"): sum counts,
  * and if more than k keys remain, subtract the (k+1)-th largest count
  * from every entry and drop the non-positive ones.
  *
  * The guarantee this buys — under ANY partitioning and merge order:
  * estimates never overcount, undercount by at most N/(k+1), and every
  * key with true frequency above N/(k+1) is present in the summary. The
  * ESTIMATES themselves depend on Spark's nondeterministic merge order,
  * so queries must emit the certified PROPERTIES (which are
  * deterministic), not the raw estimates — the same discipline as the
  * approximate-ANN self-certification.
  *
  * Scale rationale: the exact alternative shuffles every key
  * (`groupBy(key).count`); this summary reduces each map task to ≤ k
  * entries before the exchange, so the shuffle carries O(tasks × k) for
  * any input size — the right shape for "top sources/domains/tokens on
  * 100 TB" dashboards that tolerate a bounded undercount.
  */
case class MisraGriesAgg(
    keyExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MisraGriesAgg.entryType, containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val key = keyExpr.eval(input)
    if (key != null) buf.add(key.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    other.counts.foreach { case (key, c) => buf.addNoTrim(key, c) }
    buf.trim()
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    // deterministic presentation: count desc, key asc
    val sorted = buf.counts.toArray.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    }
    new GenericArrayData(sorted.map { case (key, c) =>
      InternalRow(UTF8String.fromString(key), c): Any
    })
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val entries = buf.counts.toArray
    val keyBytes = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      4 + keyBytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(keyBytes).foreach { case ((_, c), kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MgBuffer(k)
    var j = 0
    while (j < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.addNoTrim(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(keyExpr = newChildren(0))
}

object MisraGriesAgg {
  val entryType: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))

  /** Column surface: `misra_gries(key, k)`. */
  def misraGries(key: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(key), k).toAggregateExpression())
}

/** k-bounded counter map with the classic decrement step and the
  * mergeable trim (subtract the (k+1)-th largest, keep positive).
  */
final class MgBuffer(k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(key: String, c: Long): Unit = { addNoTrim(key, c); trim() }

  def addNoTrim(key: String, c: Long): Unit =
    counts.update(key, counts.getOrElse(key, 0L) + c)

  def trim(): Unit = {
    if (counts.size > k) {
      val sorted = counts.values.toArray.sortWith(_ > _)
      val dec = sorted(k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.keysIterator.foreach { key =>
        val nv = counts(key) - dec
        if (nv > 0) counts.update(key, nv) else dead += key
      }
      dead.foreach(counts.remove)
    }
  }
}
