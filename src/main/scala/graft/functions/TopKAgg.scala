package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Top-k per group WITHOUT a window sort: a bounded binary heap lives in
  * the aggregation buffer, so each group keeps at most k (score, id)
  * entries through partial aggregation and merge.
  *
  * Scale rationale: the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`) shuffles
  * EVERY row and sorts every partition; this aggregate reduces each map
  * task's group to k entries before the exchange — the shuffle carries
  * O(groups × k), not O(rows). This is the `TypedImperativeAggregate`
  * rung of the custom-aggregate ladder (mutable buffer, explicit
  * serialization), alongside the `Aggregator`-based [[GeomMean]].
  *
  * Ordering: score descending, id ascending on ties — fully deterministic.
  * Output: array<struct<score double, id long>> sorted in rank order.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKByScore.entryType, containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((s, i) => buf.add(s, i))
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i): Any
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val entries = buf.sortedEntries
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.add(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByScore {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Column surface: `top_k_by_score(score, id, k)`. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}

/** Bounded min-heap on (score asc, id desc): the root is the WORST kept
  * entry, evicted when a better one arrives. "Better" = higher score, or
  * equal score with smaller id.
  */
final class TopKBuffer(k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  // true if (s1,i1) ranks WORSE than (s2,i2)
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def add(s: Double, i: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = i; n += 1
      siftUp(n - 1)
    } else if (k > 0 && worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown(0)
    }
  }

  private def siftUp(start: Int): Unit = {
    var c = start
    while (c > 0) {
      val p = (c - 1) / 2
      if (worse(scores(c), ids(c), scores(p), ids(p))) {
        swap(c, p); c = p
      } else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var p = start
    while (true) {
      val l = 2 * p + 1
      val r = l + 1
      var worst = p
      if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == p) return
      swap(p, worst); p = worst
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    var j = 0
    while (j < n) { f(scores(j), ids(j)); j += 1 }
  }

  /** rank order: score desc, id asc. */
  def sortedEntries: Array[(Double, Long)] =
    (0 until n).map(j => (scores(j), ids(j))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}
