package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Dense-vector kernels as native codegen expressions.
  *
  * The declarative spellings (`aggregate(zip_with(a, b, *), 0.0, +)`) are
  * semantically right but allocate an intermediate array per row-pair and,
  * worse, when the "vector" side is a LITERAL (centroid matrices), expand
  * into enormous codegen that Janino recompiles for every new literal set —
  * measured as the dominant cost of the IVF query at sf0.1 (2000 rows,
  * ~2.7 s). These kernels evaluate in one tight JVM loop with the constant
  * matrix attached as a codegen reference object.
  *
  * [[ArrayDot]] keeps the EXACT left-to-right double fold of the
  * declarative version (and of DuckDB's `list_cosine_similarity` inner
  * product), so rounded outputs stay engine-identical.
  */
object VecOps {

  def dotSeq(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** scores(j) = v·c_j − ‖c_j‖²/2 — the euclidean-argmin-equivalent score
    * against every centroid, one pass, matrix shared across rows.
    */
  def centroidScores(v: ArrayData, cents: Array[Array[Double]],
      halves: Array[Double]): ArrayData = {
    val k = cents.length
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      var acc = 0.0
      var i = 0
      while (i < c.length) { acc += v.getDouble(i) * c(i); i += 1 }
      out(j) = acc - halves(j)
      j += 1
    }
    new GenericArrayData(out)
  }

  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def centroidScoresCol(v: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidScores(ColumnBridge.expression(v), cents))

  def vecAvgCol(v: Column, dim: Int): Column =
    ColumnBridge.column(VecAvg(ColumnBridge.expression(v), dim)
      .toAggregateExpression())
}

/** Sequential-fold dot product of two ARRAY<DOUBLE> columns. */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotSeq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dotSeq($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** All-centroid scores for one vector; the (small, driver-trained) matrix
  * rides along as a codegen reference object, NOT as literal SQL — constant
  * codegen size regardless of k×dim.
  */
case class CentroidScores(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  @transient private lazy val halves: Array[Double] =
    cents.map(c => c.map(x => x * x).sum / 2.0)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VecOps.centroidScores(input.asInstanceOf[ArrayData], cents, halves)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val halvesRef = ctx.addReferenceObj("halves", halves, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VecOps.centroidScores($v, $centsRef, $halvesRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): CentroidScores =
    copy(child = newChild)
}

/** Element-wise average of ARRAY<DOUBLE> values: the centroid-update
  * aggregate. Map-side partial aggregation ships ONE (sum[dim], count)
  * buffer per group per partition — versus the posexplode formulation's
  * n×dim shuffled rows.
  */
case class VecAvg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecAvgBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecAvgBuffer =
    new VecAvgBuffer(new Array[Double](dim), 0L)

  override def update(buf: VecAvgBuffer, input: InternalRow): VecAvgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < dim) { buf.sums(i) += arr.getDouble(i); i += 1 }
      buf.count += 1
    }
    buf
  }

  override def merge(b1: VecAvgBuffer, b2: VecAvgBuffer): VecAvgBuffer = {
    var i = 0
    while (i < dim) { b1.sums(i) += b2.sums(i); i += 1 }
    b1.count += b2.count
    b1
  }

  override def eval(buf: VecAvgBuffer): Any =
    if (buf.count == 0L) null
    else new GenericArrayData(buf.sums.map(_ / buf.count))

  override def serialize(buf: VecAvgBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * dim)
    bb.putLong(buf.count)
    buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecAvgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val sums = Array.fill(dim)(bb.getDouble)
    new VecAvgBuffer(sums, count)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecAvg =
    copy(child = newChildren.head)
}

final class VecAvgBuffer(val sums: Array[Double], var count: Long)
