package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Boundary-array bucket lookup: maps a double to the number of
  * boundaries ≤ it (a rank bucket) via binary search. The boundary array
  * — driver-computed once with `approxQuantile` — rides along as a
  * codegen reference object, NOT literal SQL: constant codegen size at
  * any resolution (a 1024-element literal array would explode the
  * generated code and force a Janino recompile per boundary set, the
  * same failure mode measured on the IVF centroid literals).
  */
object Bucketize {

  /** Number of boundaries ≤ v; `bounds` ascending (duplicates collapse
    * skewed values into one bucket, which is exactly what a rank bucket
    * should do). O(log m) per row.
    */
  def search(v: Double, bounds: Array[Double]): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  def bucketOfCol(c: Column, bounds: Array[Double]): Column =
    ColumnBridge.column(BucketOf(ColumnBridge.expression(c), bounds))
}

/** `search` as a unary codegen expression over an ARRAY-free double
  * input; see [[Bucketize]].
  */
case class BucketOf(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Bucketize.search(input.asInstanceOf[Double], bounds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", bounds, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Bucketize.search($v, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BucketOf =
    copy(child = newChild)
}
