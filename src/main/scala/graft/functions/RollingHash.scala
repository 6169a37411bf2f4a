package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash over the string's unicode
  * code points, `h = (h*31 + cp) mod 1e9+7`, seeded with the first code
  * point (matching the shape of a DuckDB `list_reduce` fold so the oracle
  * can reproduce it exactly).
  *
  * A native Catalyst expression with codegen (not a Scala UDF): stays
  * inside WholeStageCodegen, no serialization of row values in the hot
  * path — this is the pattern for custom scalar kernels at 100 TB.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 1000000007L

  /** First code point seeds; the rest fold with `(h*31 + cp) % Mod`. */
  def hash(s: String): Long = {
    if (s.isEmpty) return 0L
    var i = 0
    var h = -1L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = if (h < 0) cp.toLong else (h * 31L + cp.toLong) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def rollingHash(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  }
}
