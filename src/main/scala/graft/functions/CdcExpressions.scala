package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import graft.avro.Coercions

/** Column-level CDC normalization kernels as native Catalyst expressions.
  *
  * These are the two conversions Spark has no built-in for (SURVEY.md §2.3
  * F6/F7, reference main.py:170-199):
  *  - [[AvroDecimalBytes]]: big-endian signed unscaled bytes, ASSUMED
  *    scale 30, rescaled to DECIMAL(38,9) with HALF_EVEN; errors → 0.
  *  - [[AvroDecimalNumeric]]: numeric → DECIMAL(38,9) with HALF_EVEN
  *    (Spark's own decimal cast rounds HALF_UP); overflow → null.
  */
case class AvroDecimalBytes(child: Expression) extends UnaryExpression {
  private val resultType = DecimalType(38, 9)
  override def dataType: DataType = resultType

  override def nullSafeEval(input: Any): Any =
    Decimal(Coercions.decimalFromBytes(input.asInstanceOf[Array[Byte]]), 38, 9)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.types.Decimal.apply(
          graft.avro.Coercions.decimalFromBytes($c), 38, 9)""")

  override protected def withNewChildInternal(newChild: Expression): AvroDecimalBytes =
    copy(child = newChild)
}

case class AvroDecimalNumeric(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 9)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = AvroDecimalNumeric.conv(input)

  override protected def withNewChildInternal(newChild: Expression): AvroDecimalNumeric =
    copy(child = newChild)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.types.Decimal r =
           graft.functions.AvroDecimalNumeric.conv((Object) $c);
         if (r == null) { ${ev.isNull} = true; }
         else { ${ev.value} = r; }""")
}

object AvroDecimalNumeric {
  /** Public for generated code. Null on (38,9) overflow. */
  def conv(input: Any): Decimal = {
    val jbd = input match {
      case d: java.lang.Double  => new JBigDecimal(d.toString)
      case f: java.lang.Float   => new JBigDecimal(f.toString)
      case l: java.lang.Long    => JBigDecimal.valueOf(l)
      case i: java.lang.Integer => JBigDecimal.valueOf(i.longValue())
      case d: Decimal           => d.toJavaBigDecimal
      case other                => new JBigDecimal(other.toString)
    }
    val q = jbd.setScale(9, java.math.RoundingMode.HALF_EVEN)
    // same prec-28 quantize envelope as Coercions.decimalFromNumber
    if (q.precision - q.scale > Coercions.MaxIntegerDigits) null
    else Decimal(q, 38, 9)
  }
}

object CdcExpressions {
  /** Scale-30 decimal bytes → DECIMAL(38,9), HALF_EVEN, zero-on-error. */
  def avroDecimalBytes(c: Column): Column =
    ColumnBridge.column(AvroDecimalBytes(ColumnBridge.expression(c)))

  /** Numeric → DECIMAL(38,9), HALF_EVEN, null-on-overflow. */
  def avroDecimal(c: Column): Column =
    ColumnBridge.column(AvroDecimalNumeric(ColumnBridge.expression(c)))
}
