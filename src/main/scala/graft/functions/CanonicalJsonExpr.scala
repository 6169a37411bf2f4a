package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `_stringify_any` (main.py:16-24) as a Column: complex
  * values become compact JSON with keys sorted (maps AND structs — python
  * `json.dumps(sort_keys=True)` sorts both), scalars their string form.
  * Spark's `to_json` preserves struct field order and map insertion order,
  * which is exactly the divergence this expression exists to close
  * (SURVEY.md §7.4.5).
  */
case class CanonicalJsonExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(CanonicalJsonExpr.render(input, child.dataType))

  override protected def withNewChildInternal(newChild: Expression): CanonicalJsonExpr =
    copy(child = newChild)
}

object CanonicalJsonExpr {

  def render(v: Any, dt: DataType): String = dt match {
    case StringType => v.asInstanceOf[UTF8String].toString
    case _: MapType | _: ArrayType | _: StructType =>
      val sb = new StringBuilder
      write(v, dt, sb)
      sb.toString
    case BooleanType => if (v.asInstanceOf[Boolean]) "True" else "False" // python str(bool)
    case _ => String.valueOf(v)
  }

  private def write(v: Any, dt: DataType, sb: StringBuilder): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case StringType => writeString(v.asInstanceOf[UTF8String].toString, sb)
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case IntegerType | LongType | ShortType | ByteType => sb.append(v.toString)
      case _: DecimalType => sb.append(v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString)
      case DoubleType | FloatType =>
        val d = v match { case f: Float => f.toDouble; case d: Double => d }
        if (d == math.rint(d) && math.abs(d) < 1e15) sb.append(d.toLong).append(".0")
        else sb.append(d.toString)
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(',')
          write(arr.get(i, et), et, sb)
          i += 1
        }
        sb.append(']')
      case MapType(StringType, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray()
        val vals = m.valueArray()
        val idx = (0 until m.numElements())
          .sortBy(i => keys.getUTF8String(i).toString)
        sb.append('{')
        var first = true
        idx.foreach { i =>
          if (!first) sb.append(',')
          first = false
          writeString(keys.getUTF8String(i).toString, sb)
          sb.append(':')
          write(vals.get(i, vt), vt, sb)
        }
        sb.append('}')
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        val idx = st.fields.indices.sortBy(st.fields(_).name)
        sb.append('{')
        var first = true
        idx.foreach { i =>
          if (!first) sb.append(',')
          first = false
          writeString(st.fields(i).name, sb)
          sb.append(':')
          write(row.get(i, st.fields(i).dataType), st.fields(i).dataType, sb)
        }
        sb.append('}')
      case other =>
        writeString(String.valueOf(v), sb)
    }
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  def canonicalJson(c: Column): Column =
    ColumnBridge.column(CanonicalJsonExpr(ColumnBridge.expression(c)))
}
