package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression (the Scala counterpart of a UDTF): emits
  * one row per distinct word shingle — `(pos, shingle)` — directly from
  * the text, WITHOUT materializing the intermediate array that
  * `explode(shingles(text))` builds per document. Plugs into Catalyst's
  * `Generate` operator like `explode`/`posexplode` do.
  */
case class ShingleGenerator(child: Expression, n: Int)
  extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)
  override val inline: Boolean = false
  override def position: Boolean = true

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr: ArrayData = TextFeatures.wordShingles(v.asInstanceOf[UTF8String], n)
    (0 until arr.numElements()).iterator.map { i =>
      InternalRow(i, arr.getUTF8String(i))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}

object ShingleGenerator {
  /** `select(col("doc_id"), shingleRows(col("text"), 3))` → one row per
    * (pos, shingle).
    */
  def shingleRows(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleGenerator(ColumnBridge.expression(text), n))
}
