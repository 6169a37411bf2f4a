package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint statistics (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * as ONE scan-side codegen kernel: gram hashing, the w=4 sliding minimum
  * (rightmost-on-ties via position packing) and the distinct-selection
  * rollup are all per-document SEQUENTIAL work, so the idiomatic 100 TB
  * shape is a single O(n·w) pass inside WholeStageCodegen — not an
  * explode to n rows per document followed by a doc-keyed exchange and
  * window sort. The declarative spelling this replaces paid twice: five
  * `substr(text, i, 1)` calls per gram each re-scan the string from the
  * start to find the code-point offset (O(n²) CPU per document), and
  * every gram row crossed the window's shuffle. The kernel reads each
  * code point once.
  *
  * Semantics are bit-identical to the declarative form (and to the
  * DuckDB oracle, which still runs it declaratively — the hash match is
  * the proof): hash = exact base-131 polynomial over code points
  * (max < 131^4·128·1.01, inside BIGINT, no modulus); packed key =
  * `h·2^20 + (2^20−1−i)` so a plain `min` resolves value-then-rightmost;
  * the selected set is the distinct packed keys over complete windows
  * (`i ≤ n−8`); fingerprint = key DIV 2^20. Documents shorter than
  * k + w − 1 = 8 code points have no complete window and are filtered
  * by the caller (`length(text) >= 8`).
  */
case class WinnowStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WinnowStats.Schema
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_stats requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowStats.compute(input.asInstanceOf[UTF8String])

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.functions.WinnowStats.compute($c);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}

object WinnowStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_fingerprints", LongType, nullable = false),
    StructField("fp_sum", LongType, nullable = false),
    StructField("fp_min", LongType, nullable = false),
    StructField("fp_max", LongType, nullable = false)))

  private final val K = 5 // gram length
  private final val W = 4 // window size
  private final val PosBits = 20
  private final val PosMask = (1L << PosBits) - 1 // 1048575

  /** One O(n·w) pass: hash every k-gram, slide the w-window min, collect
    * the distinct packed keys, roll up the fingerprint stats. Returns
    * null when the document has no complete window (n < k + w − 1).
    */
  def compute(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val cps = s.codePoints().toArray()
    val n = cps.length
    if (n < K + W - 1) return null
    val g = n - K + 1
    val keys = new Array[Long](g)
    var j = 0
    while (j < g) {
      val h = ((((cps(j).toLong * 131 + cps(j + 1)) * 131 + cps(j + 2)) * 131
        + cps(j + 3)) * 131 + cps(j + 4))
      keys(j) = h * (1L << PosBits) + (PosMask - j)
      j += 1
    }
    val selected = new java.util.HashSet[java.lang.Long]()
    var count = 0L
    var sum = 0L
    var min = Long.MaxValue
    var max = Long.MinValue
    var i = 0
    val nWin = g - W + 1 // == n - 8 + 1 complete windows
    while (i < nWin) {
      var wkey = keys(i)
      var t = i + 1
      while (t < i + W) {
        if (keys(t) < wkey) wkey = keys(t)
        t += 1
      }
      if (selected.add(wkey)) {
        val fp = wkey / (1L << PosBits)
        count += 1
        sum += fp
        if (fp < min) min = fp
        if (fp > max) max = fp
      }
      i += 1
    }
    new GenericInternalRow(Array[Any]((n - K + 1).toLong, count, sum, min, max))
  }

  def winnowStats(c: Column): Column =
    ColumnBridge.column(WinnowStats(ColumnBridge.expression(c)))
}
