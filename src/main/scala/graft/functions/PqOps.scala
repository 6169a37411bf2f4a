package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (FAISS `PQ{M}x4`-style): the vector is
  * split into M contiguous sub-spaces, each encoded as the id of its
  * nearest sub-codebook centroid — M small ints instead of `dim` floats.
  * Query scoring is asymmetric (ADC): the query precomputes a
  * `M × K` lookup table of sub-dot-products once, and each corpus
  * vector's approximate dot product is then M table reads — no float
  * math per pair.
  *
  * The codebook (`M × K × dim/M` doubles, driver-trained) rides along as
  * a codegen reference object, like [[CentroidScores]] — constant codegen
  * size, no literal SQL, no Janino recompiles.
  */
object PqOps {

  /** codes(m) = argmax_k (sub_m · c_mk − ‖c_mk‖²/2) — the euclidean
    * assignment per sub-space, one pass over the vector.
    */
  def encode(v: ArrayData, book: Array[Array[Array[Double]]],
      halves: Array[Array[Double]]): ArrayData = {
    val m = book.length
    val subDim = book(0)(0).length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = book(j)
      val hs = halves(j)
      val base = j * subDim
      var best = 0
      var bestScore = Double.NegativeInfinity
      var k = 0
      while (k < cents.length) {
        val c = cents(k)
        var acc = 0.0
        var i = 0
        while (i < subDim) { acc += v.getDouble(base + i) * c(i); i += 1 }
        acc -= hs(k)
        if (acc > bestScore) { bestScore = acc; best = k }
        k += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** lut(m*K + k) = sub_m(query) · c_mk — the query-side ADC table. */
  def lut(v: ArrayData, book: Array[Array[Array[Double]]]): ArrayData = {
    val m = book.length
    val kk = book(0).length
    val subDim = book(0)(0).length
    val out = new Array[Double](m * kk)
    var j = 0
    while (j < m) {
      val cents = book(j)
      val base = j * subDim
      var k = 0
      while (k < kk) {
        val c = cents(k)
        var acc = 0.0
        var i = 0
        while (i < subDim) { acc += v.getDouble(base + i) * c(i); i += 1 }
        out(j * kk + k) = acc
        k += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** approx dot(query, corpus) = Σ_m lut(m*K + codes(m)) — M reads.
    * The stride K is DERIVED from the two arrays (lut length / code
    * count), never passed as a constant: the codebook's per-sub-space
    * size is data-dependent (the deterministic init takes the first
    * PqK corpus vectors — a sparse-id corpus yields fewer), and a
    * caller-supplied stride that disagreed with [[lut]]'s layout read
    * misaligned garbage scores (caught by a perturbed-data sweep:
    * recall collapsed only when ids 0..15 weren't all present).
    */
  def adc(lutArr: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    if (m == 0) return 0.0
    val k = lutArr.numElements() / m
    var acc = 0.0
    var j = 0
    while (j < m) { acc += lutArr.getDouble(j * k + codes.getInt(j)); j += 1 }
    acc
  }

  def encodeCol(v: Column, book: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), book))

  def lutCol(v: Column, book: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(v), book))

  def adcCol(lut: Column, codes: Column): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes)))
}

case class PqEncode(child: Expression, book: Array[Array[Array[Double]]])
    extends UnaryExpression {
  @transient private lazy val halves: Array[Array[Double]] =
    book.map(_.map(c => c.map(x => x * x).sum / 2.0))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    PqOps.encode(input.asInstanceOf[ArrayData], book, halves)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, "double[][][]")
    val halvesRef = ctx.addReferenceObj("pqHalves", halves, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.PqOps.encode($v, $bookRef, $halvesRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

case class PqLut(child: Expression, book: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    PqOps.lut(input.asInstanceOf[ArrayData], book)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, "double[][][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.PqOps.lut($v, $bookRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    PqOps.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.PqOps.adc($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
