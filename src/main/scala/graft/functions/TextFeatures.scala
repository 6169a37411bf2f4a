package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text feature extraction as native Catalyst expressions.
  *
  * Semantics are kept EXACTLY equal to the declarative forms the DuckDB
  * oracles use (and which these replace for speed):
  *  - word shingles = `array_distinct(transform(...))` over
  *    `split(text, ' ')` with empty tokens preserved (regex split,
  *    limit -1 semantics);
  *  - char grams = `array_distinct` of all `substring(text, i, n)`,
  *    1-based, i ≤ len-n+1.
  *
  * The higher-order-function chains evaluate an expression tree per
  * element; these do one JVM loop per document (7.3 s → sub-second for
  * 50 k docs at sf0.1).
  */
object TextFeatures {

  /** Split on single spaces, KEEPING empty tokens (Spark `split(s, " ")`
    * with default limit -1).
    */
  private def splitKeepEmpty(s: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toArray
  }

  /** Output arrays are SORTED (UTF8String binary order): every consumer is
    * order-independent (min-hash minima, set intersection, explode joins),
    * and sortedness lets [[ArrayJaccard]] use an allocation-free
    * merge-intersect instead of a per-pair hash set.
    */
  private def toSortedArray(seen: mutable.LinkedHashSet[String]): ArrayData = {
    val arr = seen.iterator.map(UTF8String.fromString).toArray
    java.util.Arrays.sort(arr, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(arr.map(x => x: Any))
  }

  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val ws = splitKeepEmpty(text.toString)
    if (ws.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= ws.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(ws(i + k))
        k += 1
      }
      seen += sb.toString
      i += 1
    }
    toSortedArray(seen)
  }

  def charGrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    if (s.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    while (i <= s.length - n) {
      seen += s.substring(i, i + n)
      i += 1
    }
    toSortedArray(seen)
  }

  /** See [[WordShingleHashesExpr]]. Seed-chained XXH64 over in-place word
    * hashes; sort + unique on a primitive long[].
    */
  def wordShingleHashes(text: UTF8String, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    // word boundaries: split on 0x20, keeping empty words (split semantics)
    var nWords = 1
    var i = 0
    while (i < len) {
      if (text.getByte(i) == 0x20) nWords += 1
      i += 1
    }
    if (nWords < n) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val wh = new Array[Long](nWords)
    var w = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || text.getByte(i) == 0x20) {
        wh(w) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        w += 1
        start = i + 1
      }
      i += 1
    }
    val g = nWords - n + 1
    val hs = new Array[Long](g)
    var j = 0
    while (j < g) {
      var h = wh(j)
      var k = 1
      while (k < n) { h = XXH64.hashLong(wh(j + k), h); k += 1 }
      hs(j) = h
      j += 1
    }
    java.util.Arrays.sort(hs)
    var uniq = 0
    j = 0
    while (j < g) {
      if (j == 0 || hs(j) != hs(j - 1)) { hs(uniq) = hs(j); uniq += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, uniq))
  }

  /** EVERY overlapping n-word window of the text as a 64-bit hash id, in
    * position order — [[wordShingleHashes]] without the distinct/sort:
    * occurrence COUNTS matter here (a window is a duplicate iff its
    * content occurs anywhere else, including elsewhere in the same
    * document), so nothing may collapse.
    */
  def wordWindowHashes(text: UTF8String, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    var nWords = 1
    var i = 0
    while (i < len) {
      if (text.getByte(i) == 0x20) nWords += 1
      i += 1
    }
    if (nWords < n) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val wh = new Array[Long](nWords)
    var w = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || text.getByte(i) == 0x20) {
        wh(w) = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        w += 1
        start = i + 1
      }
      i += 1
    }
    val g = nWords - n + 1
    val hs = new Array[Long](g)
    var j = 0
    while (j < g) {
      var h = wh(j)
      var k = 1
      while (k < n) { h = XXH64.hashLong(wh(j + k), h); k += 1 }
      hs(j) = h
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(hs)
  }

  /** Distinct character n-grams as ASC-SORTED 64-bit hash ids — the
    * [[wordShingleHashes]] treatment for [[charGrams]]: same char-based
    * (UTF-16 unit) segmentation as the string kernel so distinct-set
    * cardinalities agree, gram ids from an XXH64 chain over the chars,
    * sort-unique on a primitive long[].
    */
  def charGramHashes(text: UTF8String, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val s = text.toString
    if (s.length < n) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val g = s.length - n + 1
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      var h = XXH64.hashLong(s.charAt(i).toLong, 42L)
      var k = 1
      while (k < n) { h = XXH64.hashLong(s.charAt(i + k).toLong, h); k += 1 }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    var uniq = 0
    i = 0
    while (i < g) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(uniq) = hs(i); uniq += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, uniq))
  }

  def wordShinglesCol(c: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(c), n))

  def wordShingleHashesCol(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingleHashesExpr(ColumnBridge.expression(c), n))

  def wordWindowHashesCol(c: Column, n: Int): Column =
    ColumnBridge.column(WordWindowHashesExpr(ColumnBridge.expression(c), n))

  def charGramHashesCol(c: Column, n: Int): Column =
    ColumnBridge.column(CharGramHashesExpr(ColumnBridge.expression(c), n))

  def charGramsCol(c: Column, n: Int): Column =
    ColumnBridge.column(CharGramsExpr(ColumnBridge.expression(c), n))
}

case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextFeatures.wordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFeatures.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

case class CharGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextFeatures.charGrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFeatures.charGrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharGramsExpr =
    copy(child = newChild)
}

/** Distinct n-word shingles of a string as ASC-SORTED 64-bit hash ids —
  * the fused form of `xxhash64(explode(word_shingles(text, n)))` for
  * consumers that only need an injective token id (set intersection,
  * prefix joins, df counts are all invariant under the bijection).
  *
  * Allocation discipline is the point: words are hashed IN PLACE from
  * the UTF8 byte array (a 0x20 space byte never occurs inside a UTF-8
  * multi-byte sequence, so byte scanning is codepoint-safe), each
  * shingle id is an XXH64 seed-chain over its word hashes (no shingle
  * string is ever built), and dedup is sort-plus-unique on a primitive
  * long[] emitted as UnsafeArrayData — no hash set, no boxing. Replaced
  * a string-array kernel + per-row explode-and-hash that was the most
  * expensive leaf of the ppjoin build phase.
  */
/** [[TextFeatures.wordWindowHashes]] as an expression: every overlapping
  * n-word window hash in position order (duplicates preserved).
  */
case class WordWindowHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextFeatures.wordWindowHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextFeatures.wordWindowHashes($c, $n)")
  override protected def withNewChildInternal(
      newChild: Expression): WordWindowHashesExpr =
    copy(child = newChild)
}

/** [[TextFeatures.charGramHashes]] as an expression. */
case class CharGramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextFeatures.charGramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextFeatures.charGramHashes($c, $n)")
  override protected def withNewChildInternal(
      newChild: Expression): CharGramHashesExpr =
    copy(child = newChild)
}

case class WordShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextFeatures.wordShingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextFeatures.wordShingleHashes($c, $n)")
  override protected def withNewChildInternal(
      newChild: Expression): WordShingleHashesExpr =
    copy(child = newChild)
}
