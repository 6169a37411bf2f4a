package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL PNG pixel codec in pure JVM — no external codecs needed because
  * PNG's compression is zlib (`java.util.zip`). This is the full decode
  * path a training-data pipeline runs on image columns, not a header
  * sniff:
  *
  *  - [[encodeGray]] writes a spec-valid 8-bit grayscale PNG: signature,
  *    IHDR, one IDAT holding the zlib-deflated scanlines — each row
  *    prefixed by a REAL filter byte (None for row 0, Sub on odd rows,
  *    Up on even rows, so filter reconstruction is genuinely exercised)
  *    — and IEND, every chunk carrying its CRC-32.
  *  - [[decodeGray]] walks the chunks, VERIFIES each CRC, concatenates
  *    IDAT data, inflates, and reconstructs pixels through the full
  *    filter algebra (None/Sub/Up/Average/Paeth — the decoder handles
  *    all five even though the encoder emits three).
  *
  * Pixels are deterministic from (width, height, seed):
  * `px(x, y) = (7x + 13y + seed) mod 256` — so a SQL oracle can compute
  * expected statistics of the DECODED image independently. If the
  * deflate round-trip, the filter reconstruction, the CRC math, or the
  * sampling grid is wrong, the decoded stats diverge and the hash-match
  * fails.
  *
  * Decode failures (bad signature, CRC mismatch, truncated stream,
  * unsupported layout) return null — pipelines filter, they don't crash.
  */
object PngCodec {

  import BinReader.u32be

  private val Sig: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def putU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  private def chunk(
      out: java.io.ByteArrayOutputStream, tp: String, data: Array[Byte]): Unit = {
    putU32(out, data.length.toLong)
    val tpb = tp.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tpb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tpb); crc.update(data)
    putU32(out, crc.getValue)
  }

  /** The deterministic pixel function: `(7x + 13y + seed) mod 256`. */
  def px(x: Int, y: Int, seed: Long): Int =
    (((7L * x + 13L * y + seed) % 256L + 256L) % 256L).toInt

  /** Spec-valid 8-bit grayscale PNG of the deterministic pixel pattern. */
  def encodeGray(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    // filtered scanlines: row 0 None, odd rows Sub, even rows Up
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      val base = y * (w + 1)
      val f = if (y == 0) 0 else if (y % 2 == 1) 1 else 2
      raw(base) = f.toByte
      var x = 0
      while (x < w) {
        val cur = px(x, y, seed)
        val enc = f match {
          case 0 => cur
          case 1 => cur - (if (x == 0) 0 else px(x - 1, y, seed))
          case 2 => cur - px(x, y - 1, seed)
        }
        raw(base + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      zOut.write(buf, 0, n)
    }
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    Sig.foreach(out.write)
    val ihdr = new java.io.ByteArrayOutputStream()
    putU32(ihdr, w.toLong); putU32(ihdr, h.toLong)
    ihdr.write(8); ihdr.write(0) // bit depth 8, color type 0 (grayscale)
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression/filter/interlace
    chunk(out, "IHDR", ihdr.toByteArray)
    chunk(out, "IDAT", zOut.toByteArray)
    chunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Full grayscale decode: chunk walk + CRC verify + inflate + all five
    * filter reconstructions. Returns (width, height, pixels) or null.
    */
  def decodeGray(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (b == null || b.length < 45) return null
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != Sig(i)) return null; i += 1 }
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    var done = false
    while (!done && pos + 12 <= b.length) {
      val len = u32be(b, pos)
      if (len > b.length - pos - 12) return null
      val tp = new String(Array(b(pos + 4), b(pos + 5), b(pos + 6), b(pos + 7)),
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32()
      crc.update(b, pos + 4, 4 + len.toInt)
      if (crc.getValue != u32be(b, pos + 8 + len.toInt)) return null // corrupt
      tp match {
        case "IHDR" =>
          if (len != 13) return null
          w = u32be(b, pos + 8).toInt; h = u32be(b, pos + 12).toInt
          val bitDepth = b(pos + 16) & 0xff; val colorType = b(pos + 17) & 0xff
          val interlace = b(pos + 20) & 0xff
          if (bitDepth != 8 || colorType != 0 || interlace != 0) return null
        case "IDAT" => idat.write(b, pos + 8, len.toInt)
        case "IEND" => done = true
        case _      => () // ancillary chunk: skip (CRC already verified)
      }
      pos += 12 + len.toInt
    }
    if (w <= 0 || h <= 0 || idat.size() == 0) return null
    // dimension sanity BEFORE allocation: a crafted IHDR with valid CRCs
    // can declare w=2^31-1 (NegativeArraySizeException from (w+1)*h),
    // w=h=65536 ((w+1)*h wraps Int to a tiny array → AIOOBE in the
    // filter loop), or 50000×50000 (a multi-GB allocation bomb) — all
    // must return the documented null, not crash the task. The Long
    // product bound also caps memory: a real decode of anything bigger
    // than 64M gray pixels does not belong in a scan-side expression.
    if (w.toLong * h.toLong > (64L << 20) ||
      (w.toLong + 1L) * h.toLong > Int.MaxValue.toLong) return null

    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte]((w + 1) * h)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return null // truncated stream
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inflater.end()
    if (off != raw.length) return null

    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1)) & 0xff
      var x = 0
      while (x < w) {
        val cur = raw(y * (w + 1) + 1 + x) & 0xff
        val left = if (x == 0) 0 else out(y * w + x - 1) & 0xff
        val up = if (y == 0) 0 else out((y - 1) * w + x) & 0xff
        val upLeft = if (x == 0 || y == 0) 0 else out((y - 1) * w + x - 1) & 0xff
        val recon = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, upLeft)
          case _ => return null // invalid filter type
        }
        out(y * w + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  private def brightnessOf(w: Int, h: Int, p: Array[Byte]): Double = {
    var s = 0L; var i = 0
    while (i < p.length) { s += (p(i) & 0xff); i += 1 }
    s.toDouble / (w * h)
  }

  private def resizeCsvOf(w: Int, h: Int, p: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var cy = 0
    while (cy < 4) {
      var cx = 0
      while (cx < 4) {
        val x = cx * w / 4; val y = cy * h / 4
        if (sb.length > 0) sb.append(',')
        sb.append(p(y * w + x) & 0xff)
        cx += 1
      }
      cy += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Mean gray value of the DECODED pixels, null if undecodable. */
  def brightness(b: Array[Byte]): java.lang.Double = {
    val d = decodeGray(b)
    if (d == null) return null
    val (w, h, p) = d
    java.lang.Double.valueOf(brightnessOf(w, h, p))
  }

  /** Nearest-neighbor 4×4 downsample of the decoded pixels, as CSV (the
    * driver compare cannot hash array columns). Sample grid:
    * `(floor(cx·w/4), floor(cy·h/4))` for cx, cy in 0..3, row-major.
    */
  def resizeCsv(b: Array[Byte]): UTF8String = {
    val d = decodeGray(b)
    if (d == null) return null
    val (w, h, p) = d
    resizeCsvOf(w, h, p)
  }

  /** EVERY decoded statistic from ONE decode — (width, height,
    * brightness, resized) as a Catalyst struct row, null if undecodable.
    * This is what [[PngDecodeStats]] evaluates: a query that needs
    * several readouts of the same image previously planned one
    * [[PngDecodeStat]] per readout, and each ran the full chunk walk +
    * CRC verify + inflate + filter reconstruction independently — a
    * per-row 2× (or worse) decode cost the adjudicated round-15 review
    * flagged on `q_multimodal_resize`'s hot path.
    */
  def decodeStatsRow(b: Array[Byte])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val d = decodeGray(b)
    if (d == null) return null
    val (w, h, p) = d
    org.apache.spark.sql.catalyst.InternalRow(
      w, h, brightnessOf(w, h, p), resizeCsvOf(w, h, p))
  }

  /** Average-hash (aHash) of the DECODED pixels: nearest-neighbor
    * downsample to 8×8 (`(floor(cx·w/8), floor(cy·h/8))`, row-major),
    * then bit_i = 1 iff sample_i is at or above the 8×8 mean. The mean
    * compare is integer-exact (`64·sample >= sum`), so no float crosses
    * the engine boundary; emitted as 16 lowercase hex chars, MSB = the
    * top-left sample. Null if undecodable.
    */
  def aHashHex(b: Array[Byte]): UTF8String = {
    val d = decodeGray(b)
    if (d == null) return null
    val (w, h, p) = d
    val s = new Array[Int](64)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        s(cy * 8 + cx) = p((cy * h / 8) * w + (cx * w / 8)) & 0xff
        cx += 1
      }
      cy += 1
    }
    var sum = 0L
    var i = 0
    while (i < 64) { sum += s(i); i += 1 }
    var bits = 0L
    i = 0
    while (i < 64) {
      if (64L * s(i) >= sum) bits |= (1L << (63 - i))
      i += 1
    }
    UTF8String.fromString(f"$bits%016x")
  }
}

/** Deterministic grayscale PNG encode as a codegen expression. */
case class PngEncodeGray(wExpr: Expression, hExpr: Expression, seedExpr: Expression)
    extends TernaryExpression {
  override def first: Expression = wExpr
  override def second: Expression = hExpr
  override def third: Expression = seedExpr
  override def dataType: DataType = BinaryType

  override def nullSafeEval(w: Any, h: Any, s: Any): Any =
    PngCodec.encodeGray(w.asInstanceOf[Int], h.asInstanceOf[Int],
      s.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, h, s) =>
      s"graft.functions.PngCodec.encodeGray($w, $h, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, sec: Expression, t: Expression): PngEncodeGray =
    copy(wExpr = f, hExpr = sec, seedExpr = t)
}

/** Decoded-pixel statistic as a codegen expression:
  * attr ∈ brightness|resize4|ahash.
  */
case class PngDecodeStat(child: Expression, attr: String) extends UnaryExpression {
  require(Set("brightness", "resize4", "ahash")(attr), s"unknown png stat $attr")

  override def dataType: DataType =
    if (attr == "brightness") DoubleType else StringType
  override def nullable: Boolean = true
  override def prettyName: String = s"png_$attr"

  override def nullSafeEval(input: Any): Any = attr match {
    case "brightness" => PngCodec.brightness(input.asInstanceOf[Array[Byte]])
    case "resize4"    => PngCodec.resizeCsv(input.asInstanceOf[Array[Byte]])
    case "ahash"      => PngCodec.aHashHex(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    attr match {
      case "brightness" =>
        nullSafeCodeGen(ctx, ev, c =>
          s"""java.lang.Double v = graft.functions.PngCodec.brightness($c);
             if (v == null) { ${ev.isNull} = true; }
             else { ${ev.value} = v.doubleValue(); }""")
      case "resize4" =>
        nullSafeCodeGen(ctx, ev, c =>
          s"""org.apache.spark.unsafe.types.UTF8String v =
               graft.functions.PngCodec.resizeCsv($c);
             if (v == null) { ${ev.isNull} = true; } else { ${ev.value} = v; }""")
      case "ahash" =>
        nullSafeCodeGen(ctx, ev, c =>
          s"""org.apache.spark.unsafe.types.UTF8String v =
               graft.functions.PngCodec.aHashHex($c);
             if (v == null) { ${ev.isNull} = true; } else { ${ev.value} = v; }""")
    }

  override protected def withNewChildInternal(newChild: Expression): PngDecodeStat =
    copy(child = newChild)
}

/** All decoded readouts of one PNG as a STRUCT from a SINGLE decode:
  * `png_decode_stats(binary)` → `STRUCT<width INT, height INT,
  * brightness DOUBLE, resized STRING>`, null when undecodable. The
  * expression is deliberately NOT cheap in CollapseProject's sense, so
  * aliasing it in one projection and extracting fields in the next keeps
  * exactly one decode per row in the plan — the optimizer refuses to
  * inline a non-trivial producer into several consumers (pinned by
  * PlanAuditSpec on `q_multimodal_resize`).
  */
case class PngDecodeStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("brightness", DoubleType, nullable = false),
    StructField("resized", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "png_decode_stats"

  override def nullSafeEval(input: Any): Any =
    PngCodec.decodeStatsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: with a non-nullable child the snippet is emitted
      // without an enclosing block, and a fixed local would collide if
      // two decodes land in one generated function
      val r = ctx.freshName("pngStats")
      s"""org.apache.spark.sql.catalyst.InternalRow $r =
           graft.functions.PngCodec.decodeStatsRow($c);
         if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }"""
    })

  override protected def withNewChildInternal(newChild: Expression): PngDecodeStats =
    copy(child = newChild)
}

object PngOps {
  def pngDecodeStats(c: Column): Column =
    ColumnBridge.column(PngDecodeStats(ColumnBridge.expression(c)))
  def pngEncodeGray(w: Column, h: Column, seed: Column): Column =
    ColumnBridge.column(PngEncodeGray(ColumnBridge.expression(w),
      ColumnBridge.expression(h), ColumnBridge.expression(seed)))
  def pngBrightness(c: Column): Column =
    ColumnBridge.column(PngDecodeStat(ColumnBridge.expression(c), "brightness"))
  def pngResize4(c: Column): Column =
    ColumnBridge.column(PngDecodeStat(ColumnBridge.expression(c), "resize4"))
  def pngAHash(c: Column): Column =
    ColumnBridge.column(PngDecodeStat(ColumnBridge.expression(c), "ahash"))
}
