package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image-container header parsing over a raw `BINARY` column — the
  * metadata-extraction step of a multimodal pipeline (width/height/format
  * sniffed from the payload bytes themselves, not from side metadata).
  *
  * Containers parsed (all from their public file-format specs):
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, first chunk must be
  *    `IHDR`; width and height are big-endian u32 at byte offsets 16 and 20.
  *  - JPEG: `FF D8` SOI, then a marker WALK — each segment is
  *    `FF <marker> <u16 big-endian length>`; standalone markers (RSTn, TEM)
  *    have no length. Dimensions live in the frame header (SOF0–SOF15,
  *    excluding DHT/JPG/DAC C4/C8/CC): height u16 at segment offset 3,
  *    width u16 at offset 5 (after the precision byte).
  *  - GIF: `GIF87a`/`GIF89a`, then the logical screen descriptor: width and
  *    height as LITTLE-endian u16 at offsets 6 and 8.
  *
  * Anything else (or a truncated/corrupt header) parses to null — a
  * training-data pipeline filters those rows rather than failing the job.
  *
  * Exposed as native codegen expressions ([[ImageHeaderAttr]]) so the parse
  * stays inside whole-stage codegen: the generated code is a single static
  * call into [[ImageHeader]], no UDF serialization, no interpreted eval on
  * the hot path. The parse touches only the first ~few hundred bytes of the
  * payload regardless of payload size.
  */
object ImageHeader {

  import BinReader.{u16be, u16le, u32be}

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && PngSig.indices.forall(i => (b(i) & 0xff) == PngSig(i)) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Walks JPEG segments from SOI to the first frame header (SOFn) and
    * returns (width, height), or null if no frame header is found. DHT
    * (C4), JPG (C8) and DAC (CC) share the SOF marker range but carry no
    * dimensions and are skipped like any other tabled segment.
    */
  private def jpegDims(b: Array[Byte]): Array[Int] = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return null // desynced — not a marker
      val m = b(i + 1) & 0xff
      if (m == 0xff) { i += 1 } // fill bytes before a marker are legal
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2 // standalone marker: no length field
      } else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (i + 8 >= b.length) return null
        return Array(u16be(b, i + 7), u16be(b, i + 5)) // (width, height)
      } else if (m == 0xd9) {
        return null // EOI before any SOF
      } else {
        val segLen = u16be(b, i + 2)
        if (segLen < 2) return null
        i += 2 + segLen
      }
    }
    null
  }

  /** Container format from magic bytes: "png" | "jpeg" | "gif" | null. */
  def format(b: Array[Byte]): UTF8String =
    if (b == null) null
    else if (isPng(b)) UTF8String.fromString("png")
    else if (isJpeg(b)) UTF8String.fromString("jpeg")
    else if (isGif(b)) UTF8String.fromString("gif")
    else null

  /** Parsed pixel width, null when the header is absent or truncated. */
  def width(b: Array[Byte]): Integer =
    if (b == null) null
    else if (isPng(b)) Int.box(u32be(b, 16).toInt)
    else if (isJpeg(b)) { val d = jpegDims(b); if (d == null) null else Int.box(d(0)) }
    else if (isGif(b)) Int.box(u16le(b, 6))
    else null

  /** Parsed pixel height, null when the header is absent or truncated. */
  def height(b: Array[Byte]): Integer =
    if (b == null) null
    else if (isPng(b)) Int.box(u32be(b, 20).toInt)
    else if (isJpeg(b)) { val d = jpegDims(b); if (d == null) null else Int.box(d(1)) }
    else if (isGif(b)) Int.box(u16le(b, 8))
    else null
}

/** Header attribute as a codegen expression: `attr` ∈ format|width|height. */
case class ImageHeaderAttr(child: Expression, attr: String) extends UnaryExpression {
  require(Set("format", "width", "height")(attr), s"unknown image attr $attr")

  override def dataType: DataType =
    if (attr == "format") StringType else IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = s"image_$attr"

  override def nullSafeEval(input: Any): Any = attr match {
    case "format" => ImageHeader.format(input.asInstanceOf[Array[Byte]])
    case "width"  => ImageHeader.width(input.asInstanceOf[Array[Byte]])
    case "height" => ImageHeader.height(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    attr match {
      case "format" =>
        nullSafeCodeGen(ctx, ev, c =>
          s"""org.apache.spark.unsafe.types.UTF8String f =
               graft.functions.ImageHeader.format($c);
             if (f == null) { ${ev.isNull} = true; } else { ${ev.value} = f; }""")
      case "width" =>
        nullSafeCodeGen(ctx, ev, c =>
          s"""java.lang.Integer w = graft.functions.ImageHeader.width($c);
             if (w == null) { ${ev.isNull} = true; }
             else { ${ev.value} = w.intValue(); }""")
      case "height" =>
        nullSafeCodeGen(ctx, ev, c =>
          s"""java.lang.Integer h = graft.functions.ImageHeader.height($c);
             if (h == null) { ${ev.isNull} = true; }
             else { ${ev.value} = h.intValue(); }""")
    }

  override protected def withNewChildInternal(newChild: Expression): ImageHeaderAttr =
    copy(child = newChild)
}

object ImageHeaderOps {
  def imageFormat(c: Column): Column =
    ColumnBridge.column(ImageHeaderAttr(ColumnBridge.expression(c), "format"))
  def imageWidth(c: Column): Column =
    ColumnBridge.column(ImageHeaderAttr(ColumnBridge.expression(c), "width"))
  def imageHeight(c: Column): Column =
    ColumnBridge.column(ImageHeaderAttr(ColumnBridge.expression(c), "height"))
}

/** WAV (RIFF) container header parsing — the audio leg of the multimodal
  * family. Spec: `RIFF <u32le size> WAVE`, then a CHUNK WALK (`<4-byte
  * id> <u32le size> <payload>`, word-aligned): the `fmt ` chunk carries
  * PCM format/channels/sample-rate/bits, the `data` chunk's size gives
  * the sample count. The walk matters — WAV files legally carry LIST/
  * fact/cue chunks before `data`, so fixed offsets are wrong the same
  * way fixed JPEG offsets are.
  *
  * All little-endian, per the RIFF spec. Truncated/non-WAV bytes parse
  * to null.
  */
object WavHeader {

  import BinReader.{tag4, u16le, u32le}

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && tag4(b, 0) == "RIFF" && tag4(b, 8) == "WAVE"

  /** The ONE RIFF chunk walk behind [[parse]], [[pcmStats]] and
    * [[vadStats]] (previously three hand-copied walks — which drifted:
    * each had the same Int-overflow defect). Returns (channels, rate,
    * bits, block, dataOff, dataLen) with −1 for absent fields, or null
    * for non-WAV bytes. ALL position arithmetic is Long: a hostile
    * 32-bit size field near Int.MaxValue must neither wrap the chunk
    * index negative (`b(-2147483644)` — AIOOBE instead of the
    * documented null) nor slip a `off + len > length` bounds check by
    * wrapping it negative. A size field whose payload runs past the
    * buffer simply ends the walk — truncated containers degrade to
    * whatever chunks were complete, exactly the fixed-offset-free
    * posture the scaladoc promises.
    */
  private def walk(b: Array[Byte]): Array[Long] = {
    if (!isWav(b)) return null
    var channels = -1L; var rate = -1L; var bits = -1L; var block = -1L
    var dataOff = -1L; var dataLen = -1L
    var i = 12L
    while (i + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val ii = i.toInt // safe: i + 8 <= b.length <= Int.MaxValue
      val id = tag4(b, ii)
      val size = u32le(b, ii + 4) // unsigned 32-bit, always fits Long
      if (id == "fmt " && size >= 16 && i + 24 <= b.length) {
        channels = u16le(b, ii + 10).toLong
        rate = u32le(b, ii + 12)
        block = u16le(b, ii + 20).toLong
        bits = u16le(b, ii + 22).toLong
      } else if (id == "data") {
        dataOff = i + 8; dataLen = size
      }
      i += 8L + size + (size & 1L) // chunks are word-aligned
    }
    Array(channels, rate, bits, block, dataOff, dataLen)
  }

  /** (channels, sampleRate, bitsPerSample, blockAlign, dataSize) or null. */
  private def parse(b: Array[Byte]): Array[Long] = {
    val w = walk(b)
    if (w == null) return null
    val Array(channels, rate, bits, block, _, dataLen) = w
    if (channels <= 0 || rate <= 0 || block <= 0 || dataLen < 0) null
    else Array(channels, rate, bits, block, dataLen)
  }

  /** THE 16-bit-PCM data-range guard: (offset, length) of the verified
    * in-bounds data payload as Ints, or null. One implementation behind
    * [[pcmStats]], [[vadStats]], [[pcmSamples]] and [[vadFrames]] — the
    * walk-only gates and the folds MUST agree null-for-null (the
    * filter-then-extract query rewrite leans on it), so the guard lives
    * exactly once. Long compares: a near-Int.MaxValue claimed len cannot
    * wrap the bounds check negative and send a fold past the buffer.
    */
  private def pcmDataRange(b: Array[Byte]): Array[Int] = {
    val w = walk(b)
    if (w == null) return null
    val bits = w(2); val offL = w(4); val lenL = w(5)
    if (bits != 16 || offL < 0 || lenL < 0 || offL + lenL > b.length)
      return null
    Array(offL.toInt, lenL.toInt) // both <= b.length by the guard
  }

  /** Locate the 16-bit PCM payload and fold it: (n_samples, sum of
    * squares, peak |sample|). The walk is the same chunk scan as
    * [[parse]] but keeps the data OFFSET; samples are signed 16-bit
    * little-endian. All-integer folds — exact, associative,
    * engine-reproducible. Null unless a 16-bit PCM data chunk is found.
    */
  private def pcmStats(b: Array[Byte]): Array[Long] = {
    val r = pcmDataRange(b)
    if (r == null) return null
    val off = r(0); val len = r(1)
    val n = len / 2
    var ss = 0L; var peak = 0L; var k = 0
    while (k < n) {
      val v = (((b(off + 2 * k + 1)) << 8) | (b(off + 2 * k) & 0xff))
        .toShort.toLong
      ss += v * v
      val a = math.abs(v)
      if (a > peak) peak = a
      k += 1
    }
    Array(n.toLong, ss, peak)
  }

  /** Energy-threshold voice-activity fold over FULL 160-sample frames
    * (the trailing partial frame is dropped): a frame is ACTIVE iff its
    * mean square exceeds HALF the whole-clip mean square, decided on
    * the cross-multiplied integers 2·n·e_f > 160·ss (exact — no
    * division anywhere). Returns (n_frames, n_active, longest_run) or
    * null when no 16-bit PCM payload exists. Same chunk walk and
    * signed-sample fold as [[pcmStats]].
    */
  private def vadStats(b: Array[Byte]): Array[Long] = {
    val r = pcmDataRange(b)
    if (r == null) return null
    val off = r(0); val len = r(1)
    val n = len / 2
    val frames = n / 160
    if (frames == 0) return Array(0L, 0L, 0L)
    // pass 1: total sum of squares over the FULL-FRAME prefix
    var ss = 0L; var k = 0
    val m = frames * 160
    while (k < m) {
      val v = (((b(off + 2 * k + 1)) << 8) | (b(off + 2 * k) & 0xff))
        .toShort.toLong
      ss += v * v; k += 1
    }
    // pass 2: per-frame energies vs the cross-multiplied threshold
    var active = 0L; var run = 0L; var best = 0L
    var f = 0
    while (f < frames) {
      var e = 0L; var j = f * 160; val end = j + 160
      while (j < end) {
        val v = (((b(off + 2 * j + 1)) << 8) | (b(off + 2 * j) & 0xff))
          .toShort.toLong
        e += v * v; j += 1
      }
      // reduced form of 2·m·e > 160·ss with m = frames·160: dividing by
      // 160 gives 2·frames·e > ss, and for integers that is EXACTLY
      // e > ss DIV (2·frames) (e ≥ q+1 in every remainder case) — the
      // direct product 2·m·e overflows Long past ~27k full-scale
      // samples, the floor-divided compare never does
      if (e > ss / (2L * frames)) { active += 1; run += 1
        if (run > best) best = run }
      else run = 0
      f += 1
    }
    Array(frames.toLong, active, best)
  }

  /** Frame count WITHOUT the energy fold — pure chunk-walk arithmetic
    * ((data bytes / 2) / 160 under [[pcmStats]]'s exact guards), so a
    * query can gate on "has full frames" for the cost of a header walk
    * instead of a whole-payload pass. Same null/zero contract as the
    * fold: null when no 16-bit PCM chunk parses, 0 when the payload is
    * shorter than one frame.
    */
  def vadFrames(b: Array[Byte]): java.lang.Long = {
    val r = pcmDataRange(b)
    if (r == null) return null
    java.lang.Long.valueOf((r(1) / 2 / 160).toLong)
  }

  def vadActive(b: Array[Byte]): java.lang.Long =
    { val p = vadStats(b); if (p == null) null else java.lang.Long.valueOf(p(1)) }

  def vadRun(b: Array[Byte]): java.lang.Long =
    { val p = vadStats(b); if (p == null) null else java.lang.Long.valueOf(p(2)) }

  /** Sample count WITHOUT the fold — data-chunk size / 2 under
    * [[pcmStats]]'s exact guards (see [[vadFrames]]).
    */
  def pcmSamples(b: Array[Byte]): java.lang.Long = {
    val r = pcmDataRange(b)
    if (r == null) return null
    java.lang.Long.valueOf((r(1) / 2).toLong)
  }

  /** All three PCM fold readouts from ONE pass — (n_samples, sum_sq,
    * peak) as a Catalyst struct row, null when no 16-bit PCM chunk
    * parses. The per-stat accessors each re-fold the whole payload;
    * [[WavPcmStats]] evaluates this instead so a query reading several
    * readouts pays the byte fold once (the `png_decode_stats`
    * discipline).
    */
  def pcmStatsRow(b: Array[Byte])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val p = pcmStats(b)
    if (p == null) null
    else org.apache.spark.sql.catalyst.InternalRow(p(0), p(1), p(2).toInt)
  }

  /** All three VAD readouts from ONE two-pass fold — (n_frames,
    * n_active, longest_run) as a struct row (see [[pcmStatsRow]]).
    */
  def vadStatsRow(b: Array[Byte])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val p = vadStats(b)
    if (p == null) null
    else org.apache.spark.sql.catalyst.InternalRow(p(0), p(1), p(2))
  }

  def pcmSumSq(b: Array[Byte]): java.lang.Long =
    { val p = pcmStats(b); if (p == null) null else java.lang.Long.valueOf(p(1)) }

  def pcmPeak(b: Array[Byte]): Integer =
    { val p = pcmStats(b); if (p == null) null else Int.box(p(2).toInt) }

  def channels(b: Array[Byte]): Integer =
    { val p = parse(b); if (p == null) null else Int.box(p(0).toInt) }

  def sampleRate(b: Array[Byte]): Integer =
    { val p = parse(b); if (p == null) null else Int.box(p(1).toInt) }

  /** Milliseconds of audio: `data_size / block_align` samples over the
    * sample rate, integer arithmetic throughout (oracle-reproducible).
    */
  def durationMs(b: Array[Byte]): java.lang.Long = {
    val p = parse(b)
    if (p == null) null
    else java.lang.Long.valueOf(p(4) / p(3) * 1000L / p(1))
  }
}

/** WAV attribute as a codegen expression:
  * `attr` ∈ channels|sample_rate|duration_ms|pcm_samples|pcm_sum_sq|pcm_peak.
  */
case class WavHeaderAttr(child: Expression, attr: String) extends UnaryExpression {
  require(Set("channels", "sample_rate", "duration_ms",
    "pcm_samples", "pcm_sum_sq", "pcm_peak",
    "vad_frames", "vad_active", "vad_run")(attr),
    s"unknown wav attr $attr")

  private val longAttrs = Set("duration_ms", "pcm_samples", "pcm_sum_sq",
    "vad_frames", "vad_active", "vad_run")
  private val method = attr match {
    case "channels"    => "channels"
    case "sample_rate" => "sampleRate"
    case "duration_ms" => "durationMs"
    case "pcm_samples" => "pcmSamples"
    case "pcm_sum_sq"  => "pcmSumSq"
    case "pcm_peak"    => "pcmPeak"
    case "vad_frames"  => "vadFrames"
    case "vad_active"  => "vadActive"
    case "vad_run"     => "vadRun"
  }

  override def dataType: DataType =
    if (longAttrs(attr)) LongType else IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = s"wav_$attr"

  override def nullSafeEval(input: Any): Any = attr match {
    case "channels"    => WavHeader.channels(input.asInstanceOf[Array[Byte]])
    case "sample_rate" => WavHeader.sampleRate(input.asInstanceOf[Array[Byte]])
    case "duration_ms" => WavHeader.durationMs(input.asInstanceOf[Array[Byte]])
    case "pcm_samples" => WavHeader.pcmSamples(input.asInstanceOf[Array[Byte]])
    case "pcm_sum_sq"  => WavHeader.pcmSumSq(input.asInstanceOf[Array[Byte]])
    case "pcm_peak"    => WavHeader.pcmPeak(input.asInstanceOf[Array[Byte]])
    case "vad_frames"  => WavHeader.vadFrames(input.asInstanceOf[Array[Byte]])
    case "vad_active"  => WavHeader.vadActive(input.asInstanceOf[Array[Byte]])
    case "vad_run"     => WavHeader.vadRun(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (longAttrs(attr))
      nullSafeCodeGen(ctx, ev, c =>
        s"""java.lang.Long d = graft.functions.WavHeader.$method($c);
           if (d == null) { ${ev.isNull} = true; }
           else { ${ev.value} = d.longValue(); }""")
    else
      nullSafeCodeGen(ctx, ev, c =>
        s"""java.lang.Integer v = graft.functions.WavHeader.$method($c);
           if (v == null) { ${ev.isNull} = true; }
           else { ${ev.value} = v.intValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): WavHeaderAttr =
    copy(child = newChild)
}

/** The PCM fold as ONE struct-returning expression:
  * `wav_pcm_stats(binary)` → `STRUCT<n_samples BIGINT, sum_sq BIGINT,
  * peak INT>`, null when no 16-bit PCM data chunk parses. Deliberately
  * not cheap in CollapseProject's sense (the [[PngDecodeStats]]
  * discipline): aliased once, field-extracted many times, folded once.
  */
case class WavPcmStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "wav_pcm_stats"

  override def nullSafeEval(input: Any): Any =
    WavHeader.pcmStatsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pcmStats")
      s"""org.apache.spark.sql.catalyst.InternalRow $r =
           graft.functions.WavHeader.pcmStatsRow($c);
         if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }"""
    })

  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)
}

/** The VAD two-pass fold as ONE struct-returning expression:
  * `wav_vad_stats(binary)` → `STRUCT<n_frames BIGINT, n_active BIGINT,
  * longest_run BIGINT>`, null when no 16-bit PCM data chunk parses
  * (see [[WavPcmStats]]).
  */
case class WavVadStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("n_active", LongType, nullable = false),
    StructField("longest_run", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "wav_vad_stats"

  override def nullSafeEval(input: Any): Any =
    WavHeader.vadStatsRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("vadStats")
      s"""org.apache.spark.sql.catalyst.InternalRow $r =
           graft.functions.WavHeader.vadStatsRow($c);
         if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }"""
    })

  override protected def withNewChildInternal(newChild: Expression): WavVadStats =
    copy(child = newChild)
}

/** MP4 / ISO BMFF container parsing — the video leg of the multimodal
  * family. Spec (ISO/IEC 14496-12): the file is a sequence of BOXES —
  * `u32be size` (including the 8-byte header) + 4-char type, with
  * `size == 1` meaning a 64-bit size follows and `size == 0` meaning
  * "to end of file". `ftyp` carries the brand; `moov` is a pure
  * container whose CHILD WALK yields `mvhd` (movie header), a FullBox
  * whose version selects 32- vs 64-bit timestamps: timescale and
  * duration sit after version/flags + 2 timestamps. Duration in ms =
  * `duration * 1000 / timescale`, integer arithmetic.
  *
  * Both walks are real — a `free`/`skip` box before `moov`, or a `trak`
  * before `mvhd`, are legal and skipped; fixed offsets are as wrong here
  * as for JPEG segments and RIFF chunks. All big-endian. Truncated or
  * non-BMFF bytes parse to null.
  */
object Mp4Header {

  import BinReader.{tag4, u32be, u64be}

  /** Walks boxes in [from, to) for `boxType`; returns payload offset and
    * box end, or null. Handles largesize (size==1) and to-eof (size==0).
    */
  private def findBox(
      b: Array[Byte], from: Int, to: Int, boxType: String): Array[Int] = {
    var i = from
    while (i + 8 <= to) {
      val size0 = u32be(b, i)
      var hdr = 8
      var size = size0
      if (size0 == 1) {
        if (i + 16 > to) return null
        size = u64be(b, i + 8); hdr = 16
      } else if (size0 == 0) {
        size = (to - i).toLong
      }
      if (size < hdr || size > to - i) return null // corrupt size
      if (tag4(b, i + 4) == boxType) return Array(i + hdr, i + size.toInt)
      i += size.toInt
    }
    null
  }

  private def isBmff(b: Array[Byte]): Boolean =
    b.length >= 12 && tag4(b, 4) == "ftyp"

  /** Major brand from the ftyp box, e.g. "isom", "mp42". */
  def brand(b: Array[Byte]): UTF8String = {
    if (b == null || !isBmff(b)) return null
    val f = findBox(b, 0, b.length, "ftyp")
    // bound the brand read by the ftyp box's own END, not the buffer:
    // a truncated ftyp (declared size 8, no payload) must parse to
    // null, not return the NEXT box's size field as a garbage "brand"
    if (f == null || f(0) + 4 > f(1)) null
    else UTF8String.fromString(tag4(b, f(0)))
  }

  /** (timescale, durationMs) from moov/mvhd, or null. */
  private def mvhd(b: Array[Byte]): Array[Long] = {
    if (b == null || !isBmff(b)) return null
    val moov = findBox(b, 0, b.length, "moov")
    if (moov == null) return null
    val m = findBox(b, moov(0), moov(1), "mvhd")
    if (m == null) return null
    val p = m(0)
    if (p + 4 > b.length) return null
    val version = b(p) & 0xff
    if (version == 0) {
      if (p + 20 > b.length) return null
      val ts = u32be(b, p + 12); val dur = u32be(b, p + 16)
      if (ts <= 0) null else Array(ts, dur * 1000L / ts)
    } else if (version == 1) {
      if (p + 32 > b.length) return null
      val ts = u32be(b, p + 20); val dur = u64be(b, p + 24)
      if (ts <= 0) null else Array(ts, dur * 1000L / ts)
    } else null
  }

  def timescale(b: Array[Byte]): Integer =
    { val m = mvhd(b); if (m == null) null else Int.box(m(0).toInt) }

  def durationMs(b: Array[Byte]): java.lang.Long =
    { val m = mvhd(b); if (m == null) null else java.lang.Long.valueOf(m(1)) }

  /** Byte offset of the `mdat` box PAYLOAD (where the media data starts),
    * found by the box walk — the seek position a frame extractor hands to
    * the demuxer. Null if the file has no mdat.
    */
  def mdatOffset(b: Array[Byte]): java.lang.Long = {
    if (b == null || !isBmff(b)) return null
    val m = findBox(b, 0, b.length, "mdat")
    if (m == null) null else java.lang.Long.valueOf(m(0).toLong)
  }

  /** Size in bytes of the `mdat` payload, via the same walk. */
  def mdatSize(b: Array[Byte]): java.lang.Long = {
    if (b == null || !isBmff(b)) return null
    val m = findBox(b, 0, b.length, "mdat")
    if (m == null) null else java.lang.Long.valueOf((m(1) - m(0)).toLong)
  }

  /** ISO BMFF container boxes whose payload is again a box sequence —
    * the recursive sample-table walk descends ONLY through these.
    */
  private val containerBoxes =
    Set("moov", "trak", "mdia", "minf", "stbl", "edts", "udta")

  /** Finds `boxType` anywhere under [from, to), descending into standard
    * container boxes — stsz lives at moov/trak/mdia/minf/stbl in a full
    * writer's output and directly under moov in minimal ones; a walk
    * (not a fixed path) reads both.
    */
  private def findBoxRec(
      b: Array[Byte], from: Int, to: Int, boxType: String): Array[Int] = {
    var i = from
    while (i + 8 <= to) {
      val size0 = u32be(b, i)
      var hdr = 8
      var size = size0
      if (size0 == 1) {
        if (i + 16 > to) return null
        size = u64be(b, i + 8); hdr = 16
      } else if (size0 == 0) size = (to - i).toLong
      if (size < hdr || size > to - i) return null
      val t = tag4(b, i + 4)
      if (t == boxType) return Array(i + hdr, i + size.toInt)
      if (containerBoxes(t)) {
        val r = findBoxRec(b, i + hdr, i + size.toInt, boxType)
        if (r != null) return r
      }
      i += size.toInt
    }
    null
  }

  /** Per-sample byte sizes from the `stsz` box (version/flags u32,
    * fixed sample_size u32 — 0 means the per-sample table follows —
    * then sample_count u32): THE seek plan of a frame extractor, since
    * sample k starts at mdatOffset + Σ sizes[0..k). Null if absent or
    * malformed; count capped at 2²⁰ as a corruption guard.
    */
  def stszSizes(b: Array[Byte])
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (b == null || !isBmff(b)) return null
    val moov = findBox(b, 0, b.length, "moov")
    if (moov == null) return null
    val s = findBoxRec(b, moov(0), moov(1), "stsz")
    if (s == null || s(0) + 12 > s(1)) return null
    val p = s(0)
    val fixed = u32be(b, p + 4)
    val n = u32be(b, p + 8)
    if (n < 0 || n > (1L << 20)) return null
    val out = new Array[Long](n.toInt)
    if (fixed != 0L) java.util.Arrays.fill(out, fixed)
    else {
      if (p + 12 + 4L * n > s(1)) return null
      var i = 0
      while (i < n) { out(i) = u32be(b, p + 12 + 4 * i); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** stsz sample-size table as a codegen expression: array<long> of the
  * per-sample byte sizes, null when the container carries no sample
  * table (see [[Mp4Header.stszSizes]]).
  */
case class Mp4StszSizes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_stsz_sizes"

  override def nullSafeEval(input: Any): Any =
    Mp4Header.stszSizes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData a =
           graft.functions.Mp4Header.stszSizes($c);
         if (a == null) { ${ev.isNull} = true; } else { ${ev.value} = a; }""")

  override protected def withNewChildInternal(newChild: Expression): Mp4StszSizes =
    copy(child = newChild)
}

/** MP4 attribute as a codegen expression:
  * `attr` ∈ brand|timescale|duration_ms|mdat_offset|mdat_size.
  */
case class Mp4HeaderAttr(child: Expression, attr: String) extends UnaryExpression {
  require(
    Set("brand", "timescale", "duration_ms", "mdat_offset", "mdat_size")(attr),
    s"unknown mp4 attr $attr")

  override def dataType: DataType = attr match {
    case "brand"     => StringType
    case "timescale" => IntegerType
    case _           => LongType
  }
  override def nullable: Boolean = true
  override def prettyName: String = s"mp4_$attr"

  override def nullSafeEval(input: Any): Any = attr match {
    case "brand"       => Mp4Header.brand(input.asInstanceOf[Array[Byte]])
    case "timescale"   => Mp4Header.timescale(input.asInstanceOf[Array[Byte]])
    case "duration_ms" => Mp4Header.durationMs(input.asInstanceOf[Array[Byte]])
    case "mdat_offset" => Mp4Header.mdatOffset(input.asInstanceOf[Array[Byte]])
    case "mdat_size"   => Mp4Header.mdatSize(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    attr match {
      case "brand" =>
        nullSafeCodeGen(ctx, ev, c =>
          s"""org.apache.spark.unsafe.types.UTF8String s =
               graft.functions.Mp4Header.brand($c);
             if (s == null) { ${ev.isNull} = true; } else { ${ev.value} = s; }""")
      case "timescale" =>
        nullSafeCodeGen(ctx, ev, c =>
          s"""java.lang.Integer v = graft.functions.Mp4Header.timescale($c);
             if (v == null) { ${ev.isNull} = true; }
             else { ${ev.value} = v.intValue(); }""")
      case longAttr =>
        val m = longAttr match {
          case "duration_ms" => "durationMs"
          case "mdat_offset" => "mdatOffset"
          case "mdat_size"   => "mdatSize"
        }
        nullSafeCodeGen(ctx, ev, c =>
          s"""java.lang.Long d = graft.functions.Mp4Header.$m($c);
             if (d == null) { ${ev.isNull} = true; }
             else { ${ev.value} = d.longValue(); }""")
    }

  override protected def withNewChildInternal(newChild: Expression): Mp4HeaderAttr =
    copy(child = newChild)
}

object Mp4HeaderOps {
  def mp4Brand(c: Column): Column =
    ColumnBridge.column(Mp4HeaderAttr(ColumnBridge.expression(c), "brand"))
  def mp4Timescale(c: Column): Column =
    ColumnBridge.column(Mp4HeaderAttr(ColumnBridge.expression(c), "timescale"))
  def mp4DurationMs(c: Column): Column =
    ColumnBridge.column(Mp4HeaderAttr(ColumnBridge.expression(c), "duration_ms"))
  def mp4MdatOffset(c: Column): Column =
    ColumnBridge.column(Mp4HeaderAttr(ColumnBridge.expression(c), "mdat_offset"))
  def mp4MdatSize(c: Column): Column =
    ColumnBridge.column(Mp4HeaderAttr(ColumnBridge.expression(c), "mdat_size"))
  def mp4StszSizes(c: Column): Column =
    ColumnBridge.column(Mp4StszSizes(ColumnBridge.expression(c)))
}

object WavHeaderOps {
  def wavPcmStats(c: Column): Column =
    ColumnBridge.column(WavPcmStats(ColumnBridge.expression(c)))
  def wavVadStats(c: Column): Column =
    ColumnBridge.column(WavVadStats(ColumnBridge.expression(c)))
  def wavChannels(c: Column): Column =
    ColumnBridge.column(WavHeaderAttr(ColumnBridge.expression(c), "channels"))
  def wavSampleRate(c: Column): Column =
    ColumnBridge.column(WavHeaderAttr(ColumnBridge.expression(c), "sample_rate"))
  def wavDurationMs(c: Column): Column =
    ColumnBridge.column(WavHeaderAttr(ColumnBridge.expression(c), "duration_ms"))
  def wavPcmSamples(c: Column): Column =
    ColumnBridge.column(WavHeaderAttr(ColumnBridge.expression(c), "pcm_samples"))
  def wavPcmSumSq(c: Column): Column =
    ColumnBridge.column(WavHeaderAttr(ColumnBridge.expression(c), "pcm_sum_sq"))
  def wavPcmPeak(c: Column): Column =
    ColumnBridge.column(WavHeaderAttr(ColumnBridge.expression(c), "pcm_peak"))
  def wavVadFrames(c: Column): Column =
    ColumnBridge.column(WavHeaderAttr(ColumnBridge.expression(c), "vad_frames"))
  def wavVadActive(c: Column): Column =
    ColumnBridge.column(WavHeaderAttr(ColumnBridge.expression(c), "vad_active"))
  def wavVadRun(c: Column): Column =
    ColumnBridge.column(WavHeaderAttr(ColumnBridge.expression(c), "vad_run"))
}
