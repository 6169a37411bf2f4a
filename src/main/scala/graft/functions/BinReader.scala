package graft.functions

/** THE shared primitive readers behind every binary container parser in
  * this package — the PNG chunk walk ([[PngCodec]]), the JPEG segment /
  * GIF descriptor parse ([[ImageHeader]]), the RIFF/WAV chunk walk
  * ([[WavHeader]]) and the ISO-BMFF box walk ([[Mp4Header]]). The
  * round-15 hostile-input review found six real defects, several of them
  * the SAME bug re-made in hand-copied reader helpers (an Int-overflowing
  * chunk advance lived in three copies of the RIFF walk before they were
  * unified); one implementation means the next fix lands everywhere at
  * once.
  *
  * Every read validates its own range: a negative offset or a read past
  * the buffer throws `IndexOutOfBoundsException` instead of silently
  * returning another field's bytes. Callers still guard with their
  * format-level bounds first — that is what lets a well-formed-but-
  * truncated container degrade to the documented null — so this check is
  * the BACKSTOP for the guard the next parser forgets, not the primary
  * defense. The comparison `n > b.length - i` is overflow-safe: an offset
  * near Int.MaxValue cannot wrap it.
  */
object BinReader {

  @inline private def check(b: Array[Byte], i: Int, n: Int): Unit =
    if (i < 0 || n > b.length - i)
      throw new IndexOutOfBoundsException(
        s"read of $n bytes at $i overruns ${b.length}-byte buffer")

  /** Big-endian unsigned 16-bit. */
  def u16be(b: Array[Byte], i: Int): Int = {
    check(b, i, 2)
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  }

  /** Little-endian unsigned 16-bit. */
  def u16le(b: Array[Byte], i: Int): Int = {
    check(b, i, 2)
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  }

  /** Big-endian unsigned 32-bit, widened to Long (a size field near
    * 2³¹ must stay positive through every later bounds compare).
    */
  def u32be(b: Array[Byte], i: Int): Long = {
    check(b, i, 4)
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  }

  /** Little-endian unsigned 32-bit, widened to Long. */
  def u32le(b: Array[Byte], i: Int): Long = {
    check(b, i, 4)
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  }

  /** Big-endian 64-bit (ISO-BMFF largesize). */
  def u64be(b: Array[Byte], i: Int): Long = {
    check(b, i, 8)
    (u32be(b, i) << 32) | u32be(b, i + 4)
  }

  /** Four ASCII bytes as a tag string (chunk id / box type / brand). */
  def tag4(b: Array[Byte], i: Int): String = {
    check(b, i, 4)
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
  }
}
