package graft.avro

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Direct pins for the structural pre-validation walk
  * ([[AvroCdcReader.validateRange]]) on HAND-CRAFTED container bytes —
  * the end-to-end mutation spec drives it through real avro-java files;
  * these cover the byte-level parser edges avro-java never produces
  * (negative-count metadata map blocks, garbage varints) so the walk is
  * pinned against the FORMAT, not against one writer's habits.
  */
class ValidateRangeSpec extends AnyFunSuite {
  private val conf = new Configuration(false)

  private def zigzag(n: Long): Array[Byte] = {
    var v = (n << 1) ^ (n >> 63)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += v.toByte
    out.toArray
  }

  private val sync: Array[Byte] = Array.tabulate(16)(i => (i * 7 + 3).toByte)

  /** magic | metadata map (built from `metaBlocks`) | sync | body. */
  private def container(metaBlocks: Array[Byte], body: Array[Byte]): Array[Byte] =
    Array[Byte]('O', 'b', 'j', 1) ++ metaBlocks ++ zigzag(0) ++ sync ++ body

  /** One data block: count, size, `size` data bytes, sync. */
  private def block(count: Long, data: Array[Byte]): Array[Byte] =
    zigzag(count) ++ zigzag(data.length.toLong) ++ data ++ sync

  private def write(bytes: Array[Byte]): AvroCdcReader.FileSplit = {
    val dir = Files.createTempDirectory("graft-walk").toString
    val p = s"$dir/x.avro"
    Files.write(Paths.get(p), bytes)
    AvroCdcReader.FileSplit(p, 0L, bytes.length.toLong, bytes.length.toLong)
  }

  private def plainMeta: Array[Byte] =
    // one positive-count map block: {"k": "v"}
    zigzag(1) ++ zigzag(1) ++ "k".getBytes ++ zigzag(1) ++ "v".getBytes

  test("well-formed container with a NEGATIVE-count metadata map block " +
    "(size-prefixed, legal Avro encoding no standard writer emits) passes") {
    val kv = zigzag(1) ++ "k".getBytes ++ zigzag(1) ++ "v".getBytes
    val meta = zigzag(-1) ++ zigzag(kv.length.toLong) ++ kv
    val s = write(container(meta, block(2, Array[Byte](9, 9, 9))))
    AvroCdcReader.validateRange(s, conf) // must not throw
  }

  test("truncation mid final block throws EOF naming the file") {
    val full = container(plainMeta,
      block(1, Array[Byte](1, 2, 3)) ++ block(1, Array.fill[Byte](40)(5)))
    val s0 = write(full.dropRight(13)) // cut inside the second block
    val e = intercept[java.io.EOFException](
      AvroCdcReader.validateRange(s0, conf))
    assert(e.getMessage.contains("truncated Avro container"), e.getMessage)
  }

  test("a block whose declared size overruns the file throws EOF before " +
    "any data is skipped") {
    val bad = container(plainMeta,
      zigzag(1) ++ zigzag(1000000L) ++ Array[Byte](1, 2, 3))
    val e = intercept[java.io.EOFException](
      AvroCdcReader.validateRange(write(bad), conf))
    assert(e.getMessage.contains("truncated Avro container"), e.getMessage)
  }

  test("corrupt trailing sync marker throws IOException, not a silent pass") {
    val good = container(plainMeta, block(1, Array[Byte](1, 2, 3)))
    val bytes = good.clone()
    bytes(bytes.length - 1) = (bytes.last ^ 0x5A).toByte
    val e = intercept[java.io.IOException](
      AvroCdcReader.validateRange(write(bytes), conf))
    assert(e.getMessage.contains("corrupt sync marker"), e.getMessage)
  }

  test("garbage varint at a block start (11× 0xFF) is a corrupt header, " +
    "not an infinite loop or a bogus skip") {
    val bad = container(plainMeta, Array.fill[Byte](24)(0xFF.toByte))
    val e = intercept[java.io.IOException](
      AvroCdcReader.validateRange(write(bad), conf))
    assert(e.getMessage.contains("corrupt Avro block header") ||
      e.getMessage.contains("truncated Avro container"), e.getMessage)
  }

  test("negative declared block size is corrupt, never a negative skip") {
    val bad = container(plainMeta, zigzag(1) ++ zigzag(-5L) ++ sync)
    val e = intercept[java.io.IOException](
      AvroCdcReader.validateRange(write(bad), conf))
    assert(e.getMessage.contains("corrupt Avro block header"), e.getMessage)
  }

  test("a split range past the last block validates clean (no owned blocks)") {
    val full = container(plainMeta, block(1, Array[Byte](1, 2, 3)))
    val len = full.length.toLong
    val s = write(full)
    // a range starting beyond every sync owns nothing
    AvroCdcReader.validateRange(
      AvroCdcReader.FileSplit(s.path, len - 4, len, len), conf)
  }
}
