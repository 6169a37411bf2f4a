package graft.avro

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.avro.generic.{GenericEnumSymbol, GenericFixed, GenericRecord}
import org.apache.avro.util.Utf8

/** Canonical stringification of arbitrary Avro datum values, mirroring the
  * reference's `_stringify_any` (main.py:16-24): lists/records/maps become
  * compact JSON with keys sorted; scalars become their string form.
  *
  * Divergences from the reference, both deliberate and documented:
  *  - Python renders a stringified bool as "True"/"False" and a bytes value
  *    via its repr (`b'..'`); we emit "true"/"false" and UTF-8 decode bytes.
  *  - Float formatting follows Java's shortest-repr rules, not Python's.
  */
object CanonicalJson {

  /** Scalar string form (no JSON quoting) for non-complex values. */
  def stringify(v: Any): String = v match {
    case null                  => null
    case s: Utf8               => s.toString
    case s: String             => s
    case b: ByteBuffer         => utf8(b)
    case b: Array[Byte]        => new String(b, StandardCharsets.UTF_8)
    case f: GenericFixed       => new String(f.bytes(), StandardCharsets.UTF_8)
    case e: GenericEnumSymbol[_] => e.toString
    case r: GenericRecord      => json(r)
    case m: java.util.Map[_, _] => json(m)
    case l: java.util.Collection[_] => json(l)
    case l: Seq[_]             => json(l)
    case other                 => other.toString
  }

  /** Compact, sorted-keys JSON of a complex datum. */
  def json(v: Any): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.toString
  }

  private def write(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case b: java.lang.Boolean => sb.append(if (b) "true" else "false")
    case n: java.lang.Integer => sb.append(n.toString)
    case n: java.lang.Long    => sb.append(n.toString)
    case n: java.lang.Float   => writeNum(n.doubleValue(), sb)
    case n: java.lang.Double  => writeNum(n.doubleValue(), sb)
    case n: java.math.BigDecimal => sb.append(n.toPlainString)
    case s: Utf8   => writeString(s.toString, sb)
    case s: String => writeString(s, sb)
    case b: ByteBuffer   => writeString(utf8(b), sb)
    case b: Array[Byte]  => writeString(new String(b, StandardCharsets.UTF_8), sb)
    case f: GenericFixed => writeString(new String(f.bytes(), StandardCharsets.UTF_8), sb)
    case e: GenericEnumSymbol[_] => writeString(e.toString, sb)
    case r: GenericRecord =>
      val kvs = r.getSchema.getFields.asScala.map(f => f.name() -> r.get(f.name()))
      writeObject(kvs.toSeq, sb)
    case m: java.util.Map[_, _] =>
      val kvs = m.asScala.toSeq.map { case (k, value) => stringify(k) -> value }
      writeObject(kvs, sb)
    case c: java.util.Collection[_] =>
      writeArray(c.asScala.toSeq, sb)
    case s: Seq[_] => writeArray(s, sb)
    case other => writeString(other.toString, sb)
  }

  private def writeNum(d: Double, sb: StringBuilder): Unit =
    if (d.isNaN) sb.append("NaN")
    else if (d.isPosInfinity) sb.append("Infinity")
    else if (d.isNegInfinity) sb.append("-Infinity")
    else if (d == math.rint(d) && math.abs(d) < 1e15) sb.append(d.toLong.toString).append(".0")
    else sb.append(d.toString)

  private def writeObject(kvs: Seq[(String, Any)], sb: StringBuilder): Unit = {
    sb.append('{')
    var first = true
    // sorted keys, compact separators — reference json.dumps(sort_keys=True,
    // separators=(",", ":")) at main.py:21
    kvs.sortBy(_._1).foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      writeString(k, sb)
      sb.append(':')
      write(v, sb)
    }
    sb.append('}')
  }

  private def writeArray(xs: Seq[Any], sb: StringBuilder): Unit = {
    sb.append('[')
    var first = true
    xs.foreach { x =>
      if (!first) sb.append(',')
      first = false
      write(x, sb)
    }
    sb.append(']')
  }

  /** JSON string escaping with ensure_ascii=False semantics: only the
    * mandatory escapes (quote, backslash, control chars).
    */
  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private def utf8(b: ByteBuffer): String = {
    val dup = b.duplicate()
    val arr = new Array[Byte](dup.remaining())
    dup.get(arr)
    new String(arr, StandardCharsets.UTF_8)
  }
}
