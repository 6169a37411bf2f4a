package graft.avro

import org.scalatest.funsuite.AnyFunSuite

/** Randomized contract fuzz for the F1 kernel ([[CanonicalJson]] — the
  * reference's `json.dumps(sort_keys=True, separators=(",",":"))`,
  * main.py:21): over deep random structures of maps / lists / scalars
  * with hostile strings (quotes, backslashes, control chars, surrogate
  * text), the canonicalizer must (1) never throw, (2) emit output that a
  * real JSON parser accepts (Jackson, with the non-numeric-number tokens
  * json.dumps emits for NaN/±Infinity enabled), and (3) be INVARIANT to
  * map insertion order — the whole point of canonicalization: two maps
  * with the same entries in different orders must serialize to the same
  * bytes. Seeded, so failures reproduce from the printed seed.
  */
class CanonicalJsonFuzzSpec extends AnyFunSuite {

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.enable(com.fasterxml.jackson.core.JsonParser.Feature
      .ALLOW_NON_NUMERIC_NUMBERS)
    m
  }

  private def genString(r: scala.util.Random): String = {
    val n = r.nextInt(8)
    val chars = Seq('a', 'b', '"', '\\', '\n', '\t', '\u0000', '\u001f',
      'é', '世', '€', ' ', ':', ',', '{', '[')
    (0 until n).map(_ => chars(r.nextInt(chars.length))).mkString
  }

  private def genScalar(r: scala.util.Random): Any = r.nextInt(10) match {
    case 0 => null
    case 1 => java.lang.Boolean.valueOf(r.nextBoolean())
    case 2 => java.lang.Integer.valueOf(r.nextInt())
    case 3 => java.lang.Long.valueOf(r.nextLong())
    case 4 => java.lang.Double.valueOf(r.nextInt(6) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case 3 => r.nextInt(100).toDouble // integral → ".0" form
      case _ => r.nextDouble() * math.pow(10, r.nextInt(20) - 10)
    })
    case 5 => java.lang.Float.valueOf(r.nextFloat())
    case 6 => new java.math.BigDecimal(r.nextInt(1000000))
      .movePointLeft(r.nextInt(6))
    case _ => genString(r)
  }

  /** Random nested structure; map iteration order is the Random's. */
  private def genValue(r: scala.util.Random, depth: Int): Any =
    if (depth <= 0) genScalar(r)
    else r.nextInt(4) match {
      case 0 =>
        val m = new java.util.LinkedHashMap[String, Any]()
        (0 until r.nextInt(5)).foreach(_ =>
          m.put(genString(r), genValue(r, depth - 1)))
        m
      case 1 =>
        val l = new java.util.ArrayList[Any]()
        (0 until r.nextInt(5)).foreach(_ => l.add(genValue(r, depth - 1)))
        l
      case _ => genScalar(r)
    }

  /** The same structure with every map's insertion order reversed. */
  private def reorder(v: Any): Any = v match {
    case m: java.util.LinkedHashMap[_, _] =>
      val out = new java.util.LinkedHashMap[Any, Any]()
      val entries = new java.util.ArrayList[java.util.Map.Entry[_, _]](
        m.entrySet())
      java.util.Collections.reverse(entries)
      entries.forEach(e => out.put(e.getKey, reorder(e.getValue)))
      out
    case l: java.util.List[_] =>
      val out = new java.util.ArrayList[Any]()
      l.forEach(x => out.add(reorder(x)))
      out
    case other => other
  }

  test("random deep structures: no throw, parseable output, and map " +
    "insertion order never changes the canonical bytes") {
    (0 until 1500).foreach { seed =>
      val r = new scala.util.Random(seed.toLong)
      val v = genValue(r, 4)
      val a =
        try CanonicalJson.json(v)
        catch { case e: Throwable =>
          fail(s"seed $seed: json() threw ${e.getClass.getSimpleName}: " +
            e.getMessage)
        }
      try mapper.readTree(a)
      catch { case e: Throwable =>
        fail(s"seed $seed: output is not parseable JSON ($a): " +
          e.getMessage)
      }
      assert(CanonicalJson.json(reorder(v)) == a,
        s"seed $seed: canonical form depends on map insertion order")
      // determinism: a second pass over the identical structure
      assert(CanonicalJson.json(v) == a, s"seed $seed: non-deterministic")
    }
  }

  test("stringify on random scalars never throws and agrees with json() " +
    "for complex values") {
    (0 until 500).foreach { seed =>
      val r = new scala.util.Random(900000L + seed)
      val s = genScalar(r)
      CanonicalJson.stringify(s) // must not throw (null → null is fine)
      val m = new java.util.LinkedHashMap[String, Any]()
      m.put("k", s)
      assert(CanonicalJson.stringify(m) == CanonicalJson.json(m),
        s"seed $seed: stringify of a map must be its canonical json")
    }
  }
}
