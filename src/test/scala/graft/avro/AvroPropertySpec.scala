package graft.avro

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import AvroSparkType._

/** Property-based coverage promised in SURVEY.md §5: the schema converter
  * is total over arbitrary (even nonsensical) Avro-JSON type nodes, and
  * the value coercions are total over arbitrary scalar inputs
  * (null-on-failure semantics, with the two documented hard-failure
  * channels being the ONLY throwing paths).
  */
class AvroPropertySpec extends AnyFunSuite {

  /** Deterministic sampler (no scalatestplus bridge in the offline cache):
    * 300 samples per property, fixed seeds.
    */
  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { a =>
        try f(a)
        catch {
          case e: org.scalatest.exceptions.TestFailedException =>
            throw new AssertionError(s"property failed for sample: $a", e)
        }
      }
    }

  // ---- generator for arbitrary Avro-JSON type nodes ----
  private val primitiveNames = Gen.oneOf(
    "string", "boolean", "int", "long", "float", "double", "bytes", "null",
    "decimal", "frobnicate", "record", "array")

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => ""
      case c => c.toString
    } + "\""

  private def typeNode(depth: Int): Gen[String] =
    if (depth <= 0) primitiveNames.map(jsonString)
    else Gen.frequency(
      4 -> primitiveNames.map(jsonString),
      2 -> (for {
        n <- Gen.choose(0, 3)
        branches <- Gen.listOfN(n, typeNode(depth - 1))
        leadNull <- Gen.oneOf(true, false)
      } yield (if (leadNull) "\"null\"" :: branches else branches)
        .mkString("[", ",", "]")),
      1 -> (for {
        base <- Gen.oneOf("int", "long", "bytes", "string", "weird")
        logical <- Gen.oneOf("timestamp-millis", "timestamp-micros", "date",
          "decimal", "uuid", "nonsense")
      } yield s"""{"type":"$base","logicalType":"$logical"}"""),
      1 -> typeNode(depth - 1).map(item => s"""{"type":"array","items":$item}"""),
      1 -> typeNode(depth - 1).map(v => s"""{"type":"map","values":$v}"""),
      1 -> (for {
        n <- Gen.choose(0, 3)
        fields <- Gen.listOfN(n, typeNode(depth - 1))
      } yield {
        val fs = fields.zipWithIndex
          .map { case (t, i) => s"""{"name":"f$i","type":$t}""" }
        s"""{"type":"record","name":"r","fields":[${fs.mkString(",")}]}"""
      }),
      1 -> Gen.const("42"),
      1 -> Gen.const("{}"),
    )

  test("typeFromNode is total over arbitrary type nodes and honors " +
    "nullability invariants") {
    forAll(typeNode(3)) { node =>
      val (tpe, nullable) = AvroSchemaConverter.typeFromNode(
        AvroSchemaConverter.parse(node))
      // invariant: arrays and maps are always nullable; a union result is
      // always nullable (every node that parses as a JSON array)
      tpe match {
        case _: TArray | _: TMap => assert(nullable)
        case _ => ()
      }
      if (node.trim.startsWith("[")) assert(nullable)
      // the Spark type materializes without throwing
      tpe.toSpark
    }
  }

  test("deriveFlatSchema is total over arbitrary envelopes") {
    forAll(typeNode(2)) { payloadType =>
      val envelope =
        s"""{"type":"record","name":"e","fields":[
          {"name":"payload","type":$payloadType},
          {"name":"uuid","type":"string"}]}"""
      val flat = AvroSchemaConverter.deriveFlatSchema(envelope)
      assert(flat.toSpark.fieldNames.head == "source_metadata")
    }
  }

  // ---- value coercion totality ----
  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.alphaNumStr.map(new org.apache.avro.util.Utf8(_)),
    Gen.choose(Long.MinValue, Long.MaxValue).map(java.lang.Long.valueOf),
    Gen.choose(Int.MinValue, Int.MaxValue).map(java.lang.Integer.valueOf),
    Gen.double.map(java.lang.Double.valueOf),
    Gen.oneOf(java.lang.Boolean.TRUE, java.lang.Boolean.FALSE),
    Gen.listOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray),
    Gen.const(null),
  )

  test("lenient targets never throw on arbitrary scalars") {
    val lenientTargets =
      Seq(TString, TBoolean, TInt, TLong, TFloat, TDouble)
    forAll(scalarGen) { v =>
      lenientTargets.foreach { t =>
        AvroValueConverter.convert(v, t, ConvertMode.Standard)
      }
    }
  }

  test("decimal bytes branch never throws; numeric branch throws only on " +
    "(38,9) overflow") {
    forAll(Gen.listOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)) { bytes =>
      Coercions.decimalFromBytes(bytes) // total
    }
    forAll(Gen.double) { d =>
      if (!d.isNaN && !d.isInfinite) {
        val fits = math.abs(d) < 1e29
        try {
          AvroValueConverter.convert(
            java.lang.Double.valueOf(d), TDecimal, ConvertMode.Standard)
          assert(fits || math.abs(d) < 1e30) // boundary slack
        } catch {
          case _: HardConversionError => assert(!fits)
        }
      }
    }
  }

  test("timestamp/date targets throw FallbackConversionError only for " +
    "non-numeric inputs") {
    forAll(scalarGen) { v =>
      for (t <- Seq(TTimestamp("millis"), TTimestamp("micros"), TDate)) {
        // timestamps accept any numeric; dates only int-like (the reference
        // passes other types through and Arrow rejects them → fallback)
        val accepted = t match {
          case TDate => v.isInstanceOf[java.lang.Long] || v.isInstanceOf[java.lang.Integer]
          case _ => v.isInstanceOf[java.lang.Long] ||
            v.isInstanceOf[java.lang.Integer] || v.isInstanceOf[java.lang.Double]
        }
        try {
          val r = AvroValueConverter.convert(v, t, ConvertMode.Standard)
          assert(v == null || accepted || r == null)
        } catch {
          case _: FallbackConversionError => assert(!accepted && v != null)
          case _: ArithmeticException => assert(accepted) // millis overflow
        }
      }
    }
  }
}
