package graft.avro

import org.apache.spark.sql.types._

/** Internal type descriptor tree for the CDC Avro → Spark mapping.
  *
  * Spark's [[DataType]] alone cannot carry the information the value
  * converter needs (e.g. whether a `TimestampType` column is encoded in
  * milliseconds or microseconds in the source Avro), so the schema
  * converter produces this richer tree and derives the Spark schema from
  * it. Mirrors the role of the Arrow schema in the reference pipeline
  * (reference: main.py:299-396).
  */
sealed trait AvroSparkType {
  def toSpark: DataType
}

object AvroSparkType {
  case object TString extends AvroSparkType { def toSpark = StringType }
  case object TBoolean extends AvroSparkType { def toSpark = BooleanType }
  case object TInt extends AvroSparkType { def toSpark = IntegerType }
  case object TLong extends AvroSparkType { def toSpark = LongType }
  case object TFloat extends AvroSparkType { def toSpark = FloatType }
  case object TDouble extends AvroSparkType { def toSpark = DoubleType }
  case object TBinary extends AvroSparkType { def toSpark = BinaryType }
  case object TDate extends AvroSparkType { def toSpark = DateType }

  /** `unit` is "millis" or "micros" (reference: main.py:281-284). */
  final case class TTimestamp(unit: String) extends AvroSparkType {
    def toSpark = TimestampType
  }

  /** Forced Decimal(38,9) regardless of declared precision/scale
    * (reference: main.py:290-293, "BigQuery NUMERIC" compat).
    */
  case object TDecimal extends AvroSparkType {
    def toSpark = DecimalType(38, 9)
  }

  final case class TArray(element: AvroSparkType) extends AvroSparkType {
    def toSpark = ArrayType(element.toSpark, containsNull = true)
  }

  final case class TMap(value: AvroSparkType) extends AvroSparkType {
    def toSpark = MapType(StringType, value.toSpark, valueContainsNull = true)
  }

  final case class TField(name: String, tpe: AvroSparkType, nullable: Boolean)

  final case class TStruct(fields: Seq[TField]) extends AvroSparkType {
    def toSpark = StructType(fields.map(f => StructField(f.name, f.tpe.toSpark, f.nullable)))
  }
}

/** How faithfully to reproduce the reference's conversion quirks.
  *
  *  - [[ConvertMode.ReferenceExact]]: complex-typed (array/map/record) and
  *    binary payload values are stringified against their typed schema,
  *    which — exactly as in the reference (main.py:147-240 default branch
  *    feeding pa.Table.from_pylist at main.py:525) — makes the typed build
  *    fail and routes the whole file through the all-string fallback
  *    (main.py:543-564).
  *  - [[ConvertMode.Standard]]: complex and binary values convert natively
  *    to typed Spark values; the fallback only triggers on genuinely
  *    unconvertible files. Single-pass. This is the mode a Spark user
  *    wants; the quirk reproduction exists so behavior parity with the
  *    reference is demonstrable.
  */
sealed trait ConvertMode
object ConvertMode {
  case object Standard extends ConvertMode
  case object ReferenceExact extends ConvertMode
}
