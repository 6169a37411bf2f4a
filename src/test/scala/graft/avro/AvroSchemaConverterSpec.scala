package graft.avro

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import AvroSparkType._

class AvroSchemaConverterSpec extends AnyFunSuite {

  private def node(json: String) = AvroSchemaConverter.parse(json)
  private def conv(json: String): (AvroSparkType, Boolean) =
    AvroSchemaConverter.typeFromNode(node(json))

  // ---- §1.2 primitive table (non-union: non-nullable) ----
  test("bare primitives map per reference table, non-nullable") {
    assert(conv("\"string\"") == (TString, false))
    assert(conv("\"boolean\"") == (TBoolean, false))
    assert(conv("\"int\"") == (TInt, false))
    assert(conv("\"long\"") == (TLong, false))
    assert(conv("\"float\"") == (TFloat, false))
    assert(conv("\"double\"") == (TDouble, false))
    assert(conv("\"bytes\"") == (TBinary, false))
  }

  test("bare 'null' and unknown names are nullable string") {
    assert(conv("\"null\"") == (TString, true))
    assert(conv("\"frobnicate\"") == (TString, true))
  }

  test("non-standard bare 'decimal' name maps to double (main.py:345)") {
    assert(conv("\"decimal\"") == (TDouble, false))
  }

  // ---- union rules (main.py:309-334) ----
  test("union rule 1: first branch not null → nullable string, whatever follows") {
    assert(conv("""["string","null"]""") == (TString, true))
    assert(conv("""["long","null"]""") == (TString, true))
    assert(conv("""[{"type":"record","name":"r","fields":[]},"null"]""") == (TString, true))
    assert(conv("""[]""") == (TString, true))
  }

  test("union rule 2: degenerate [null] → nullable string") {
    assert(conv("""["null"]""") == (TString, true))
  }

  test("union rule 3: [null, primitive] → that primitive, nullable") {
    assert(conv("""["null","long"]""") == (TLong, true))
    assert(conv("""["null","int"]""") == (TInt, true))
    assert(conv("""["null","boolean"]""") == (TBoolean, true))
    assert(conv("""["null","bytes"]""") == (TBinary, true))
    // unknown primitive name → string
    assert(conv("""["null","frobnicate"]""") == (TString, true))
  }

  test("union: only the SECOND branch is inspected — 3-way union keeps branch 2") {
    assert(conv("""["null","long","string"]""") == (TLong, true))
    assert(conv("""["null","string","long"]""") == (TString, true))
  }

  test("union rule 4: [null, dict] honors logical types") {
    assert(conv("""["null",{"type":"long","logicalType":"timestamp-millis"}]""")
      == (TTimestamp("millis"), true))
    assert(conv("""["null",{"type":"long","logicalType":"timestamp-micros"}]""")
      == (TTimestamp("micros"), true))
    assert(conv("""["null",{"type":"int","logicalType":"timestamp-millis"}]""")
      == (TTimestamp("millis"), true))
    assert(conv("""["null",{"type":"int","logicalType":"date"}]""") == (TDate, true))
    // decimal forced to (38,9) regardless of declared P/S
    assert(conv("""["null",{"type":"bytes","logicalType":"decimal","precision":38,"scale":30}]""")
      == (TDecimal, true))
    assert(conv("""["null",{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}]""")
      == (TDecimal, true))
    assert(TDecimal.toSpark == DecimalType(38, 9))
  }

  test("union rule 4 fallback: complex second branch → STRING (the logical-dict mapper" +
    " has no entry for array/map/record type names)") {
    assert(conv("""["null",{"type":"array","items":"long"}]""") == (TString, true))
    assert(conv("""["null",{"type":"map","values":"double"}]""") == (TString, true))
    assert(conv("""["null",{"type":"record","name":"x","fields":[]}]""") == (TString, true))
  }

  test("union rule 4: [null, {plain primitive dict}] → primitive") {
    assert(conv("""["null",{"type":"long"}]""") == (TLong, true))
  }

  // ---- non-union dict nodes (main.py:352-396) ----
  test("dict node: timestamps honored, date/decimal fall through to base type") {
    assert(conv("""{"type":"long","logicalType":"timestamp-millis"}""")
      == (TTimestamp("millis"), false))
    assert(conv("""{"type":"long","logicalType":"timestamp-micros"}""")
      == (TTimestamp("micros"), false))
    // date outside a union is NOT honored — stays int
    assert(conv("""{"type":"int","logicalType":"date"}""") == (TInt, false))
    // decimal outside a union is NOT honored — stays bytes
    assert(conv("""{"type":"bytes","logicalType":"decimal","precision":38,"scale":9}""")
      == (TBinary, false))
  }

  test("dict node: array/map always nullable, record non-nullable") {
    assert(conv("""{"type":"array","items":"long"}""") == (TArray(TLong), true))
    assert(conv("""{"type":"map","values":"double"}""") == (TMap(TDouble), true))
    val (t, n) = conv(
      """{"type":"record","name":"r","fields":[
        {"name":"a","type":"int"},{"name":"b","type":["null","string"]}]}""")
    assert(t == TStruct(Seq(TField("a", TInt, false), TField("b", TString, true))))
    assert(!n)
    // nested logical type inside a record, non-union → timestamp honored
    val (t2, _) = conv(
      """{"type":"record","name":"r2","fields":[
        {"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}}]}""")
    assert(t2 == TStruct(Seq(TField("ts", TTimestamp("micros"), false))))
  }

  test("unrecognized nodes → nullable string") {
    assert(conv("""{"type":"enum","name":"e","symbols":["A"]}""") == (TString, true))
    assert(conv("""{"type":"fixed","name":"f","size":4}""") == (TString, true))
    assert(conv("""42""") == (TString, true))
  }

  // ---- flat schema derivation (main.py:55-108) ----
  private val envelope =
    """{"type":"record","name":"cdc_event","fields":[
      {"name":"uuid","type":"string"},
      {"name":"read_timestamp","type":{"type":"long","logicalType":"timestamp-millis"}},
      {"name":"sort_keys","type":["null","string"]},
      {"name":"source_metadata","type":{"type":"record","name":"sm","fields":[
        {"name":"schema","type":"string"},{"name":"table","type":"string"},
        {"name":"is_deleted","type":"boolean"},{"name":"change_type","type":"string"},
        {"name":"tx_id","type":["null","long"]},{"name":"lsn","type":["null","string"]},
        {"name":"primary_keys","type":{"type":"array","items":"string"}}]}},
      {"name":"payload","type":["null",{"type":"record","name":"p","fields":[
        {"name":"id","type":"long"},
        {"name":"name","type":["null","string"]},
        {"name":"active","type":["null","boolean"]},
        {"name":"qty","type":["null","int"]},
        {"name":"price","type":["null",{"type":"bytes","logicalType":"decimal","precision":38,"scale":30}]},
        {"name":"created_at","type":["null",{"type":"long","logicalType":"timestamp-micros"}]},
        {"name":"updated_on","type":["null",{"type":"int","logicalType":"date"}]}]}]}
    ]}"""

  test("deriveFlatSchema: fixed source_metadata + typed payload.*, envelope dropped") {
    val flat = AvroSchemaConverter.deriveFlatSchema(envelope)
    val spark = flat.toSpark
    assert(spark.fieldNames.toSeq ==
      Seq("source_metadata", "id", "name", "active", "qty", "price", "created_at", "updated_on"))
    val sm = spark("source_metadata").dataType.asInstanceOf[StructType]
    assert(sm.fieldNames.toSeq ==
      Seq("schema", "table", "is_deleted", "change_type", "tx_id", "lsn", "primary_keys"))
    assert(sm("tx_id").dataType == LongType)
    assert(sm("primary_keys").dataType == ArrayType(StringType, containsNull = true))
    assert(spark("id").dataType == LongType && !spark("id").nullable)
    assert(spark("price").dataType == DecimalType(38, 9))
    assert(spark("created_at").dataType == TimestampType)
    assert(spark("updated_on").dataType == DateType)
  }

  test("deriveFlatSchema: bare-record payload and missing payload") {
    val bare =
      """{"type":"record","name":"e","fields":[
        {"name":"payload","type":{"type":"record","name":"p","fields":[
          {"name":"x","type":"int"}]}}]}"""
    assert(AvroSchemaConverter.deriveFlatSchema(bare).toSpark.fieldNames.toSeq ==
      Seq("source_metadata", "x"))

    val missing = """{"type":"record","name":"e2","fields":[{"name":"a","type":"int"}]}"""
    assert(AvroSchemaConverter.deriveFlatSchema(missing).toSpark.fieldNames.toSeq ==
      Seq("source_metadata"))

    // payload that is not a record (and no record branch in its union)
    val nonRec = """{"type":"record","name":"e3","fields":[{"name":"payload","type":"string"}]}"""
    assert(AvroSchemaConverter.deriveFlatSchema(nonRec).toSpark.fieldNames.toSeq ==
      Seq("source_metadata"))
  }

  test("fallbackSchema: payload columns all nullable string, source_metadata kept") {
    val flat = AvroSchemaConverter.deriveFlatSchema(envelope)
    val fb = AvroSchemaConverter.fallbackSchema(flat).toSpark
    assert(fb.fieldNames.toSeq == flat.toSpark.fieldNames.toSeq)
    fb.fields.drop(1).foreach { f =>
      assert(f.dataType == StringType && f.nullable, f.name)
    }
    assert(fb("source_metadata").dataType.isInstanceOf[StructType])
  }
}
