package graft.avro

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import AvroSparkType._

/** Avro writer-schema (JSON) → Spark schema, implementing the reference's
  * exact (and deliberately non-standard) mapping rules.
  *
  * The reference operates on the schema as raw JSON (via fastavro), not a
  * validated Avro `Schema`, and several of its rules only make sense at
  * the JSON level (e.g. the non-standard bare `"decimal"` type name,
  * reference main.py:345). We therefore implement the converter over
  * Jackson `JsonNode` rather than `org.apache.avro.Schema`.
  *
  * Rule sources in the reference:
  *  - primitive map: main.py:262-273
  *  - logical-dict map (union second-branch only): main.py:275-296
  *  - union rules: main.py:309-334
  *  - non-union node rules: main.py:337-396
  *  - flat CDC schema (fixed source_metadata + payload.*): main.py:55-108
  *
  * Notable consequences faithfully reproduced:
  *  - A union whose FIRST branch is not "null" → nullable string, whatever
  *    the branches are (main.py:311-315).
  *  - Only the SECOND branch of a `["null", ...]` union is inspected: a
  *    3-way `["null","long","string"]` becomes nullable long (main.py:324).
  *  - A `["null", {complex}]` union (array/map/record second branch)
  *    becomes nullable STRING, because the logical-dict mapper falls back
  *    to the primitive table which has no entry for complex type names
  *    (main.py:296 → main.py:273).
  *  - `logicalType: date` and `logicalType: decimal` are only honored via
  *    the union path; a bare non-union `{"type":"int","logicalType":"date"}`
  *    stays IntegerType (main.py:352-360 falls through to the base type).
  *  - Primitives declared outside a union are non-nullable; arrays/maps are
  *    always nullable; unknown nodes are nullable string.
  */
object AvroSchemaConverter {

  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** The fixed CDC source_metadata struct (reference main.py:66-74). */
  val SourceMetadataType: TStruct = TStruct(Seq(
    TField("schema", TString, nullable = true),
    TField("table", TString, nullable = true),
    TField("is_deleted", TBoolean, nullable = true),
    TField("change_type", TString, nullable = true),
    TField("tx_id", TLong, nullable = true),
    TField("lsn", TString, nullable = true),
    TField("primary_keys", TArray(TString), nullable = true),
  ))

  /** Full flat CDC output descriptor: source_metadata + payload.* promoted
    * to top level (reference main.py:55-108). Envelope fields other than
    * `payload` (uuid, read_timestamp, sort_keys, ...) are dropped by
    * construction.
    */
  final case class FlatSchema(payloadFields: Seq[TField]) {
    val struct: TStruct =
      TStruct(TField("source_metadata", SourceMetadataType, nullable = true) +: payloadFields)
    def toSpark: StructType = struct.toSpark
  }

  def deriveFlatSchema(avroSchemaJson: String): FlatSchema =
    deriveFlatSchema(parse(avroSchemaJson))

  def deriveFlatSchema(root: JsonNode): FlatSchema = {
    // locate the top-level "payload" field's type node
    val payloadNode: Option[JsonNode] =
      if (root.isObject && root.has("fields") && root.get("fields").isArray) {
        import scala.jdk.CollectionConverters._
        root.get("fields").elements().asScala
          .find(f => f.has("name") && f.get("name").asText() == "payload")
          .map(_.get("type"))
      } else None

    // payload may be a bare record or a union containing one; the FIRST
    // record branch among non-null branches wins (main.py:87-94)
    val record: Option[JsonNode] = payloadNode.flatMap { n =>
      if (n.isObject && typeName(n).contains("record")) Some(n)
      else if (n.isArray) {
        import scala.jdk.CollectionConverters._
        n.elements().asScala
          .filterNot(b => b.isTextual && b.asText() == "null")
          .find(b => b.isObject && typeName(b).contains("record"))
      } else None
    }

    val payloadFields: Seq[TField] = record match {
      case Some(rec) if rec.has("fields") && rec.get("fields").isArray =>
        import scala.jdk.CollectionConverters._
        rec.get("fields").elements().asScala.toSeq.map { pf =>
          val name = pf.get("name").asText()
          val (tpe, nullable) = typeFromNode(pf.get("type"))
          TField(name, tpe, nullable)
        }
      case _ => Seq.empty
    }
    FlatSchema(payloadFields)
  }

  private def typeName(n: JsonNode): Option[String] =
    if (n.has("type") && n.get("type").isTextual) Some(n.get("type").asText()) else None

  /** main.py:262-273 — unknown names fall back to string. */
  private def primitive(name: String): AvroSparkType = name match {
    case "string"  => TString
    case "boolean" => TBoolean
    case "int"     => TInt
    case "long"    => TLong
    case "float"   => TFloat
    case "double"  => TDouble
    case "bytes"   => TBinary
    case "null"    => TString // "friendly fallback"
    case _         => TString
  }

  /** main.py:275-296 — applied ONLY to the second branch of a null-first
    * union. Decimal is forced to (38,9) whatever the declared P/S.
    */
  private def fromLogicalDict(node: JsonNode): AvroSparkType = {
    val logical = if (node.has("logicalType")) node.get("logicalType").asText() else null
    val base = typeName(node).getOrElse("")
    if (logical == "timestamp-millis" && (base == "long" || base == "int")) TTimestamp("millis")
    else if (logical == "timestamp-micros" && (base == "long" || base == "int")) TTimestamp("micros")
    else if (logical == "date" && base == "int") TDate
    else if (logical == "decimal") TDecimal
    else primitive(base) // complex base names (array/map/record/...) → string
  }

  /** Avro-JSON type node → (type, nullable). Reference main.py:299-396. */
  def typeFromNode(node: JsonNode): (AvroSparkType, Boolean) = {
    if (node == null) return (TString, true)

    // ---- union ----
    if (node.isArray) {
      val first = if (node.size() > 0) node.get(0) else null
      // rule 1: first branch not the literal "null" → conservative string
      if (first == null || !(first.isTextual && first.asText() == "null")) return (TString, true)
      // rule 2: degenerate ["null"]
      if (node.size() < 2) return (TString, true)
      val second = node.get(1)
      // rule 3: second is a primitive name
      if (second.isTextual) return (primitive(second.asText()), true)
      // rule 4: second is a dict → logical mapping (only this branch is inspected)
      if (second.isObject) return (fromLogicalDict(second), true)
      // rule 5
      return (TString, true)
    }

    // ---- bare primitive name ----
    if (node.isTextual) {
      return node.asText() match {
        case "string"  => (TString, false)
        case "boolean" => (TBoolean, false)
        case "int"     => (TInt, false)
        case "long"    => (TLong, false)
        case "float"   => (TFloat, false)
        case "decimal" => (TDouble, false) // non-standard bare "decimal" (main.py:345)
        case "double"  => (TDouble, false)
        case "bytes"   => (TBinary, false)
        case "null"    => (TString, true)
        case _         => (TString, true)
      }
    }

    // ---- dict with "type" ----
    if (node.isObject) {
      val t = typeName(node).getOrElse("")
      val logical = if (node.has("logicalType")) node.get("logicalType").asText() else null

      if (logical != null && (t == "long" || t == "int")) {
        if (logical == "timestamp-millis") return (TTimestamp("millis"), false)
        if (logical == "timestamp-micros") return (TTimestamp("micros"), false)
        // other logicalTypes (incl. date, decimal) fall through to base type
      }

      t match {
        case "string"  => (TString, false)
        case "boolean" => (TBoolean, false)
        case "int"     => (TInt, false)
        case "long"    => (TLong, false)
        case "float"   => (TFloat, false)
        case "double"  => (TDouble, false)
        case "bytes"   => (TBinary, false)
        case "array" =>
          val (item, _) = typeFromNode(node.get("items"))
          (TArray(item), true)
        case "map" =>
          val (v, _) = typeFromNode(node.get("values"))
          (TMap(v), true)
        case "record" =>
          import scala.jdk.CollectionConverters._
          val fields =
            if (node.has("fields") && node.get("fields").isArray)
              node.get("fields").elements().asScala.toSeq.map { f =>
                val fname = f.get("name").asText()
                val (ft, fn) = typeFromNode(f.get("type"))
                TField(fname, ft, fn)
              }
            else Seq.empty
          (TStruct(fields), false)
        case _ => (TString, true)
      }
    } else (TString, true)
  }

  /** The all-string fallback schema for a flat schema: source_metadata kept
    * as the typed struct, every payload column nullable string
    * (reference main.py:543-556).
    */
  def fallbackSchema(flat: FlatSchema): FlatSchema =
    FlatSchema(flat.payloadFields.map(f => TField(f.name, TString, nullable = true)))
}
