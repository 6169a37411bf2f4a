package graft.avro

import scala.util.Random

import org.apache.avro.Schema
import org.scalatest.funsuite.AnyFunSuite

import AvroSparkType._

/** Schema-SHAPE randomization (verdict r16 #5): AvroPropertySpec already
  * fuzzes `typeFromNode` over arbitrary (even invalid) JSON nodes and
  * SplitPropertySpec fuzzes container framing, but the writer-schema
  * SHAPES — nested unions × logical types × depth — reaching
  * `deriveFlatSchema` and the end-to-end convert were hand-enumerated.
  * This spec generates ≥200 seeded random VALID Avro writer schemas
  * (every one accepted by `org.apache.avro.Schema.Parser`, so they are
  * schemas a real producer could write) and pins:
  *
  *  - leg A (all schemas): `deriveFlatSchema` never throws, derives
  *    exactly one flat field per payload field (names in order), and
  *    matches the rule-level expectation (type + nullability) that the
  *    generator computes alongside each shape from the documented union
  *    rules (reference main.py:299-396 / SURVEY §2.3) — where a shape is
  *    outside the crisp rule set the expectation is None and only
  *    totality + field count are asserted;
  *  - leg B (a 24-schema prefix): files with VALUES co-generated against
  *    each schema run through ONE `runOnce` batch (24 distinct
  *    writer-schema fingerprints in a single poll — also the widest
  *    multi-schema-group batch in the suite), no file may fail, and
  *    every output table reads back with the produced row count.
  */
class SchemaShapePropertySpec extends AnyFunSuite {

  /** One generated payload field: its schema JSON, the rule-level
    * expectation when the shape is crisp, and a value generator used by
    * leg B (null means "write null", valid because every nullable shape
    * here is a null-first union — the generator only returns null for
    * those).
    */
  private case class FieldShape(
      json: String,
      expected: Option[(AvroSparkType, Boolean)],
      value: Random => Any)

  private def bi(digits: String): Array[Byte] =
    new java.math.BigInteger(digits).toByteArray

  /** In-range scale-30 decimal bytes: unscaled = d * 10^30 for a small d,
    * well inside DECIMAL(38,9) after the converter's rescale.
    */
  private def dec30(rnd: Random): Array[Byte] =
    bi((rnd.nextInt(2000) - 1000).toString + "0" * 30)

  private val prims: Vector[(String, AvroSparkType, Random => Any)] = Vector(
    ("string", TString, r => s"v${r.nextInt(1000)}"),
    ("boolean", TBoolean, r => r.nextBoolean()),
    ("int", TInt, r => r.nextInt()),
    ("long", TLong, r => r.nextLong()),
    ("float", TFloat, r => r.nextFloat()),
    ("double", TDouble, r => r.nextDouble()),
    ("bytes", TBinary, r => Array.fill[Byte](4)(r.nextInt(256).toByte)),
  )

  private val logicals
      : Vector[(String, AvroSparkType, Random => Any)] = Vector(
    ("""{"type":"long","logicalType":"timestamp-millis"}""",
      TTimestamp("millis"), r => 1700000000000L + r.nextInt(1000000).toLong),
    ("""{"type":"long","logicalType":"timestamp-micros"}""",
      TTimestamp("micros"), r => 1700000000000000L + r.nextInt(1000000).toLong),
    ("""{"type":"int","logicalType":"date"}""", TDate,
      r => 19000 + r.nextInt(2000)),
    ("""{"type":"bytes","logicalType":"decimal","precision":38,"scale":30}""",
      TDecimal, dec30 _),
    // declared P/S is IGNORED by the reference mapping — still (38,9)
    ("""{"type":"bytes","logicalType":"decimal","precision":20,"scale":5}""",
      TDecimal, dec30 _),
    // logical on a string base: logical-dict table has no entry → string
    ("""{"type":"string","logicalType":"uuid"}""", TString,
      r => s"u${r.nextInt(1000)}"),
  )

  /** One random field shape. `names` supplies unique nested-record names
    * (Avro requires global uniqueness within a schema).
    */
  private def genField(rnd: Random, names: Iterator[String],
      depth: Int): FieldShape = {
    val pick = rnd.nextInt(if (depth > 0) 12 else 7)
    pick match {
      case 0 => // bare primitive → non-nullable
        val (n, t, v) = prims(rnd.nextInt(prims.size))
        FieldShape(s""""$n"""", Some((t, false)), v)
      case 1 | 2 => // ["null", primitive]
        val (n, t, v) = prims(rnd.nextInt(prims.size))
        FieldShape(s"""["null","$n"]""", Some((t, true)),
          r => if (r.nextInt(4) == 0) null else v(r))
      case 3 | 4 => // ["null", logical dict]
        val (j, t, v) = logicals(rnd.nextInt(logicals.size))
        FieldShape(s"""["null",$j]""", Some((t, true)),
          r => if (r.nextInt(4) == 0) null else v(r))
      case 5 => // union with non-"null" first branch → nullable string
        FieldShape(s"""["string","null"]""", Some((TString, true)),
          r => s"s${r.nextInt(100)}")
      case 6 => // 3-branch: ONLY the second branch is inspected → long
        FieldShape(s"""["null","long","string"]""", Some((TLong, true)),
          r => if (r.nextInt(4) == 0) null else Long.box(r.nextLong()))
      case 7 => // bare logical dict: date/decimal NOT honored outside unions
        FieldShape(s"""{"type":"int","logicalType":"date"}""",
          Some((TInt, false)), r => 19000 + r.nextInt(2000))
      case 8 => // ["null", complex] → nullable STRING (primitive-table miss)
        val inner = genField(rnd, names, 0)
        val complexJson = rnd.nextInt(3) match {
          case 0 => s"""{"type":"array","items":${inner.json}}"""
          case 1 => s"""{"type":"map","values":${inner.json}}"""
          case _ =>
            s"""{"type":"record","name":"${names.next()}","fields":[
               {"name":"n0","type":${inner.json}}]}"""
        }
        FieldShape(s"""["null",$complexJson]""", Some((TString, true)),
          r => null) // null is always a valid value for a null-first union
      case 10 => // enum: named-type miss in BOTH tables → nullable string
        val j =
          s"""{"type":"enum","name":"${names.next()}","symbols":["A","B","C"]}"""
        if (rnd.nextBoolean())
          FieldShape(j, Some((TString, true)), // bare dict catch-all
            r => Seq("A", "B", "C")(r.nextInt(3)))
        else
          FieldShape(s"""["null",$j]""", Some((TString, true)),
            r => if (r.nextInt(4) == 0) null
            else Seq("A", "B", "C")(r.nextInt(3)))
      case 11 => // fixed(4): same named-type miss → nullable string
        val j = s"""{"type":"fixed","name":"${names.next()}","size":4}"""
        if (rnd.nextBoolean())
          FieldShape(j, Some((TString, true)),
            r => Array.fill[Byte](4)(r.nextInt(256).toByte))
        else
          FieldShape(s"""["null",$j]""", Some((TString, true)),
            r => if (r.nextInt(4) == 0) null
            else Array.fill[Byte](4)(r.nextInt(256).toByte))
      case _ => // bare complex: array / map / nested record, recursive
        val inner = genField(rnd, names, depth - 1)
        rnd.nextInt(3) match {
          case 0 =>
            FieldShape(s"""{"type":"array","items":${inner.json}}""",
              inner.expected.map { case (t, _) => (TArray(t), true) },
              r => Seq(inner.value(r), inner.value(r)))
          case 1 =>
            FieldShape(s"""{"type":"map","values":${inner.json}}""",
              inner.expected.map { case (t, _) => (TMap(t), true) },
              r => Map("k0" -> inner.value(r)))
          case _ =>
            val sub = (0 until 1 + rnd.nextInt(2))
              .map(i => (s"n$i", genField(rnd, names, depth - 1)))
            val fs = sub.map { case (n, f) =>
              s"""{"name":"$n","type":${f.json}}"""
            }.mkString(",")
            FieldShape(
              s"""{"type":"record","name":"${names.next()}","fields":[$fs]}""",
              if (sub.forall(_._2.expected.isDefined))
                Some((TStruct(sub.map { case (n, f) =>
                  val (t, nl) = f.expected.get; TField(n, t, nl)
                }), false))
              else None,
              r => sub.map { case (n, f) => n -> f.value(r) }.toMap)
        }
    }
  }

  private def envelope(fields: Seq[(String, FieldShape)]): String = {
    val fjson = fields.map { case (n, f) =>
      s"""{"name":"$n","type":${f.json}}"""
    }.mkString(",")
    s"""{"type":"record","name":"cdc_event","fields":[
      {"name":"uuid","type":"string"},
      {"name":"read_timestamp","type":{"type":"long","logicalType":"timestamp-millis"}},
      {"name":"source_metadata","type":{"type":"record","name":"sm","fields":[
        {"name":"schema","type":"string"},{"name":"table","type":"string"},
        {"name":"is_deleted","type":"boolean"},{"name":"change_type","type":"string"},
        {"name":"tx_id","type":["null","long"]},{"name":"lsn","type":["null","string"]},
        {"name":"primary_keys","type":{"type":"array","items":"string"}}]}},
      {"name":"payload","type":["null",{"type":"record","name":"p","fields":[$fjson]}]}
    ]}"""
  }

  private def genSchema(seed: Int): (String, Seq[(String, FieldShape)]) = {
    val rnd = new Random(seed)
    val names = Iterator.from(0).map(i => s"rec_${seed}_$i")
    val fields = (0 until 1 + rnd.nextInt(7))
      .map(i => (s"f$i", genField(rnd, names, 2)))
    (envelope(fields), fields)
  }

  test("220 random writer schemas: valid Avro, deriveFlatSchema total, " +
    "field count + crisp rule expectations hold") {
    var crisp = 0
    (0 until 220).foreach { seed =>
      val (json, fields) = genSchema(seed)
      // the generator must emit real Avro — otherwise the property is
      // vacuous (parser throw = generator bug, not converter bug)
      new Schema.Parser().parse(json)
      val flat =
        try AvroSchemaConverter.deriveFlatSchema(json)
        catch {
          case e: Throwable =>
            fail(s"deriveFlatSchema threw for seed=$seed: $e\n$json")
        }
      assert(flat.payloadFields.map(_.name) == fields.map(_._1),
        s"seed=$seed: field names/order/count mismatch")
      fields.zip(flat.payloadFields).foreach {
        case ((n, shape), derived) =>
          shape.expected.foreach { case (t, nl) =>
            crisp += 1
            assert(derived.tpe == t && derived.nullable == nl,
              s"seed=$seed field=$n: derived (${derived.tpe}, " +
                s"${derived.nullable}) != expected ($t, $nl)\n${shape.json}")
          }
      }
    }
    assert(crisp > 400, s"only $crisp crisp-rule checks fired — generator drifted")
  }

  test("24 random schemas end-to-end: one runOnce batch, zero failures, " +
    "row counts preserved per table") {
    val spark = graft.SparkTestSession.spark
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-shape-prop").toString
    val rowsPerFile = 3
    val schemas = (0 until 24).map(genSchema)
    schemas.zipWithIndex.foreach { case ((json, fields), i) =>
      val rnd = new Random(1000 + i)
      val rows = (0 until rowsPerFile).map { r =>
        val payload: Any =
          if (r == rowsPerFile - 1) null // null payload row: all columns null
          else fields.map { case (n, f) => n -> f.value(rnd) }.toMap
        Map[String, Any](
          "uuid" -> s"u$i-$r",
          "read_timestamp" -> (1700000000000L + r),
          "source_metadata" -> Map[String, Any](
            "schema" -> "public", "table" -> s"t$i",
            "is_deleted" -> false, "change_type" -> "INSERT",
            "tx_id" -> r.toLong, "lsn" -> s"0/$r",
            "primary_keys" -> Seq("f0")),
          "payload" -> payload)
      }
      try AvroFixtures.writeAvro(s"$tmp/landing/avro/s$i/f.avro", json, rows)
      catch { case e: Throwable =>
        fail(s"writeAvro failed for seed=$i: $e\nschema=$json\n" +
          fields.map { case (n, f) => s"$n -> ${f.json}" }.mkString("\n"))
      }
    }
    val report = graft.convert.AvroToParquetJob.runOnce(
      spark, s"$tmp/landing/avro/*/*.avro", s"$tmp/out")
    assert(report.failed.isEmpty,
      s"random-schema batch had failures: ${report.failed}")
    assert(report.discovered == 24 && report.converted.size == 24)
    (0 until 24).foreach { i =>
      val n = spark.read.parquet(s"$tmp/out/s$i").count()
      assert(n == rowsPerFile, s"table s$i read back $n rows")
    }
  }
}
