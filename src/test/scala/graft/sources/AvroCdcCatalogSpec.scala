package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.avro.AvroFixtures

/** The landing-zone TableCatalog: folders become SQL tables, schemas merge
  * across file generations, and the catalog is read-only.
  */
class AvroCdcCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def landing(): String = {
    val in = Files.createTempDirectory("graft-cat").toFile.getAbsolutePath
    AvroFixtures.writeAvro(s"$in/avro/users/a.avro", AvroFixtures.BasicEnvelope, Seq(
      Map("uuid" -> "u1", "read_timestamp" -> 0L,
        "source_metadata" -> AvroFixtures.sm("users", txId = 1L),
        "payload" -> Map("id" -> 1L, "name" -> "alice")),
      Map("uuid" -> "u2", "read_timestamp" -> 0L,
        "source_metadata" -> AvroFixtures.sm("users", isDeleted = true, txId = 2L),
        "payload" -> Map("id" -> 2L, "name" -> "bob"))))
    AvroFixtures.writeAvro(s"$in/avro/orders/b.avro", AvroFixtures.BasicEnvelope, Seq(
      Map("uuid" -> "u3", "read_timestamp" -> 0L,
        "source_metadata" -> AvroFixtures.sm("orders", txId = 3L),
        "payload" -> Map("id" -> 10L, "name" -> "o1"))))
    in
  }

  test("folders are SQL tables; filters and pruning work through the catalog") {
    val root = landing()
    val cat = s"cdc_t1"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AvroCdcCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)

    val tables = spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getAs[String]("tableName")).sorted.toSeq
    assert(tables == Seq("orders", "users"))

    val live = spark.sql(
      s"SELECT id, name FROM $cat.users WHERE NOT source_metadata.is_deleted")
      .collect()
    assert(live.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "alice")))

    assert(spark.sql(s"SELECT * FROM $cat.orders").count() == 1)

    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.missing").collect() }
    intercept[Exception] {
      spark.sql(s"DROP TABLE $cat.users")
    }
  }

  test("schema merge across generations: conflicting payload type → string") {
    val root = Files.createTempDirectory("graft-cat2").toFile.getAbsolutePath
    def envelope(qtyType: String) =
      s"""{"type":"record","name":"e","fields":[
        {"name":"source_metadata","type":{"type":"record","name":"sm","fields":[
          {"name":"schema","type":"string"},{"name":"table","type":"string"},
          {"name":"is_deleted","type":"boolean"},{"name":"change_type","type":"string"},
          {"name":"tx_id","type":["null","long"]},{"name":"lsn","type":["null","string"]},
          {"name":"primary_keys","type":{"type":"array","items":"string"}}]}},
        {"name":"payload","type":["null",{"type":"record","name":"p","fields":[
          {"name":"id","type":"long"},{"name":"qty","type":"$qtyType"}]}]}
      ]}"""
    AvroFixtures.writeAvro(s"$root/avro/t/gen1.avro", envelope("long"), Seq(
      Map("source_metadata" -> AvroFixtures.sm("t"),
        "payload" -> Map("id" -> 1L, "qty" -> 5L))))
    AvroFixtures.writeAvro(s"$root/avro/t/gen2.avro", envelope("string"), Seq(
      Map("source_metadata" -> AvroFixtures.sm("t"),
        "payload" -> Map("id" -> 2L, "qty" -> "seven"))))

    val cat = "cdc_t2"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AvroCdcCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)

    val df = spark.sql(s"SELECT id, qty FROM $cat.t ORDER BY id")
    assert(df.schema("qty").dataType == org.apache.spark.sql.types.StringType)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "5"), (2L, "seven")))
  }

  test("two schema fingerprints INTERLEAVED in one landing directory: the " +
    "catalog serves one merged view — type conflict to string, new column " +
    "null-backfilled, every file read exactly once, aggregates correct") {
    val root = Files.createTempDirectory("graft-cat3").toFile.getAbsolutePath
    // generation A: qty long; generation B: qty STRING + new column city.
    // Files interleave by name (a1, b1, a2, b2) — the discovery order a
    // real landing zone produces when both writer generations are live.
    def envelope(gen: Char) = {
      val fields =
        if (gen == 'A') """{"name":"id","type":"long"},{"name":"qty","type":"long"}"""
        else
          """{"name":"id","type":"long"},{"name":"qty","type":"string"},
             {"name":"city","type":["null","string"]}"""
      s"""{"type":"record","name":"e","fields":[
        {"name":"source_metadata","type":{"type":"record","name":"sm","fields":[
          {"name":"schema","type":"string"},{"name":"table","type":"string"},
          {"name":"is_deleted","type":"boolean"},{"name":"change_type","type":"string"},
          {"name":"tx_id","type":["null","long"]},{"name":"lsn","type":["null","string"]},
          {"name":"primary_keys","type":{"type":"array","items":"string"}}]}},
        {"name":"payload","type":["null",{"type":"record","name":"p","fields":[
          $fields]}]}
      ]}"""
    }
    def rowA(id: Long, qty: Long) = Map[String, Any](
      "source_metadata" -> AvroFixtures.sm("t"),
      "payload" -> Map("id" -> id, "qty" -> qty))
    def rowB(id: Long, qty: String, city: String) = Map[String, Any](
      "source_metadata" -> AvroFixtures.sm("t"),
      "payload" -> Map("id" -> id, "qty" -> qty, "city" -> city))
    AvroFixtures.writeAvro(s"$root/avro/t/a1.avro", envelope('A'),
      Seq(rowA(1L, 5L), rowA(2L, 6L)))
    AvroFixtures.writeAvro(s"$root/avro/t/b1.avro", envelope('B'),
      Seq(rowB(3L, "7", "berlin")))
    AvroFixtures.writeAvro(s"$root/avro/t/a2.avro", envelope('A'),
      Seq(rowA(4L, 8L)))
    AvroFixtures.writeAvro(s"$root/avro/t/b2.avro", envelope('B'),
      Seq(rowB(5L, "9", "tokyo")))

    val cat = "cdc_t3"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[AvroCdcCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)

    val df = spark.sql(s"SELECT id, qty, city FROM $cat.t ORDER BY id")
    assert(df.schema("qty").dataType == org.apache.spark.sql.types.StringType)
    assert(df.schema("city").dataType == org.apache.spark.sql.types.StringType)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(rows.toSeq == Seq(
      (1L, "5", None), (2L, "6", None), (3L, "7", Some("berlin")),
      (4L, "8", None), (5L, "9", Some("tokyo"))),
      s"merged view must coerce per-file and null-backfill: ${rows.toSeq}")
    // an aggregate through SQL over the merged view
    val agg = spark.sql(
      s"SELECT count(*) n, count(city) c FROM $cat.t").collect()(0)
    assert(agg.getLong(0) == 5L && agg.getLong(1) == 2L)
  }
}
