package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.avro.AvroFixtures

class AvroCdcDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeFixture(): String = {
    val in = Files.createTempDirectory("graft-dsv2").toFile.getAbsolutePath
    AvroFixtures.writeAvro(s"$in/avro/users/a.avro", AvroFixtures.BasicEnvelope, Seq(
      Map("uuid" -> "u1", "read_timestamp" -> 0L,
        "source_metadata" -> AvroFixtures.sm("users", txId = 5L),
        "payload" -> Map("id" -> 1L, "name" -> "alice", "qty" -> 7)),
      Map("uuid" -> "u2", "read_timestamp" -> 0L,
        "source_metadata" -> AvroFixtures.sm("users", txId = 6L),
        "payload" -> Map("id" -> 2L, "name" -> "bob"))))
    AvroFixtures.writeAvro(s"$in/avro/users/b.avro", AvroFixtures.BasicEnvelope, Seq(
      Map("uuid" -> "u3", "read_timestamp" -> 0L,
        "source_metadata" -> AvroFixtures.sm("users", txId = 7L),
        "payload" -> Map("id" -> 3L, "name" -> "carol", "qty" -> 9))))
    in
  }

  test("cdc-avro DSv2: flattened typed read over a glob, one partition per file") {
    val in = writeFixture()
    val df = spark.read.format("cdc-avro").load(s"$in/avro/*/*.avro")
    assert(df.columns.contains("source_metadata") && df.columns.contains("id"))
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    val sm = rows(0).getStruct(rows(0).fieldIndex("source_metadata"))
    assert(sm.getLong(sm.fieldIndex("tx_id")) == 5L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("qty")))
    assert(rows(2).getAs[String]("_input_path").endsWith("b.avro"))
  }

  test("cdc-avro DSv2: column pruning reaches the scan") {
    val in = writeFixture()
    val df = spark.read.format("cdc-avro").load(s"$in/avro/*/*.avro")
      .select("id", "name")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("columns=[id,name]"), scanDesc)
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("alice", "bob", "carol"))
  }

  test("cdc-avro DSv2: SQL over the source via a view") {
    val in = writeFixture()
    spark.read.format("cdc-avro").load(s"$in/avro/*/*.avro")
      .createOrReplaceTempView("cdc_users")
    val got = spark.sql(
      "SELECT count(*) AS n, sum(qty) AS q FROM cdc_users WHERE NOT source_metadata.is_deleted")
      .collect().head
    assert(got.getLong(0) == 3L && got.getLong(1) == 16L)
  }
}
