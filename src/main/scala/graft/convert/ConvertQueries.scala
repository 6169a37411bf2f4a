package graft.convert

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.ConvertMode

/** Conversion-path queries for the driver gate. These synthesize their own
  * deterministic CDC Avro input (the conversion workload has no testdata
  * parquet equivalent), so they carry no DuckDB oracle — the driver records
  * the rows-only check; value-level assertions live in
  * `AvroToParquetJobSpec` / `AvroCdcDataSourceSpec`.
  */
object ConvertQueries {

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft-convq").toFile.getAbsolutePath
    graft.BenchData.writeCdcAvro(s"$dir/landing/avro/orders/part-0.avro", rows = 5000)
    graft.BenchData.writeCdcAvro(s"$dir/landing/avro/users/part-0.avro", rows = 3000)
    dir
  }

  /** Full job: Avro → flattened partitioned parquet → read back, aggregate
    * per folder/change_type.
    */
  def qCdcConvertRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = fixture()
    AvroToParquetJob.runOnce(spark, s"$tmp/landing/avro/*/*.avro",
      s"$tmp/out", ConvertMode.Standard, ingestionDate = Some("2024-06-01"))
    // reference layout: <out>/<folder>/ingestion_date=… — the folder is a
    // plain path segment, so read per folder and tag
    Seq("orders", "users").map { f =>
      spark.read.parquet(s"$tmp/out/$f").withColumn("folder", lit(f))
    }.reduce(_.unionByName(_))
      .groupBy(col("folder"), col("source_metadata.change_type").as("change_type"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("total_qty"),
        max(col("price")).as("max_price"))
      .orderBy(col("folder"), col("change_type"))
  }

  /** DSv2 scan path: `format("cdc-avro")` with pruning + SQL aggregation. */
  def qCdcDsv2Scan(spark: SparkSession, dir: String): DataFrame = {
    val tmp = fixture()
    spark.read.format("cdc-avro").load(s"$tmp/landing/avro/*/*.avro")
      .filter(!col("source_metadata.is_deleted"))
      .groupBy(col("source_metadata.table").as("tbl"))
      .agg(count(lit(1)).as("n"), avg(col("qty")).as("avg_qty"))
      .orderBy(col("tbl"))
  }

  /** ReferenceExact mode through the gate: a payload with complex/binary
    * columns routes the whole file through the all-string fallback
    * (reference main.py:524-567); the output proves the fallback schema
    * (typed source_metadata + all-string payload) and post-conversion
    * stringification survive a full write/read cycle.
    */
  def qCdcConvertExact(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-convx").toFile.getAbsolutePath
    val schemaJson =
      """{"type":"record","name":"cdc_event","fields":[
        {"name":"source_metadata","type":{"type":"record","name":"sm","fields":[
          {"name":"schema","type":"string"},{"name":"table","type":"string"},
          {"name":"is_deleted","type":"boolean"},{"name":"change_type","type":"string"},
          {"name":"tx_id","type":["null","long"]},{"name":"lsn","type":["null","string"]},
          {"name":"primary_keys","type":{"type":"array","items":"string"}}]}},
        {"name":"payload","type":["null",{"type":"record","name":"p","fields":[
          {"name":"id","type":"long"},
          {"name":"tags","type":{"type":"array","items":"string"}},
          {"name":"attrs","type":{"type":"map","values":"long"}}]}]}
      ]}"""
    // deterministic file with complex payload → fallback in exact mode
    val writer = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord]())
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val f = new java.io.File(s"$tmp/landing/avro/exact/part-0.avro")
    f.getParentFile.mkdirs()
    writer.create(schema, f)
    val smSchema = schema.getField("source_metadata").schema()
    val pSchema = schema.getField("payload").schema().getTypes.get(1)
    (1 to 1000).foreach { i =>
      val sm = new org.apache.avro.generic.GenericData.Record(smSchema)
      sm.put("schema", "public"); sm.put("table", "exact")
      sm.put("is_deleted", Boolean.box(i % 2 == 0)); sm.put("change_type", "UPDATE")
      sm.put("tx_id", Long.box(i.toLong)); sm.put("lsn", null)
      sm.put("primary_keys", java.util.Arrays.asList("id"))
      val p = new org.apache.avro.generic.GenericData.Record(pSchema)
      p.put("id", Long.box(i.toLong))
      p.put("tags", java.util.Arrays.asList(s"t${i % 3}", "x"))
      val m = new java.util.HashMap[String, java.lang.Long]()
      m.put("k", Long.box(i.toLong))
      p.put("attrs", m)
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("source_metadata", sm); rec.put("payload", p)
      writer.append(rec)
    }
    writer.close()

    AvroToParquetJob.runOnce(spark, s"$tmp/landing/avro/*/*.avro",
      s"$tmp/out", ConvertMode.ReferenceExact, ingestionDate = Some("2024-06-01"))
    // fallback output: payload columns are all strings (canonical JSON)
    spark.read.parquet(s"$tmp/out")
      .groupBy(col("tags"))
      .agg(count(lit(1)).as("n"), max(col("attrs")).as("max_attrs"),
        max(col("id")).as("max_id_str"))
      .orderBy(col("tags"))
  }

  /** Landing-zone catalog path: folders surfaced as SQL tables via
    * [[graft.sources.AvroCdcCatalog]], queried with plain multi-table SQL.
    */
  def qCdcCatalog(spark: SparkSession, dir: String): DataFrame = {
    val tmp = fixture()
    val cat = "cdc_gate"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.AvroCdcCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", s"$tmp/landing")
    spark.sql(
      s"""SELECT 'orders' AS tbl, count(*) AS n,
            sum(qty) AS total_qty FROM $cat.orders
          UNION ALL
          SELECT 'users' AS tbl, count(*) AS n,
            sum(qty) AS total_qty FROM $cat.users
          ORDER BY tbl""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_convert_roundtrip" -> (qCdcConvertRoundtrip _),
    "q_cdc_convert_exact" -> (qCdcConvertExact _),
    "q_cdc_dsv2_scan" -> (qCdcDsv2Scan _),
    "q_cdc_catalog" -> (qCdcCatalog _),
  )
}
