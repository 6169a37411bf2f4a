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
    spark.read.parquet(s"$tmp/out")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_convert_roundtrip" -> (qCdcConvertRoundtrip _),
    "q_cdc_dsv2_scan" -> (qCdcDsv2Scan _),
  )
}
