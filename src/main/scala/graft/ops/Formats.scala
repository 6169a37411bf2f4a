package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet source/sink surface: CSV and JSON-lines, the two text
  * formats every ingestion edge still speaks.
  *
  * Conventions that make the round trip oracle-exact:
  *  - numeric columns survive text serialization bit-for-bit because
  *    Spark writes doubles with Java's shortest round-trip
  *    representation (`Double.toString`) and parses them back to the
  *    identical bit pattern — so aggregating the round-tripped CSV
  *    equals aggregating the original parquet;
  *  - money sums are still done in DECIMAL, not double, so no
  *    summation-order boundary exists in the emitted strings;
  *  - schemas are EXPLICIT on read: at 100 TB schema inference is a
  *    full extra pass over the text before the real job starts — an
  *    engine must never pay it implicitly.
  */
object Formats {

  private val csvSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  private val jsonSchema = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_mktsegment", StringType)))

  /** Write a year of orders as headered CSV and the customer dimension as
    * JSON lines, read both back with explicit schemas, and run the join +
    * aggregate on the round-tripped data. The oracle computes the same
    * result from the original parquet — a pass proves the text
    * round trip lost nothing.
    */
  def qCsvJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-formats")
    val csvDir = tmp.resolve("orders_csv").toString
    val jsonDir = tmp.resolve("customer_json").toString

    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .write.mode("overwrite").option("header", "true").csv(csvDir)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite").json(jsonDir)

    val orders = spark.read.schema(csvSchema)
      .option("header", "true").csv(csvDir)
    val cust = spark.read.schema(jsonSchema).json(jsonDir)
    orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("string")
          .as("total_price"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
  }

  val qCsvJsonRoundtripOracle: String =
    """SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
      sum(o_totalprice::DECIMAL(18,2))::VARCHAR AS total_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY c_mktsegment, o_orderstatus
      ORDER BY c_mktsegment, o_orderstatus"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_csv_json_roundtrip" -> (qCsvJsonRoundtrip _),
  )

  val oracles: Map[String, String] = Map(
    "q_csv_json_roundtrip" -> qCsvJsonRoundtripOracle,
  )
}
