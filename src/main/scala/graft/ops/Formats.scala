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

  /** Malformed-input accounting: every seventh document's JSON line is
    * deterministically truncated before write, then the file is read back
    * in PERMISSIVE mode with an explicit `_corrupt_record` column — the
    * posture an ingestion edge needs (a bad record must land in
    * quarantine accounting, never kill the job, and FAILFAST would).
    * Corrupt rows parse to all-null + the raw line, so bucketing on
    * `coalesce(lang, '__corrupt')` yields per-language clean counts plus
    * the quarantine size; the oracle recomputes both from the clean
    * parquet and the corruption rule. The extra `doc_id` reference in the
    * aggregate matters: Spark refuses queries that project ONLY the
    * corrupt column from a raw JSON scan.
    */
  def qMalformedQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-malformed")
    val txtDir = tmp.resolve("docs_jsonl").toString
    Tables.documents(spark, dir)
      .select(
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
            lit(",\"lang\":\"")))
        .otherwise(to_json(struct(col("doc_id"), col("lang"))))
        .as("value"))
      .write.mode("overwrite").text(txtDir)

    val parsed = spark.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("_corrupt_record", StringType))))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(txtDir)
    // partial-result parsing (Spark recovers doc_id from the truncated
    // line) makes count(doc_id) include quarantined rows; count ids on
    // CLEAN rows explicitly so the metric is parser-version-independent
    parsed
      .groupBy(coalesce(col("lang"), lit("__corrupt")).as("lang_bucket"))
      .agg(count(lit(1)).as("n"),
        count(when(col("_corrupt_record").isNull, col("doc_id")))
          .as("n_parsed_ids"))
      .orderBy(col("lang_bucket"))
  }

  val qMalformedQuarantineOracle: String =
    """SELECT CASE WHEN doc_id % 7 = 0 THEN '__corrupt' ELSE lang END
        AS lang_bucket,
      count(*) AS n,
      sum(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END)::BIGINT AS n_parsed_ids
      FROM documents GROUP BY 1 ORDER BY lang_bucket"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_csv_json_roundtrip" -> (qCsvJsonRoundtrip _),
    "q_malformed_quarantine" -> (qMalformedQuarantine _),
  )

  val oracles: Map[String, String] = Map(
    "q_csv_json_roundtrip" -> qCsvJsonRoundtripOracle,
    "q_malformed_quarantine" -> qMalformedQuarantineOracle,
  )
}
