package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Canary for driver-side testdata regeneration: if the generator changes
  * a column name or physical type again (mid-round it switched `events.ts`
  * from int64 nanoseconds to a native µs timestamp and 20 specs failed
  * with scattered analysis errors), THIS spec should be the one that
  * fails, with a message naming the drifted table — everything else is
  * downstream noise. It pins the loader-facing contract, not the raw
  * file: `Tables.events` is checked AFTER normalization, so both
  * generator vintages pass.
  */
class TestdataContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def schemaOf(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap

  private def check(table: String, df: org.apache.spark.sql.DataFrame,
      expected: Map[String, String]): Unit = {
    val actual = schemaOf(df)
    assert(actual == expected,
      s"TESTDATA DRIFT in `$table`: the driver regenerated the test " +
        s"tables with a different schema.\n  expected: ${expected.toSeq.sorted}" +
        s"\n  actual:   ${actual.toSeq.sorted}\n" +
        "Fix the loader in graft.ops.Tables (and any raw readers) first — " +
        "other spec failures are downstream of this.")
  }

  test("all ten driver tables present the expected loader-facing schemas") {
    val s = spark
    check("lineitem", Tables.lineitem(s, dir), Map(
      "l_orderkey" -> "long", "l_partkey" -> "long", "l_suppkey" -> "long",
      "l_linenumber" -> "integer", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double",
      "l_tax" -> "double", "l_returnflag" -> "string",
      "l_linestatus" -> "string", "l_shipdate" -> "timestamp_ntz"))
    check("orders", Tables.orders(s, dir), Map(
      "o_orderkey" -> "long", "o_custkey" -> "long",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"))
    check("customer", Tables.customer(s, dir), Map(
      "c_custkey" -> "long", "c_name" -> "string",
      "c_nationkey" -> "integer", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"))
    check("supplier", Tables.supplier(s, dir), Map(
      "s_suppkey" -> "long", "s_name" -> "string",
      "s_nationkey" -> "integer", "s_acctbal" -> "double"))
    check("part", Tables.part(s, dir), Map(
      "p_partkey" -> "long", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "integer",
      "p_retailprice" -> "double"))
    check("nation", Tables.nation(s, dir), Map(
      "n_nationkey" -> "integer", "n_name" -> "string",
      "n_regionkey" -> "integer"))
    check("region", Tables.region(s, dir), Map(
      "r_regionkey" -> "integer", "r_name" -> "string"))
    check("documents", Tables.documents(s, dir), Map(
      "doc_id" -> "long", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "long"))
    check("embeddings", Tables.embeddings(s, dir), Map(
      "vec_id" -> "long", "embedding" -> "array", "label" -> "integer"))
    // events is checked AFTER ts normalization — the loader must present
    // a µs TIMESTAMP regardless of which generator vintage wrote the file
    check("events (normalized)", Tables.events(s, dir), Map(
      "event_id" -> "long", "ts" -> "timestamp", "user_id" -> "long",
      "event_type" -> "string", "value" -> "double", "props" -> "string"))
  }
}
