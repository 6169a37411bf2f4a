package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketing = the 100 TB co-located-join strategy: write both sides
  * bucketed by the join key and the join needs NO shuffle at read time.
  * This spec proves the property on the actual plan, not by assertion of
  * intent: the bucketed join's physical plan contains zero Exchange nodes,
  * while the plain-parquet control plan shuffles both sides.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without any Exchange; plain parquet shuffles") {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)

    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_li_bucketed")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so the shuffle question is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val bucketed = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString

      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plainPlan = plain.queryExecution.executedPlan.toString

      def joinExchanges(plan: String): Int =
        plan.linesIterator.count(l =>
          l.contains("Exchange hashpartitioning") &&
            (l.contains("orderkey") || l.contains("_orderkey")))

      assert(joinExchanges(bucketedPlan) == 0,
        s"bucketed join should not shuffle on the join key:\n$bucketedPlan")
      assert(joinExchanges(plainPlan) == 2,
        s"control: plain join shuffles both sides:\n$plainPlan")

      // and the answers agree
      val a = bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val b = plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(a == b && a.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }
}
