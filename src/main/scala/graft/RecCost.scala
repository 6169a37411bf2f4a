package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q_sql_recursive's cost — the corpus pass
  * (window lead + bucket aggregate + collect) vs the 12-level UnionLoop
  * recursion over the 13-row LocalRelation, and the recursion's
  * sensitivity to the final ORDER BY. Run:
  * `sbt "runMain graft.RecCost /root/testdata/sf0.1"`.
  */
object RecCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    import org.apache.spark.sql.expressions.Window
    (1 to 3).foreach { i =>
      // corpus pass (mirrors qSqlRecursive's first half)
      val tCorpus = t {
        val ev = graft.ops.Tables.events(spark, dir)
          .select(col("user_id"), col("ts"), col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = ev
          .withColumn("next_ts", lead(col("ts"), 1).over(w))
          .crossJoin(broadcast(ev.agg(max(col("ts")).as("tend"))))
          .select(
            least(
              when(col("next_ts").isNotNull,
                expr("(unix_timestamp(next_ts) - unix_timestamp(ts)) DIV 14400"))
                .otherwise(
                  expr("(unix_timestamp(tend) - unix_timestamp(ts)) DIV 14400")),
              lit(11L)).as("t"),
            col("next_ts").isNotNull.cast("long").as("completed"))
        val byBucket = gaps.groupBy(col("t"))
          .agg(sum(col("completed")).as("d"),
            sum(lit(1L) - col("completed")).as("c"))
        byBucket.collect()
        ()
      }
      import spark.implicits._
      (0L to 11L).map(x => (x, x, x)).toDF("t", "d", "c")
        .createOrReplaceTempView("graft_km_probe")
      val recSql = """
        WITH RECURSIVE
        n0 AS (SELECT sum(d + c) AS n FROM graft_km_probe),
        r (t, n_risk, n_completed, n_censored, s_e9) AS (
          SELECT lt.t, n0.n, lt.d, lt.c,
            ((n0.n - lt.d) * CAST(1000000000 AS BIGINT)) DIV n0.n
          FROM graft_km_probe lt CROSS JOIN n0 WHERE lt.t = 0
          UNION ALL
          SELECT lt.t, r.n_risk - r.n_completed - r.n_censored, lt.d, lt.c,
            (r.s_e9 * (r.n_risk - r.n_completed - r.n_censored - lt.d))
              DIV (r.n_risk - r.n_completed - r.n_censored)
          FROM r JOIN graft_km_probe lt ON lt.t = r.t + 1
          WHERE r.n_risk - r.n_completed - r.n_censored > 0
        )
        SELECT t, n_risk, n_completed, n_censored, s_e9 FROM r"""
      val tRec = t {
        spark.sql(recSql + " ORDER BY t").write.format("noop")
          .mode("overwrite").save()
      }
      val tRecNoSort = t {
        spark.sql(recSql).write.format("noop").mode("overwrite").save()
      }
      // per-level floor: a 12-level recursion with NO join — Project +
      // Filter over the previous level only (ConvertToLocalRelation can
      // fold the whole step)
      val tMin = t {
        spark.sql("""WITH RECURSIVE r (t) AS (
            SELECT CAST(0 AS BIGINT) UNION ALL SELECT t + 1 FROM r
            WHERE t < 11)
          SELECT t FROM r""").write.format("noop").mode("overwrite").save()
      }
      // join-free arithmetic recursion over an inline literal array —
      // the candidate rewrite's shape
      val tArr = t {
        spark.sql("""WITH RECURSIVE r (t, s) AS (
            SELECT CAST(0 AS BIGINT), CAST(1000000000 AS BIGINT)
            UNION ALL
            SELECT t + 1, (s * element_at(array(9L,8L,7L,6L,5L,4L,3L,2L,
              1L,2L,3L,4L), CAST(t + 1 AS INT))) DIV 10
            FROM r WHERE t < 11)
          SELECT t, s FROM r""").write.format("noop").mode("overwrite").save()
      }
      println(f"[reccost] run$i corpus=$tCorpus%.2f recursion=$tRec%.2f " +
        f"recursionNoSort=$tRecNoSort%.2f minimalRec=$tMin%.2f arrRec=$tArr%.2f")
    }
    spark.stop()
  }
}
