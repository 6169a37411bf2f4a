package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only diagnostic: cost of the finishing global orderBy vs a
  * single-partition sort on representative result shapes. (r13 finding:
  * in this isolated context rep1sort wins ~0.4 s, but the SAME rewrite
  * applied as an optimizer rule REGRESSED a mixed bench band +1.2 s min
  * — do not retry the root presentation-sort rewrite without re-running
  * the in-bench A/B; see SURVEY round 13.)
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Tables
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // agg-result shape (6 rows) and medium shape (~60k rows)
    val agg = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("n"))
    val med = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
    Seq(("agg6", agg, Seq(col("l_returnflag"), col("l_linestatus"))),
        ("med100k", med, Seq(col("user_id"), col("event_id")))).foreach {
      case (tag, df, keys) =>
        def run(mode: String): Unit = {
          val out = mode match {
            case "orderBy" => df.orderBy(keys: _*)
            case "rep1sort" => df.repartition(1).sortWithinPartitions(keys: _*)
            case "nosort" => df
          }
          out.write.format("noop").mode("overwrite").save()
        }
        Seq("orderBy", "rep1sort", "nosort").foreach { m =>
          run(m) // warm
          val ts = (1 to 5).map(_ => time(run(m))).sorted
          println(f"[sort] $tag $m%-9s min=${ts.head}%.3f med=${ts(2)}%.3f")
        }
    }
    spark.stop()
  }
}
