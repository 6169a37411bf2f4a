package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch: run one query and show a few rows. Args: sfDir name */
object TryOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    println(s"[try1] rows=${df.count()}")
    df.show(10, truncate = false)
    spark.stop()
  }
}
