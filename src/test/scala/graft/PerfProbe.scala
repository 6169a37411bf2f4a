package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro-bench: times named queries warm (same session config as
  * graft.Bench) without running the whole suite.
  *
  * Usage: `sbt "Test/runMain graft.PerfProbe <sfDir> <query> [query ...]"`
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm pass
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $n: ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
