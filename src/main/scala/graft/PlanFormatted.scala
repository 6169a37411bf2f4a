package graft

import java.nio.file.{Files, Paths}

/** Dev utility for the optimization rounds' plan evidence: writes the
  * `explain("formatted")` output of each named query to
  * `<outDir>/<query>_<suffix>.txt` — the `plans/r{N}/<q>_{before,after}.txt`
  * artifacts the optimization brief requires. Runs under a bench-shaped
  * session (AQE on, parallelismFirst=false, 2m advisory) so the dumped
  * plan is the one the bench actually executes, at sf0.001 unless
  * SPARK_GRAFT_SF_DIR overrides.
  *
  * Usage: `sbt "runMain graft.PlanFormatted <outDir> <suffix> <q1> [q2 ...]"`
  */
object PlanFormatted {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val extraConf =
      EnvConf.parseExtraConf(sys.env.get("SPARK_GRAFT_EXTRA_CONF"), "planfmt")
    val builder0 = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .withExtensions(new graft.plans.GraftExtensions)
    val spark = extraConf.foldLeft(builder0) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val txt =
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"<failed: ${e.getMessage}>" }
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), txt)
      println(s"[planfmt] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
