package graft

import org.apache.spark.sql.SparkSession

/** Dev-only diagnostic: decompose the per-entry floor of cheap queries —
  * construction vs analysis/optimization vs execution, with per-stage
  * task counts and walls. (r13 finding: execution dominates at ~300 ms
  * even for trivial queries — 3-5 single-task AQE QueryStage jobs; the
  * relation-loading share of construction was cured by the Tables cache.)
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_stats_ttest", "q_dedup_exact", "q01_pricing_summary",
        "q_text_tokens", "q_events_tumbling")
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
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          val ms = for {
            s <- si.submissionTime; e <- si.completionTime
          } yield e - s
          stages.add(s"stage${si.stageId}(tasks=${si.numTasks}," +
            s"wall=${ms.getOrElse(-1L)}ms,${si.name.takeWhile(_ != ' ')})")
        }
      })
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val phases = df.queryExecution.tracker.phases
          .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
          .mkString(" ")
        println(f"[floor] $n run$i construct=${(t1 - t0) / 1e6}%.0fms " +
          f"plan=${(t2 - t1) / 1e6}%.0fms exec=${(t3 - t2) / 1e6}%.0fms " +
          f"total=${(t3 - t0) / 1e6}%.0fms  $phases")
        if (i == 3) {
          Thread.sleep(200)
          import scala.jdk.CollectionConverters._
          println(s"[floor]   stages: ${stages.asScala.mkString(" ")}")
        }
        stages.clear()
      }
    }
    spark.stop()
  }
}
