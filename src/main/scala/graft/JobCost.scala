package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: run named queries under the bench session shape and print
  * the Spark JOB count + per-job wall time for each run — separates
  * "many small scheduling floors" (iterative fixpoints, per-level jobs)
  * from "few big jobs" (real compute), which explain() cannot show.
  *
  * Usage: `sbt "runMain graft.JobCost <sfDir> <q1> [q2 ...]"`.
  */
object JobCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new ConcurrentLinkedQueue[(Int, Long)]()
    val stages = new ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        starts.put(e.jobId, e.time); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(e.jobId, e.time)
        jobs.add((e.jobId, e.time - s)); ()
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L)
        if (ms > 200)
          stages.add(s"stage${si.stageId}:${si.numTasks}tasks/${ms}ms:" +
            si.name.takeWhile(_ != '('))
        ()
      }
    })
    names.foreach { n =>
      (1 to 3).foreach { i =>
        jobs.clear(); stages.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop")
          .mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener drain
        import scala.jdk.CollectionConverters._
        val ds = jobs.asScala.toSeq.sortBy(_._1)
        val sum = ds.map(_._2).sum / 1000.0
        println(f"[jobcost] $n run$i wall=$wall%.2f s jobs=${ds.size} " +
          f"jobTimeSum=$sum%.2f s perJob=${ds.map(_._2).mkString(",")} ms")
        val ss = stages.asScala.toSeq
        if (ss.nonEmpty)
          println(s"[jobcost]   slow stages: ${ss.mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
