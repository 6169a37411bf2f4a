package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe: run named streaming queries under the bench session shape
  * and print every micro-batch's duration breakdown
  * (`QueryProgressEvent.progress.durationMs` — triggerExecution,
  * queryPlanning, getBatch, latestOffset, addBatch, walCommit,
  * commitOffsets) so the band's fixed cost is attributable: executor
  * work (addBatch) vs driver planning vs checkpoint-log I/O.
  *
  * Usage: `sbt "runMain graft.StreamCost <sfDir> <q1> [q2 ...]"`.
  */
object StreamCost {
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
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        sb.synchronized { sb.append(s"[cost] START ${e.name}\n"); () }
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        sb.synchronized {
          val p = e.progress
          val d = p.durationMs
          sb.append(s"[cost] ${p.name} batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${d}\n")
          p.stateOperators.foreach { so =>
            sb.append(s"[cost]   state: commitMs=${so.commitTimeMs} " +
              s"rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes}\n")
          }
          ()
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    names.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop")
          .mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        sb.synchronized { sb.append(f"[cost] === $n run$i total=$t%.2f s\n"); () }
      }
    }
    // listener events are async — drain before printing
    Thread.sleep(2000)
    println(sb.synchronized(sb.toString))
    spark.stop()
  }
}
