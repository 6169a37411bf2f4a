package graft

/** [[Probe100x]] × [[FaultSmoke]] (round 16): the 20M-row / ~936 MB
  * single-container conversion probe run under `local-cluster` (real
  * executor JVMs with a FIXED memory cap) with an executor `kill -9`
  * injected mid-conversion — proving the exactly-once committer result
  * at the probe's memory envelope, not just at FaultSmoke's 1.2M rows.
  *
  * The kill triggers from a SparkListener once the conversion stage has
  * genuinely started tasks (the FaultSmoke leg-3 discipline — never a
  * wall-clock sleep), so the fault always preempts in-flight byte-range
  * split reads. PASS = the surviving/relaunched executor re-runs the
  * lost splits from the source bytes, the v1 committer discards the dead
  * attempt's files, and the output is EXACTLY 20M rows with 20M distinct
  * payload ids.
  *
  * Memory envelope evidence: the executor JVMs are capped at 4 GiB each
  * (`local-cluster[2,6,4096]`, 12 task slots), so completion alone bounds
  * per-executor heap; executor JVM heap peaks are additionally sampled
  * from heartbeat ExecutorMetrics updates, and the driver's own heap-pool
  * peak is read from MemoryPoolMXBeans (the [[Probe100x]] readout).
  *
  * Run: `SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
  *   sbt "runMain graft.Probe100xFault"`; expect `[100xfault] RESULT ok`.
  * Args: `[rows]` (default 20M).
  */
object Probe100xFault {

  private def executorPids(appId: String): Seq[Long] = {
    val p = new ProcessBuilder("pgrep", "-f",
      s"CoarseGrainedExecutorBackend.*$appId").start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    p.waitFor()
    out.split("\n").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(20000000)
    val tmp = java.nio.file.Files.createTempDirectory("graft-100xfault")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local-cluster[2,6,4096]")
      .appName("graft-100x-fault")
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.sql.shuffle.partitions", "12")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the kill is permanent block loss for in-flight attempts; retries
      // must re-read source bytes, not cycle against a gone executor
      .config("spark.task.maxFailures", "4")
      // probe regime: containers far exceed the split size (Bench's 100×
      // block pins 16m for artifact comparability — same here)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    import scala.jdk.CollectionConverters._
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
    heapPools.foreach(_.resetPeakUsage())
    var ok = true
    try {
      // wait for both executors
      val deadline = System.nanoTime() + 90L * 1000000000L
      while (spark.sparkContext.statusTracker.getExecutorInfos.length - 1 < 2
        && System.nanoTime() < deadline) Thread.sleep(500)

      val in = tmp.resolve("landing/avro/orders/part-0.avro").toString
      val genS = timeIt(BenchData.writeCdcAvro(in, rows))
      val bytes = new java.io.File(in).length()
      val splits = graft.avro.AvroCdcReader.planSplits(spark, Seq(in),
        spark.sparkContext.hadoopConfiguration).size
      println(f"[100xfault] rows=$rows bytes=$bytes splits=$splits " +
        f"gen_s=$genS%.1f")

      @volatile var killedPid = -1L
      @volatile var killerFailed: Option[String] = None
      val killer = new Thread(() => {
        try {
          val pids = executorPids(spark.sparkContext.applicationId)
          pids.headOption match {
            case None => killerFailed = Some("no executor pid matched")
            case Some(pid) =>
              new ProcessBuilder("kill", "-9", pid.toString).start().waitFor()
              killedPid = pid
              println(s"[100xfault] killed executor pid=$pid mid-conversion")
          }
        } catch { case e: Throwable =>
          killerFailed = Some(e.toString.take(160))
        }
      })
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      val started = new java.util.concurrent.atomic.AtomicInteger(0)
      @volatile var peakExecHeapMb = -1L
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskStart(
            ts: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
          // fire well inside the split stage: ~56 splits at 16m, so the
          // 12th start leaves dozens of in-flight/pending split reads to
          // reschedule across the kill
          if (started.incrementAndGet() == 12 &&
            fired.compareAndSet(false, true)) killer.start()
        override def onExecutorMetricsUpdate(
            u: org.apache.spark.scheduler.SparkListenerExecutorMetricsUpdate)
            : Unit =
          u.executorUpdates.values.foreach { m =>
            val hb = m.getMetricValue("JVMHeapMemory") >> 20
            if (hb > peakExecHeapMb) peakExecHeapMb = hb
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val convS = try timeIt {
        graft.convert.AvroToParquetJob.runOnce(spark,
          s"$tmp/landing/avro/*/*.avro", tmp.resolve("out").toString)
        ()
      } finally spark.sparkContext.removeSparkListener(listener)
      if (fired.compareAndSet(false, true)) {
        println(s"[100xfault] FAILED: kill never triggered " +
          s"(only ${started.get()} tasks started)")
        ok = false
      } else {
        killer.join()
        killerFailed.foreach { why =>
          println(s"[100xfault] FAILED: kill not injected ($why)"); ok = false
        }
      }
      val out = spark.read.parquet(tmp.resolve("out/orders").toString)
      val nOut = out.count()
      val nIds = out.select("id").distinct().count()
      val driverPeakMb = heapPools.map(_.getPeakUsage.getUsed).sum >> 20
      println(f"[100xfault] convert_s=$convS%.1f rows_s=${(rows / convS).round} " +
        f"rows=$nOut distinct_ids=$nIds driver_peak_heap_mb=$driverPeakMb " +
        f"executor_peak_heap_mb=$peakExecHeapMb executor_cap_mb=4096")
      if (nOut != rows || nIds != rows) {
        println(s"[100xfault] FAILED: want $rows rows/$rows distinct ids")
        ok = false
      }
    } finally spark.stop()
    println(if (ok) "[100xfault] RESULT ok" else "[100xfault] RESULT FAILED")
    if (!ok) sys.exit(1)
  }
}
