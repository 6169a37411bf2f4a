package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fault-injection companion to [[ClusterSmoke]] (round 15): proves the
  * claim [[graft.ops.Checkpoints]] exists for, by actually KILLING an
  * executor JVM under `local-cluster[2,2,2048]` and consuming a staged
  * frame afterwards:
  *
  *  - reliable mode (`spark.graft.checkpoint.dir` set): the staged
  *    frame's blocks are FILES — the consume after the kill must succeed
  *    (tasks reschedule onto the surviving/relaunched executor and
  *    re-read the checkpoint);
  *  - default mode (`localCheckpoint`): blocks lived in the killed JVM
  *    and are unrecomputable by design — the consume is EXPECTED to fail
  *    (the CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND class). That failure firing
  *    is the PASS condition for the leg: it demonstrates the hazard the
  *    reliable mode removes.
  *
  * A probe main, not a spec: killing JVMs mid-flight is timing-dependent
  * enough to be flaky under a test runner, but as a documented smoke the
  * two legs are decisive. Run:
  * `SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
  *  sbt "runMain graft.FaultSmoke"`; expect `[fault] RESULT ok`.
  */
object FaultSmoke {

  /** PIDs of THIS app's executors only: the backend's command line
    * carries `--app-id <applicationId>`, so another Spark job's (or
    * another user's) executors on the same box can never be matched —
    * killing one of those would both damage the bystander and let this
    * probe pass vacuously. `private[graft]`: [[Probe100xFault]] injects
    * its kill through the SAME implementation, so a pgrep-pattern fix
    * for a future Spark's command line lands in one place.
    */
  private[graft] def executorPids(appId: String): Seq[Long] = {
    val p = new ProcessBuilder("pgrep", "-f",
      s"CoarseGrainedExecutorBackend.*$appId").start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    p.waitFor()
    out.split("\n").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
  }

  private[graft] def killOne(appId: String): Option[Long] = {
    val pids = executorPids(appId)
    pids.headOption.map { pid =>
      new ProcessBuilder("kill", "-9", pid.toString).start().waitFor()
      pid
    }
  }

  /** Wait until the app has at least `n` live executors again (the
    * standalone master relaunches a killed one on the worker).
    */
  private def awaitExecutors(spark: SparkSession, n: Int): Unit = {
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (spark.sparkContext.statusTracker.getExecutorInfos.length - 1 < n
      && System.nanoTime() < deadline) Thread.sleep(500)
  }

  // a staged frame with a real shuffle upstream, 16 partitions spread
  // over both executor JVMs so a kill always loses blocks
  private def staged(s: SparkSession): DataFrame =
    graft.ops.Checkpoints.stage(
      s.range(0, 200000, 1, 16).toDF("id")
        .withColumn("k", col("id") % 97)
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        .repartition(16))

  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fault").toString
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,2048]")
      .appName("graft-fault-smoke")
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep retries short so the default-mode leg fails fast instead of
      // cycling the full 4 attempts against permanently missing blocks
      .config("spark.task.maxFailures", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var ok = true
    try {
      awaitExecutors(spark, 2)

      // ---- leg 1: reliable mode survives the kill ----
      val rel = spark.newSession()
      rel.conf.set(graft.ops.Checkpoints.DirConf, s"$tmp/ckpt")
      val relFrame = staged(rel)
      val before = relFrame.agg(sum("n"), sum("s")).collect().head
      val killed1 = killOne(spark.sparkContext.applicationId)
      if (killed1.isEmpty) {
        // no executor matched: the fault was NOT injected — the leg must
        // not pass vacuously on an intact cluster
        println("[fault] reliable leg FAILED: no executor pid matched " +
          "(pgrep pattern drift?)"); ok = false
      }
      println(s"[fault] reliable leg: killed executor pid=${killed1.getOrElse(-1L)}")
      Thread.sleep(1500)
      val after =
        try Some(relFrame.agg(sum("n"), sum("s")).collect().head)
        catch { case e: Throwable =>
          println(s"[fault] reliable consume FAILED: ${e.toString.take(200)}")
          None
        }
      if (!after.exists(_ == before)) {
        println(s"[fault] reliable leg FAILED: $before vs $after"); ok = false
      } else println(s"[fault] reliable leg ok: totals stable across kill " +
        s"($before)")

      awaitExecutors(spark, 2)

      // ---- leg 2: default localCheckpoint loses blocks (expected) ----
      val loc = spark.newSession() // no checkpoint dir conf
      val locFrame = staged(loc)
      locFrame.count() // materialized on the executors
      val killed2 = killOne(spark.sparkContext.applicationId)
      if (killed2.isEmpty) {
        println("[fault] default leg FAILED: no executor pid matched")
        ok = false
      }
      println(s"[fault] default leg: killed executor pid=${killed2.getOrElse(-1L)}")
      Thread.sleep(1500)
      val failedAsExpected =
        try { locFrame.agg(sum("n")).collect(); false }
        catch { case e: Throwable =>
          println(s"[fault] default consume failed AS EXPECTED: " +
            e.toString.take(160))
          true
        }
      if (!failedAsExpected) {
        // not fatal for the tool's exit code decision — but report it:
        // all consumed blocks happening to live on the survivor is the
        // only benign explanation, and it weakens the demonstration
        println("[fault] default leg WARNING: consume survived the kill " +
          "(blocks may all have lived on the surviving executor)")
      }

      awaitExecutors(spark, 2)

      // ---- leg 3: the CONVERTER survives an executor kill ----
      // The reference's own workload under executor loss: the convert
      // path is parallelize(splits) → flatMap(lazyRows) → v1-committed
      // parquet write — no checkpoints, no shuffle — so recovery rests
      // on (a) task retry re-reading the lost splits from the source
      // bytes (pure recomputation) and (b) the committer discarding the
      // killed attempt's uncommitted files. PASS = zero failed paths,
      // output EXACTLY-ONCE: 1.2M rows, all payload ids distinct (the
      // generator writes id = 0..N-1; a leaked dead-attempt file would
      // surface as duplicate ids).
      val conv = spark.newSession()
      // ~56 MB container / 6 MB splits ≈ 10 byte-range tasks across both
      // executor JVMs, so the kill always lands on in-flight split reads
      conv.conf.set("spark.sql.files.maxPartitionBytes", "6m")
      // (decisive, passed): decisive=false marks the one benign outcome —
      // the kill raced the conversion and landed after completion — which
      // the caller retries once at 3x rows instead of passing with a
      // warning (the r15-adjudged soft vacuous-pass variant). The kill is
      // TRIGGERED from a SparkListener onTaskStart (the 3rd task of the
      // conversion run), not a wall-clock sleep, so on any box speed it
      // fires while split tasks are genuinely in flight.
      def converterLeg(convRows: Int, attempt: Int): (Boolean, Boolean) = {
        val in = s"$tmp/landing$attempt/avro/orders/part-0.avro"
        val out = s"$tmp/out$attempt"
        BenchData.writeCdcAvro(in, convRows)
        @volatile var killedAt = 0L
        @volatile var killerFailed: Option[String] = None
        val killer = new Thread(() => {
          try {
            val k = killOne(spark.sparkContext.applicationId)
            if (k.isEmpty) killerFailed = Some("no executor pid matched")
            else {
              killedAt = System.nanoTime()
              println(s"[fault] converter leg: killed executor pid=${k.get}")
            }
          } catch {
            // an exception here would otherwise die with the thread and
            // the leg would pass with NO fault injected
            case e: Throwable => killerFailed = Some(e.toString.take(160))
          }
        })
        val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
        val started = new java.util.concurrent.atomic.AtomicInteger(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskStart(
              ts: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
            if (started.incrementAndGet() == 3 &&
              fired.compareAndSet(false, true)) killer.start()
        }
        spark.sparkContext.addSparkListener(listener)
        val report =
          try graft.convert.AvroToParquetJob.runOnce(conv,
            s"$tmp/landing$attempt/avro/*/*.avro", out)
          finally spark.sparkContext.removeSparkListener(listener)
        val convDoneAt = System.nanoTime()
        // claim the flag: listener events post asynchronously, and a
        // late-delivered onTaskStart must not start the killer while the
        // read-back below runs — winning this CAS means the killer never
        // started and never can
        if (fired.compareAndSet(false, true)) {
          println("[fault] converter leg: kill never triggered " +
            s"(only ${started.get()} tasks started)")
          return (false, true)
        }
        killer.join()
        killerFailed.foreach { why =>
          println(s"[fault] converter leg FAILED: kill not injected ($why)")
          return (true, false)
        }
        if (killedAt >= convDoneAt) {
          println("[fault] converter leg: kill landed after the " +
            "conversion completed (fast box) — not decisive")
          return (false, true)
        }
        awaitExecutors(spark, 2)
        val outDf = conv.read.parquet(s"$out/orders")
        val nOut = outDf.count()
        val nIds = outDf.select("id").distinct().count()
        if (report.failed.nonEmpty || report.converted.size != 1 ||
          nOut != convRows || nIds != convRows) {
          println(s"[fault] converter leg FAILED: failed=${report.failed} " +
            s"converted=${report.converted.size} rows=$nOut distinct=$nIds " +
            s"(want $convRows/$convRows)")
          (true, false)
        } else {
          println(s"[fault] converter leg ok: $nOut rows, $nIds " +
            "distinct ids (exactly-once across the kill)")
          (true, true)
        }
      }
      val (decisive, passed) = converterLeg(1200000, 1)
      if (!passed) ok = false
      else if (!decisive) {
        // one retry with a 3x fault window; a second non-decisive run is
        // a FAILURE — the leg must not pass without the fault firing
        awaitExecutors(spark, 2)
        val (d2, p2) = converterLeg(3600000, 2)
        if (!p2) ok = false
        else if (!d2) {
          println("[fault] converter leg FAILED: kill landed late twice — " +
            "fault never exercised")
          ok = false
        }
      }
    } finally spark.stop()
    println(if (ok) "[fault] RESULT ok" else "[fault] RESULT FAILED")
    if (!ok) sys.exit(1)
  }
}
