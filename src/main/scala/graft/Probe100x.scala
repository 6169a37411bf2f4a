package graft

/** Dev-only standalone run of the 100× conversion probe (same shape as
  * the env-gated block in [[Bench]], without the 286-query suite around
  * it) — records sustained conversion rate + split fan-out at a real
  * container size.
  *
  * Args: `[rows] [splitSize,...]` — default 20 M rows, split sweep
  * `16m,32m,64m`. The input container is generated ONCE and converted at
  * each split size; per-pass heap-pool peaks (reset before each pass)
  * show whether converter memory couples to split size. With the lazy
  * split reader (round 14) the peaks should be FLAT across the sweep —
  * the strict reader OOM'd a 16 GiB driver at 32m × 32 task slots.
  */
object Probe100x {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("graft-100x-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    import scala.jdk.CollectionConverters._
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
    def resetPeaks(): Unit = { System.gc(); heapPools.foreach(_.resetPeakUsage()) }
    def peakMb: Long = heapPools.map(_.getPeakUsage.getUsed).sum >> 20

    val tmp = java.nio.file.Files.createTempDirectory("graft-100x")
    val in = tmp.resolve("landing/avro/bench100x/part-0.avro").toString
    val rows = args.headOption.map(_.toInt).getOrElse(20000000)
    val sweep = args.drop(1).headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("16m", "32m", "64m"))
    val tw = timeIt(BenchData.writeCdcAvro(in, rows = rows))
    val bytes = new java.io.File(in).length()
    println(f"[100x] rows=$rows bytes=$bytes gen_s=$tw%.1f")
    sweep.foreach { splitSize =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", splitSize)
      val splits = graft.avro.AvroCdcReader.planSplits(spark, Seq(in),
        spark.sparkContext.hadoopConfiguration).size
      resetPeaks()
      val out = tmp.resolve(s"out-$splitSize").toString
      val t = timeIt {
        graft.convert.AvroToParquetJob.runOnce(spark,
          s"$tmp/landing/avro/*/*.avro", out)
        ()
      }
      println(f"[100x] split=$splitSize splits=$splits convert_s=$t%.2f " +
        f"rows_s=${(rows / t).round} peak_heap_mb=$peakMb")
    }
    spark.stop()
  }
}
