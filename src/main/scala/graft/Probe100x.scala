package graft

/** Dev-only standalone run of the 100× conversion probe (same shape as
  * the env-gated block in [[Bench]], without the 286-query suite around
  * it) — records sustained conversion rate + split fan-out at a real
  * container size.
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
    val tmp = java.nio.file.Files.createTempDirectory("graft-100x")
    val in = tmp.resolve("landing/avro/bench100x/part-0.avro").toString
    val rows = args.headOption.map(_.toInt).getOrElse(20000000)
    val tw = timeIt(BenchData.writeCdcAvro(in, rows = rows))
    val bytes = new java.io.File(in).length()
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    val splits = graft.avro.AvroCdcReader.planSplits(spark, Seq(in),
      spark.sparkContext.hadoopConfiguration).size
    val t = timeIt {
      graft.convert.AvroToParquetJob.runOnce(spark,
        s"$tmp/landing/avro/*/*.avro", tmp.resolve("out").toString)
      ()
    }
    println(f"[100x] rows=$rows bytes=$bytes gen_s=$tw%.1f " +
      f"convert_s=$t%.2f rows_s=${(rows / t).round} splits=$splits")
    spark.stop()
  }
}
