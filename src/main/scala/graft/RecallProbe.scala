package graft

import org.apache.spark.sql.functions._

/** Diagnostic main (like [[HammingProbe]]): measures the per-anchor top-10
  * recall distribution of each approximate ANN variant against the exact
  * baseline, at one or more scale factors. Used to pick the certification
  * thresholds embedded in the `q_ann_*` self-certifying outputs — the
  * thresholds must hold with margin at every SF the driver checks.
  *
  * Run: `sbt "runMain graft.RecallProbe /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1"`
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val variants: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "lsh" -> (graft.ops.Similarity.qAnnLsh _),
        "ivf" -> (graft.ops.Similarity.qAnnIvf _),
        "sq8" -> (graft.ops.Similarity.qAnnQuantized _),
        "pq" -> (graft.ops.Similarity.qAnnPq _))

    args.foreach { dir =>
      val exact = graft.ops.Similarity.qAnnTopk(spark, dir)
        .select(col("a_id"), col("b_id")).cache()
      val kEff = exact.groupBy("a_id").agg(count("*").as("k_eff"))
      variants.foreach { case (name, fn) =>
        val ap = fn(spark, dir).select(col("a_id"), col("b_id"))
        val hits = ap.join(exact, Seq("a_id", "b_id"))
          .groupBy("a_id").agg(count("*").as("hits"))
        val per = kEff.join(hits, Seq("a_id"), "left")
          .na.fill(0, Seq("hits"))
          .withColumn("recall", col("hits") / col("k_eff"))
        val stats = per.agg(
          count("*").as("n_anchors"),
          min("recall").as("min_r"),
          avg("recall").as("mean_r"),
          expr("percentile(recall, 0.1)").as("p10"),
          sum(when(col("recall") >= 0.5, 1).otherwise(0)).as("ge_050"),
          sum(when(col("recall") >= 0.3, 1).otherwise(0)).as("ge_030"),
          sum(when(col("recall") >= 0.2, 1).otherwise(0)).as("ge_020"),
          sum(when(col("recall") >= 0.1, 1).otherwise(0)).as("ge_010")).collect()(0)
        println(f"$dir%-28s $name%-4s n=${stats.getLong(0)} min=${stats.getDouble(1)}%.2f mean=${stats.getDouble(2)}%.3f p10=${stats.getDouble(3)}%.2f ge050=${stats.getLong(4)} ge030=${stats.getLong(5)} ge020=${stats.getLong(6)} ge010=${stats.getLong(7)}")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
