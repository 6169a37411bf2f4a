package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: hamming-distance distribution of the TRUE
  * near-dup pairs (J >= 0.8, from the verified minhash path) under the
  * current simhash signature — tells us what recall envelope a blocking
  * scheme must guarantee on this corpus.
  */
object HammingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("hamming-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.ops.Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ", -1)) >= 3)
      .select(col("doc_id"),
        graft.ops.Dedup.wordShingles(col("text")).as("sh"))
    val sigs = docs.select(col("doc_id"),
      graft.functions.Sketches.simhash64(col("sh")).as("simhash"))

    val pairs = graft.ops.Dedup.minhashPairs(spark, dir)
      .select(col("d1"), col("d2"))
    val withH = pairs
      .join(sigs.select(col("doc_id").as("d1"), col("simhash").as("s1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("simhash").as("s2")), "d2")
      .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
      // per-16-bit-word hamming, and the min across the 4 words: the
      // quantity a (word, <=k flips) blocking scheme actually needs
      .withColumn("min_word_h", least((0 until 4).map { w =>
        expr(s"bit_count((shiftright(s1, ${16 * w}) ^ shiftright(s2, ${16 * w})) & 65535)")
      }: _*))
    val agg = withH.agg(
      count(lit(1)).as("n_pairs"),
      max(col("hamming")).as("max_h"),
      expr("percentile(hamming, 0.5)").as("med_h"),
      max(col("min_word_h")).as("max_min_word_h")).collect()(0)
    println(s"[$dir] pairs=${agg.get(0)} max_hamming=${agg.get(1)} " +
      s"median=${agg.get(2)} max_min_word_hamming=${agg.get(3)}")
    spark.stop()
  }
}
