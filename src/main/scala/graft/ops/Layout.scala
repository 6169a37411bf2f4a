package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * Parquet keeps min/max statistics per row group and Spark pushes
  * comparison predicates into the reader, so row groups whose stat range
  * excludes the predicate never decompress. A plain sort clusters ONE
  * column; a Z-ORDER (Morton) sort interleaves the bits of several
  * columns, so row groups stay tight in every interleaved dimension at
  * once — selective filters on ANY of them skip most of a 100 TB table.
  * This is the same layout lever as Delta's `OPTIMIZE ZORDER BY`,
  * expressed with plain Spark: rank-normalize → interleave bits →
  * range-repartition + sort by the z-value → write.
  */
object Layout {

  /** Morton interleave of two pre-normalized integer columns (each in
    * [0, 2^bits)): bit i of `a` lands at even position 2i, bit i of `b`
    * at odd position 2i+1. Pure bit arithmetic — codegen'd, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Rank-normalize a column to [0, 2^bits) fixed-point via a global
    * percent_rank — makes the interleave robust to skewed value
    * distributions (raw values would starve one dimension of bits).
    * One sort-shuffle; at 100 TB swap in an approx-quantile histogram
    * lookup for the same effect without the global sort.
    */
  def rankBucket(c: Column, bits: Int = 16): Column = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(c)
    least(floor(percent_rank().over(w) * (1L << bits)),
      lit((1L << bits) - 1)).cast("long")
  }

  /** Z-order `df` by two columns into `numFiles` files at `path`.
    * Range-repartition on the z-value keeps files disjoint in z-space
    * (each file = one tight z-range = tight min/max on BOTH source
    * columns); the within-partition sort tightens row groups further.
    */
  def zorderWrite(
      df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int, bits: Int = 16): Unit = {
    val z = zValue(rankBucket(col(colA), bits), rankBucket(col(colB), bits),
      bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
