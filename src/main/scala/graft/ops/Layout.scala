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

  /** Rank resolution: 1024 quantile buckets per dimension — far finer
    * than row-group granularity (the pruning unit), at a sketch size the
    * driver holds trivially.
    */
  private val ResBits = 10

  /** Monotone double image of an orderable column, so one quantile/bucket
    * path serves numerics, dates, and timestamps (rank is preserved under
    * any strictly monotone map).
    */
  private def rankable(df: DataFrame, colName: String): Column =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.DateType =>
        unix_date(col(colName)).cast("double")
      case org.apache.spark.sql.types.TimestampType =>
        unix_micros(col(colName)).cast("double")
      case _: org.apache.spark.sql.types.NumericType =>
        col(colName).cast("double")
      case t => throw new IllegalArgumentException(
        s"z-order: unsupported column type $t for $colName")
    }

  /** Rank-normalize a column to [0, 2^bits) fixed-point — makes the
    * interleave robust to skewed value distributions (raw values would
    * starve one dimension of bits).
    *
    * Scale path: ONE distributed approx-quantile pass (Greenwald-Khanna
    * sketch, merged per-partition — no sort, no shuffle) computes 2^10−1
    * boundary values on the driver; each row then maps to its bucket by
    * binary search against that array riding in codegen as a reference
    * object ([[graft.functions.Bucketize]]). The previous spelling — a
    * no-partition `Window.orderBy` percent_rank — pushed the ENTIRE
    * dataset through a single sort task, the one place this operator
    * broke at 100×. Bucket indices are scaled up to the 2^bits z-domain
    * so [[zValue]]'s interleave contract is unchanged.
    */
  def rankBucket(df: DataFrame, colName: String, bits: Int = 16): Column = {
    val resBits = math.min(bits, ResBits)
    val nb = 1 << resBits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val proj = df.select(rankable(df, colName).as("__rk"))
    val bounds = proj.stat.approxQuantile("__rk", probs, 1.0 / (4 * nb))
    val bucket = graft.functions.Bucketize
      .bucketOfCol(rankable(df, colName), bounds)
    (bucket * lit(1L << (bits - resBits))).cast("long")
  }

  /** Z-order `df` by two columns into `numFiles` z-range buckets at
    * `path`. Files stay disjoint in z-space (each bucket = one tight
    * z-range = tight min/max on BOTH source columns); the within-bucket
    * sort tightens row groups further.
    *
    * Bucket boundaries come from a SECOND approx-quantile pass over the
    * z-value, not `repartitionByRange`: range partitioning draws its
    * boundaries from an RDD-id-seeded random sample, so the produced
    * layout drifts from run to run (and at 100 TB the sampling pass is
    * an extra scan you'd replace with a histogram anyway). The quantile
    * boundaries are deterministic for a given dataset; `partitionBy` on
    * the bucket id then guarantees every physical file holds exactly one
    * z-range even when the shuffle hashes two bucket ids into one task.
    */
  /** The ORACLED demonstration of Morton locality ([[zorderWrite]]'s
    * pruning argument, made hash-checkable): interleave two
    * uniform-domain key columns at [[ZqBits]] bits, cut the z-range into
    * [[ZqBuckets]] equal buckets (= the physical files [[zorderWrite]]
    * would produce), and report each bucket's row count and min/max
    * extent in BOTH source dimensions plus the extent-to-domain ratio.
    * The ratios land near 1/8 in EACH dimension (64 buckets = top 3
    * z-levels per axis): the two-dimensional tightness that makes a
    * selective filter on EITHER column skip ~7/8 of a 100 TB table's
    * row groups, which a single-column sort only achieves for its own
    * column. Everything is integer bit arithmetic in both engines — the
    * one operator family where cross-engine exactness is free — and the
    * ratio is a final divide of exact integers.
    */
  private val ZqBits = 10
  private val ZqBuckets = 64

  def qLayoutZorder(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val dom = 1L << ZqBits
    val l = Tables.lineitem(spark, dir).select(
      (col("l_partkey") % dom).as("a"), (col("l_suppkey") % dom).as("b"))
    l.withColumn("z", zValue(col("a"), col("b"), ZqBits))
      .withColumn("bucket",
        shiftright(col("z"), 2 * ZqBits - 6).cast("long")) // 2^6 buckets
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("a")).as("a_min"), max(col("a")).as("a_max"),
        min(col("b")).as("b_min"), max(col("b")).as("b_max"))
      .withColumn("a_extent",
        round((col("a_max") - col("a_min") + 1).cast("double") / dom, 6))
      .withColumn("b_extent",
        round((col("b_max") - col("b_min") + 1).cast("double") / dom, 6))
      .orderBy(col("bucket"))
  }

  val qLayoutZorderOracle: String = {
    val terms = (0 until ZqBits).map { i =>
      s"(((a >> $i) & 1)::BIGINT << ${2 * i}) + " +
        s"(((b >> $i) & 1)::BIGINT << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH k AS (SELECT l_partkey % ${1L << ZqBits} AS a,
        l_suppkey % ${1L << ZqBits} AS b FROM lineitem),
      z AS (SELECT a, b, ($terms) AS zv FROM k),
      g AS (SELECT zv >> ${2 * ZqBits - 6} AS bucket, count(*) AS n,
          min(a) a_min, max(a) a_max, min(b) b_min, max(b) b_max
        FROM z GROUP BY 1)
      SELECT bucket, n, a_min, a_max, b_min, b_max,
        round((a_max - a_min + 1) / ${(1L << ZqBits)}.0, 6) AS a_extent,
        round((b_max - b_min + 1) / ${(1L << ZqBits)}.0, 6) AS b_extent
      FROM g ORDER BY bucket"""
  }

  def zorderWrite(
      df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int, bits: Int = 16): Unit = {
    val z = zValue(rankBucket(df, colA, bits), rankBucket(df, colB, bits),
      bits)
    val withZ = df.withColumn("__z", z)
    val probs = (1 until numFiles).map(_.toDouble / numFiles).toArray
    val zBounds = withZ.select(col("__z").cast("double").as("__z"))
      .stat.approxQuantile("__z", probs, 1.0 / (8 * numFiles))
    withZ
      .withColumn("__zfile", graft.functions.Bucketize
        .bucketOfCol(col("__z").cast("double"), zBounds).cast("int"))
      .repartition(numFiles, col("__zfile"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").partitionBy("__zfile").parquet(path)
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q_layout_zorder" -> (qLayoutZorder _))

  val oracles: Map[String, String] =
    Map("q_layout_zorder" -> qLayoutZorderOracle)
}
