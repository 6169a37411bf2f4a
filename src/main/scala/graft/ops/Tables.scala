package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * `events.parquet` is written with nanosecond timestamps, which Spark's
  * parquet reader rejects by default; we read them as longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
  * exactly what DuckDB's reader does natively, keeping the oracle
  * comparison honest.
  */
object Tables {

  // Relation cache: `spark.read.parquet` pays a driver-side file listing
  // + footer schema read PER CALL, and the bench calls each loader
  // ~4× per query over 286 queries — thousands of redundant small FS
  // round-trips that are pure per-entry floor. The returned DataFrame is
  // immutable, so reusing it is safe; the key re-stats the path on every
  // call and rebuilds the relation whenever the file content, the
  // session, or — for the vintage-sensitive events table — the
  // nanosAsLong conf differs from the cached read. Keyed per-session;
  // NOTE a cached DataFrame strongly references its own SparkSession, so
  // weak keys alone can never evict (the WeakHashMap value→key pitfall)
  // — stopped sessions are purged explicitly on access, which breaks the
  // strong chain and lets GC reclaim both the session and its frames.
  private val frameCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def sessionCache(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, DataFrame] =
    frameCache.synchronized {
      val it = frameCache.keySet.iterator()
      while (it.hasNext) {
        val s = it.next()
        if (s != null && s.sparkContext.isStopped) it.remove()
      }
      var m = frameCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        frameCache.put(spark, m)
      }
      m
    }

  private def fileSig(f: java.io.File): String = {
    // nanosecond mtime where the filesystem provides it — a same-length
    // rewrite inside a coarse (1 s) mtime tick must still change the key
    val mt =
      try java.nio.file.Files.getLastModifiedTime(f.toPath)
        .to(java.util.concurrent.TimeUnit.NANOSECONDS)
      catch { case _: java.io.IOException => f.lastModified }
    s"${f.getName}:$mt:${f.length}"
  }

  /** Content fingerprint for the staleness key: every direct child by
    * name/mtime(ns)/length, recursing one level into child directories so
    * an in-place change inside a partition subdirectory
    * (`folder=a/part-....parquet`) also changes the key. private[ops] so
    * the cache spec can retry writes until the fingerprint observably
    * differs instead of trusting mtime granularity.
    */
  private[ops] def statFingerprint(f: java.io.File): String =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .sortBy(_.getName)
        .map { c =>
          if (c.isDirectory)
            s"${c.getName}/[" +
              Option(c.listFiles()).getOrElse(Array.empty[java.io.File])
                .sortBy(_.getName).map(fileSig).mkString(",") + "]"
          else fileSig(c)
        }
        .mkString(",")
    else fileSig(f)

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // The staleness key stats through java.io.File, which only sees the
    // LOCAL filesystem. For a remote URI (hdfs://, s3a://, ...) the stat
    // reads 0:0 regardless of content and the cache would serve stale
    // relations across file replacements — so any path the local stat
    // cannot see BYPASSES the cache entirely (cluster deployments keep
    // Spark's own FileStatusCache; this cache targets the local bench/
    // test loop where the listing+footer cost was measured).
    val f = new java.io.File(path)
    if (!f.exists()) return spark.read.parquet(path)
    val conf =
      if (name == "events")
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
      else ""
    val key = path + "|" + statFingerprint(f) + "|" + conf
    val cache = sessionCache(spark)
    val cached = cache.get(key)
    if (cached != null) cached
    else {
      // unbounded growth guard: test suites touch hundreds of temp dirs;
      // the cache only ever needs the live handful, so reset crudely
      if (cache.size > 256) cache.clear()
      val df = spark.read.parquet(path)
      cache.put(key, df)
      df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** events with `ts` as a proper TIMESTAMP (µs precision) under either
    * generator vintage: older test sets write raw int64 NANOSECONDS
    * (surfaced as long via `nanosAsLong`, truncated to µs — the same
    * truncation DuckDB's reader applies natively, keeping the oracle
    * honest), newer sets write a native µs timestamp that only needs its
    * type aligned (NTZ → session-TZ timestamp; the session is pinned UTC
    * everywhere, so the instants are identical).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.withColumn("ts", normalizedTs(df.schema("ts").dataType))
  }

  /** The `ts`-normalizing column for a given physical type — shared with
    * the streaming readers, whose source schema comes from the same file.
    */
  private[graft] def normalizedTs(t: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = t match {
    case org.apache.spark.sql.types.LongType =>
      timestamp_micros(expr("ts div 1000"))
    case _ => col("ts").cast(org.apache.spark.sql.types.TimestampType)
  }
}
