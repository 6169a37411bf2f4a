package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the relation-cache semantics of [[Tables.table]] (round 13): the
  * cache exists to kill the per-call listing + footer read (~0.18 s/query
  * measured across the bench), and these are exactly the staleness edges
  * that would corrupt results if the key ever regressed.
  */
class TablesCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Re-run `write` until the table's fingerprint observably differs from
    * `before` — robust to coarse filesystem mtime granularity instead of
    * assuming a fixed sleep is enough.
    */
  private def writeUntilFingerprintChanges(
      dir: String, name: String, before: String)(write: => Unit): Unit = {
    val f = new java.io.File(s"$dir/$name.parquet")
    var tries = 0
    write
    while (Tables.statFingerprint(f) == before && tries < 50) {
      Thread.sleep(20)
      write
      tries += 1
    }
    assert(Tables.statFingerprint(f) != before,
      "test setup: could not produce a fingerprint-distinct rewrite")
  }

  test("same (session, path, content): the relation is REUSED; a replaced " +
    "file rebuilds it and reads the new content") {
    val dir = Files.createTempDirectory("graft-tcache").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
    val d1 = Tables.table(spark, dir, "t")
    val d2 = Tables.table(spark, dir, "t")
    assert(d1 eq d2, "unchanged file must return the cached DataFrame object")
    assert(d1.count() == 2)
    val before = Tables.statFingerprint(new java.io.File(s"$dir/t.parquet"))
    writeUntilFingerprintChanges(dir, "t", before) {
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
    }
    val d3 = Tables.table(spark, dir, "t")
    assert(!(d3 eq d1), "replaced file must rebuild the relation")
    assert(d3.count() == 3, "the rebuilt relation must see the new rows")
  }

  test("events: flipping nanosAsLong is part of the key — the cached " +
    "relation never leaks a schema read under the other conf") {
    val dir = Files.createTempDirectory("graft-tcache-ev").toString
    import spark.implicits._
    Seq((1L, 1704067200000000L)).toDF("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      val a = Tables.table(spark, dir, "events")
      spark.conf.set(key, "true")
      val b = Tables.table(spark, dir, "events")
      assert(!(a eq b), "a conf flip must key a fresh relation for events")
      spark.conf.set(key, "false")
      val c = Tables.table(spark, dir, "events")
      assert(c eq a, "flipping back must hit the original cache entry")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("directory-shaped tables fingerprint their children: appending a " +
    "part file rebuilds the relation") {
    val dir = Files.createTempDirectory("graft-tcache-dir").toString
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
    val d1 = Tables.table(spark, dir, "t")
    assert(d1.count() == 1)
    val before = Tables.statFingerprint(new java.io.File(s"$dir/t.parquet"))
    writeUntilFingerprintChanges(dir, "t", before) {
      Seq((2L, "y")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(s"$dir/t.parquet")
    }
    val d2 = Tables.table(spark, dir, "t")
    assert(!(d2 eq d1), "an appended part file must rebuild the relation")
    assert(d2.select(col("id")).count() == 2)
  }

  test("nested partition subdirectories are fingerprinted: an in-place " +
    "change one level down rebuilds the relation") {
    val dir = Files.createTempDirectory("graft-tcache-part").toString
    import spark.implicits._
    Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(s"$dir/t.parquet")
    val d1 = Tables.table(spark, dir, "t")
    assert(d1.count() == 2)
    val before = Tables.statFingerprint(new java.io.File(s"$dir/t.parquet"))
    writeUntilFingerprintChanges(dir, "t", before) {
      // rewrite ONE partition subdirectory in place: the top-level children
      // (p=p1, p=p2 dirs) keep their names; only nested part files change
      Seq((1L, "x2"), (3L, "z")).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet/p=p1")
    }
    val d2 = Tables.table(spark, dir, "t")
    assert(!(d2 eq d1),
      "a changed nested partition subdirectory must rebuild the relation")
    assert(d2.count() == 3, "the rebuilt relation must see the nested change")
  }
}
