package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The invalidation contract of [[SessionFixtures]]: fixtures must
  * rebuild when the source dir's parquet content changes in place (the
  * driver-regenerates-testdata scenario) and must NOT rebuild when
  * nothing changed.
  */
class SessionFixturesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tempTable(): java.io.File = {
    val d = Files.createTempDirectory("graft-fixtures-spec").toFile
    val f = new java.io.File(d, "events.parquet")
    Files.write(f.toPath, Array[Byte](1, 2, 3))
    d
  }

  test("stale/mark: fresh name is stale; marked name is fresh; touching " +
    "a parquet file makes it stale again") {
    val d = tempTable()
    val dir = d.getAbsolutePath
    val name = "spec_fixture_a"
    assert(SessionFixtures.stale(name, spark, dir))
    SessionFixtures.mark(name, spark, dir)
    assert(!SessionFixtures.stale(name, spark, dir))
    // in-place regeneration: same path, new content timestamp/length
    val f = new java.io.File(d, "events.parquet")
    Files.write(f.toPath, Array[Byte](9, 9, 9, 9))
    f.setLastModified(f.lastModified() + 5000)
    assert(SessionFixtures.stale(name, spark, dir),
      "content fingerprint change must invalidate the fixture")
  }

  test("cachedFrame: one compute per unchanged key, recompute after " +
    "content change, previous slot replaced (no unbounded growth)") {
    val d = tempTable()
    val dir = d.getAbsolutePath
    var computes = 0
    def get() = SessionFixtures.cachedFrame("spec_fixture_b", spark, dir) {
      computes += 1
      spark.range(3).toDF()
    }
    get(); get()
    assert(computes == 1, "second call must hit the cache")
    val f = new java.io.File(d, "events.parquet")
    f.setLastModified(f.lastModified() + 5000)
    get()
    assert(computes == 2, "mtime change must recompute")
    get()
    assert(computes == 2, "new key must be cached in turn")
  }

  test("keys differ per dir (two dirs never share a fixture slot mark)") {
    val d1 = tempTable().getAbsolutePath
    val d2 = tempTable().getAbsolutePath
    SessionFixtures.mark("spec_fixture_c", spark, d1)
    assert(SessionFixtures.stale("spec_fixture_c", spark, d2))
  }

  test("contentTag: session-free, stable for same (dir, content), distinct " +
    "across dirs and across content changes — the warehouse-collision key") {
    val d1 = tempTable()
    val d2 = tempTable()
    val t1 = SessionFixtures.contentTag(spark, d1.getAbsolutePath)
    assert(t1.matches("[0-9a-f]{12}"), s"tag must be 12 hex chars: $t1")
    assert(t1 == SessionFixtures.contentTag(spark, d1.getAbsolutePath),
      "same dir+content must tag identically")
    // session-free: another session over the same data shares the layout
    assert(t1 == SessionFixtures.contentTag(spark.newSession(),
      d1.getAbsolutePath))
    assert(t1 != SessionFixtures.contentTag(spark, d2.getAbsolutePath),
      "different dirs (even with equal bytes) must not share a layout path")
    // in-place regeneration changes the tag → the layout is rebuilt at a
    // NEW path instead of clobbering one a concurrent reader may hold
    val f = new java.io.File(d1, "events.parquet")
    Files.write(f.toPath, Array[Byte](7, 7, 7, 7, 7))
    f.setLastModified(f.lastModified() + 5000)
    assert(t1 != SessionFixtures.contentTag(spark, d1.getAbsolutePath),
      "content change must re-tag")
  }
}
