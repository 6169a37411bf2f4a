package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Completeness property of the grid blocking behind `q_spatial_join`
  * (`RelationalQuality.spatialPairs`): on random point clouds — dense enough
  * that many pairs straddle cell boundaries — the blocked equi-join
  * finds EXACTLY the pairs a naive all-pairs distance scan finds, for
  * several radii. The production oracle proves the same end-to-end on
  * the customer-derived cloud at three SFs; this spec drives random
  * clouds (seeded, reproducible) plus duplicate-coordinate points the
  * corpus derivation cannot produce densely.
  */
class SpatialBlockingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def naive(pts: Seq[(Long, Long, Long)], r: Int) =
    (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts if a < b
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by) if d2 <= r.toLong * r
    } yield (a, b, d2)).toSet

  private def blocked(pts: Seq[(Long, Long, Long)], r: Int) = {
    import spark.implicits._
    RelationalQuality.spatialPairs(pts.toDF("id", "x", "y"), r)
      .select("a", "b", "dist2").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
  }

  test("random clouds: blocked == naive for radii 8, 16, 50") {
    val rnd = new scala.util.Random(7)
    Seq(8, 16, 50).foreach { r =>
      // ~300 points over a 200x200 box: thousands of candidate pairs,
      // many across cell boundaries at every radius
      val pts = (1 to 300).map(i =>
        (i.toLong, rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      val want = naive(pts, r)
      val got = blocked(pts, r)
      assert(want.nonEmpty, s"r=$r: degenerate fixture")
      assert(got == want,
        s"r=$r: missing ${(want -- got).take(5)} extra ${(got -- want).take(5)}")
    }
  }

  test("duplicate coordinates and collinear runs survive (dist2 = 0 and " +
    "axis-aligned exact-radius pairs)") {
    val pts = Seq[(Long, Long, Long)](
      (1L, 10L, 10L), (2L, 10L, 10L), (3L, 10L, 10L), // triple duplicate
      (4L, 26L, 10L), (5L, 10L, 26L), // exactly r from point 1 on each axis
      (6L, 27L, 10L)) // one past r from point 1
    val r = 16
    val want = naive(pts, r)
    val got = blocked(pts, r)
    assert(want.contains((1L, 2L, 0L)) && want.contains((1L, 4L, 256L)) &&
      want.contains((1L, 5L, 256L)))
    assert(!want.exists { case (a, b, _) => Set(a, b) == Set(1L, 6L) },
      "17 on-axis must exceed the radius")
    assert(got == want, s"got $got want $want")
  }
}
