package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestSession

class CdcColumnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("applyChanges: highest tx wins, terminal DELETE removes the key, " +
    "non-terminal DELETE is superseded") {
    import spark.implicits._
    val changes = Seq(
      // key 1: insert then update → latest update survives
      (1L, 1L, false, "a"),
      (1L, 2L, false, "b"),
      // key 2: insert then DELETE → gone
      (2L, 1L, false, "x"),
      (2L, 2L, true, "x"),
      // key 3: DELETE then re-insert → re-inserted row survives
      (3L, 1L, true, "dead"),
      (3L, 2L, false, "alive"),
    ).toDF("id", "tx", "del", "v")
    val state = CdcColumns.applyChanges(changes, Seq("id"),
      Seq(col("tx")), col("del"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(state.toSeq == Seq((1L, 2L, "b"), (3L, 2L, "alive")))
  }

  test("time travel: each as-of snapshot equals a local interval lookup " +
    "over the SCD2 history, with deletes absent") {
    val dir = "/root/testdata/sf0.001"
    val hist = CdcColumns.qCdcScd2(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))
    } // (id, tx, qty, amount, is_deleted, valid_to)
    val got = CdcColumns.qCdcTimetravel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val want = (for {
      t <- Seq(3L, 6L)
      (id, tx, qty, amount, del, vto) <- hist
      if tx <= t && vto.forall(_ > t) && !del
    } yield (t, id, tx, qty, amount)).toSet
    assert(got == want, s"asof diff: ${(got -- want).take(3)} / " +
      s"${(want -- got).take(3)}")
    // snapshot well-formedness: one version per key per as-of
    Seq(3L, 6L).foreach { t =>
      val keys = got.toSeq.filter(_._1 == t).map(_._2)
      assert(keys.distinct.size == keys.size, s"asof $t: duplicate key")
    }
    // a key deleted at tx <= 3 with no later live version must be absent
    val deletedAt3 = hist.filter { case (_, tx, _, _, del, vto) =>
      del && tx <= 3 && vto.forall(_ > 3) }.map(_._1).toSet
    assert(deletedAt3.nonEmpty, "fixture has no tombstoned key at t=3")
    assert(got.filter(_._1 == 3L).map(_._2).toSet
      .intersect(deletedAt3).isEmpty, "tombstoned key leaked into snapshot")
  }
}
