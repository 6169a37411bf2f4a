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
}
