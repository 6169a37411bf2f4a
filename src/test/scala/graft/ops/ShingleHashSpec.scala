package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Equivalence contract of the fused shingle-hash kernel
  * ([[graft.functions.WordShingleHashesExpr]]) against the string kernel
  * it replaces in the ppjoin hot path, plus the merge-walk overlap
  * kernel's agreement with `array_intersect`.
  */
class ShingleHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("word_shingle_hashes: same cardinality as word_shingles on every " +
    "document (hashing is injective on the corpus), ascending, distinct") {
    val rows = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        "size(word_shingles(text, 3)) AS n_str",
        "word_shingle_hashes(text, 3) AS h")
      .selectExpr("doc_id", "n_str", "size(h) AS n_hash",
        "h = array_sort(array_distinct(h)) AS canonical")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"doc ${r.getLong(0)}: " +
        s"distinct-shingle count changed under hashing")
      assert(r.getBoolean(3), s"doc ${r.getLong(0)}: not sorted-distinct")
    }
  }

  test("word_shingle_hashes: empty-word split semantics match the string " +
    "kernel (split keeps empties), short docs yield empty arrays") {
    val out = spark.sql(
      """SELECT word_shingle_hashes('a  b a  b', 3) AS h,
                size(word_shingles('a  b a  b', 3)) AS n_str,
                word_shingle_hashes('one two', 3) AS short""")
      .head()
    assert(out.getSeq[Long](0).size == out.getInt(1))
    assert(out.getSeq[Long](2).isEmpty)
  }

  test("sorted_overlap == size(array_intersect) across all document pairs " +
    "of a sample") {
    val d = Tables.documents(spark, dir)
      .selectExpr("doc_id", "word_shingle_hashes(text, 3) AS h")
      .filter(col("doc_id") < 50)
    val a = d.toDF("d1", "h1")
    val b = d.toDF("d2", "h2")
    val bad = a.crossJoin(b).filter(col("d1") < col("d2"))
      .selectExpr("d1", "d2",
        "sorted_overlap(h1, h2) AS fast",
        "size(array_intersect(h1, h2)) AS slow")
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(bad == 0L)
  }
}
