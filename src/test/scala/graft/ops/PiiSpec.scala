package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Adversarial boundary cases for the structured PII sweep
  * (`TextAnalysis.piiScan`): matches abutting punctuation, digit runs
  * that OVERLAP a pattern without satisfying its word boundaries, and
  * cross-type near-misses (ID-shaped digits inside phone-shaped runs).
  * The value-level gate for `q_text_pii` is the DuckDB oracle; this spec
  * pins the regex-layer semantics on inputs the planted corpus can't
  * contain.
  */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def scan(s: String): (Long, Long, Long, Long, String) = {
    import spark.implicits._
    val r = TextAnalysis.piiScan(Seq(s).toDF("t"))
      .select("n_email", "n_phone", "n_ip", "n_id", "masked").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("adjacent emails split only by a comma both match") {
    assert(scan("a@b.co,c@d.org") == (2L, 0L, 0L, 0L, "[EMAIL],[EMAIL]"))
  }

  test("email with trailing dot: the dot is a domain char but the match " +
    "backtracks to the last TLD, leaving the final dot unmasked") {
    assert(scan("x@y.com.") == (1L, 0L, 0L, 0L, "[EMAIL]."))
  }

  test("five dotted octets: leftmost IPv4 wins, the overlapping suffix " +
    "candidate is consumed and not double-counted") {
    assert(scan("1.2.3.4.5") == (0L, 0L, 1L, 0L, "[IP].5"))
  }

  test("digit glued to the last octet breaks \\b: v10.0.0.1234 is not an " +
    "IP, a clean 10.0.0.12 next to it is") {
    assert(scan("v10.0.0.1234 and 10.0.0.12") ==
      (0L, 0L, 1L, 0L, "v10.0.0.1234 and [IP]"))
  }

  test("letter glued to an SSN-shaped run breaks the trailing boundary") {
    assert(scan("999-99-9999x") == (0L, 0L, 0L, 0L, "999-99-9999x"))
  }

  test("phone and ID coexist; masking order is type-stable") {
    assert(scan("123-456-7890 and 078-05-1234") ==
      (0L, 1L, 0L, 1L, "[PHONE] and [ID]"))
  }

  test("ID followed by -dddd: hyphen is a boundary so the ID matches; " +
    "the same run is NOT phone-shaped (cross-type near-miss)") {
    assert(scan("078-05-1234-5678") == (0L, 0L, 0L, 1L, "[ID]-5678"))
  }

  test("phone followed by -d: the extension digit stays, no ID " +
    "false-positive inside the phone run") {
    assert(scan("call 555-123-4567-8 now") ==
      (0L, 1L, 0L, 0L, "call [PHONE]-8 now"))
  }

  test("test corpus precondition: documents contain no digits or @, so " +
    "every PII hit comes from the deterministic plant") {
    import org.apache.spark.sql.functions._
    val n = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").rlike("[0-9@]")).count()
    assert(n == 0L)
  }
}
