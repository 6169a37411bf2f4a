package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Completeness property of the fuzzy-match q-gram prefix blocking
  * (`Relational.fuzzyPairs`): on adversarial dictionaries with PLANTED
  * ≤3-edit variants — including strings short enough to fall outside the
  * prefix lemma's hypothesis (the sentinel-bucket path) — the blocked
  * pipeline finds EXACTLY the pairs a naive all-pairs Levenshtein scan
  * finds. The production oracle proves the same thing end-to-end on
  * part names at three SFs; this spec drives the corners that corpus
  * cannot contain.
  */
class FuzzyBlockingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def editDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val sub = d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), sub)
    }
    d(a.length)(b.length)
  }

  private def naivePairs(dict: Seq[String]): Set[(String, String, Int)] =
    (for {
      a <- dict; b <- dict if a < b
      d = editDist(a, b) if d <= 3
    } yield (a, b, d)).toSet

  private def blockedPairs(dict: Seq[String]): Set[(String, String, Int)] = {
    import spark.implicits._
    Relational.fuzzyPairs(dict.map((_, 1L)).toDF("p_name", "n"))
      .select("a", "b", "dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
  }

  test("planted <=3-edit variants of long strings are all found") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcdefghij"
    def word(len: Int) = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
    val base = Seq.fill(60)(word(12 + rnd.nextInt(12))).distinct
    // per base string: one variant at each distance 1..3 via random
    // substitutions/insertions/deletions
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val i = rnd.nextInt(math.max(cur.length, 1))
        cur = rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur.updated(i, alpha(rnd.nextInt(alpha.length)))
          case 1 => cur.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + cur.substring(i)
          case _ if cur.length > 1 => cur.substring(0, i) + cur.substring(math.min(i + 1, cur.length))
          case _ => cur
        }
      }
      cur
    }
    val dict = (base ++ base.flatMap(s => (1 to 3).map(mutate(s, _)))).distinct
    val naive = naivePairs(dict)
    val blocked = blockedPairs(dict)
    assert(naive.nonEmpty, "planting must produce close pairs")
    assert(blocked == naive,
      s"missing=${(naive -- blocked).take(5)}, spurious=${(blocked -- naive).take(5)}")
  }

  test("short and repetitive strings (sentinel-bucket path) stay complete") {
    // < q*(tau+1) chars, single-char runs (tiny distinct-gram sets), and
    // mixed short/long pairs that must be caught by the prefix side
    val dict = Seq("a", "ab", "abc", "abcd", "ba", "bc", "aaaa", "aaaaaaa",
      "aaaaaaaaaaaa", "ababab", "bababa", "x", "xy", "xyzzy", "xyzzyx",
      "zzzzzz", "zzzzz", "qqqqqqqqqq", "qqqqqqqqq", "longishstring",
      "longishstrong", "longishstringy").distinct
    val naive = naivePairs(dict)
    val blocked = blockedPairs(dict)
    assert(naive.nonEmpty)
    assert(blocked == naive,
      s"missing=${naive -- blocked}, spurious=${blocked -- naive}")
  }

  test("no false positives survive: every emitted pair is within distance 3") {
    val dict = Seq("alpha bravo", "alpha brave", "charlie delta",
      "charlie delts", "echo foxtrot")
    blockedPairs(dict).foreach { case (a, b, d) =>
      assert(d == editDist(a, b) && d <= 3, s"($a,$b,$d)")
    }
  }
}
