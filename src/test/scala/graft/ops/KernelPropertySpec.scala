package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{TextFeatures, UrlCanonicalExpr, WordShingleHashesExpr}

/** Property coverage for the round-9 kernels over generated inputs the
  * corpus and the example-based specs don't reach: random unicode-ish
  * text for the shingle-hash kernels (agreement with the string kernel,
  * order/dedup contracts) and random rule-mixing URLs for the
  * canonicalizer (idempotence, output shape).
  */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  // words over a small alphabet (forces shingle repeats), occasional
  // empties (split-keep-empty semantics), non-ASCII codepoints
  private val word: Gen[String] = Gen.frequency(
    6 -> Gen.choose(1, 4).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c'))),
    1 -> Gen.const(""),
    1 -> Gen.oneOf("é", "世", "𝛼x"))
  private val text: Gen[String] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def hashes(s: String, n: Int): Seq[Long] = {
    val a = TextFeatures.wordShingleHashes(UTF8String.fromString(s), n)
    (0 until a.numElements()).map(a.getLong)
  }

  private def windows(s: String, n: Int): Seq[Long] = {
    val a = TextFeatures.wordWindowHashes(UTF8String.fromString(s), n)
    (0 until a.numElements()).map(a.getLong)
  }

  private def shingleStrings(s: String, n: Int): Seq[String] = {
    val ws = s.split(" ", -1)
    if (ws.length < n) Seq.empty
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" "))
  }

  test("word_shingle_hashes ≡ distinct shingle strings under hashing: " +
    "same cardinality, sorted ascending, distinct (random text)") {
    forAll(text) { s =>
      for (n <- Seq(2, 3)) {
        val h = hashes(s, n)
        assert(h.size == shingleStrings(s, n).distinct.size, s"[$s] n=$n")
        assert(h == h.distinct.sorted, s"[$s] n=$n not sorted-distinct")
      }
    }
  }

  test("word_window_hashes: one hash per window position, equal strings " +
    "⇔ equal hashes position-wise (random text)") {
    forAll(text) { s =>
      for (n <- Seq(2, 3)) {
        val w = windows(s, n)
        val str = shingleStrings(s, n)
        assert(w.size == str.size, s"[$s] n=$n window count")
        // windows with equal content must collide; distinct contents
        // must not (would break occurrence counts either way)
        val byStr = str.zip(w).groupBy(_._1).values
        assert(byStr.forall(g => g.map(_._2).distinct.size == 1), s"[$s]")
        assert(str.distinct.size == w.distinct.size, s"[$s] n=$n")
        // the distinct window set IS the shingle-hash set
        assert(w.distinct.sorted == hashes(s, n), s"[$s] n=$n")
      }
    }
  }

  test("char_gram_hashes ≡ distinct char-gram strings under hashing: " +
    "same cardinality, sorted-distinct (random text)") {
    forAll(text) { s =>
      for (n <- Seq(3, 5)) {
        val a = TextFeatures.charGramHashes(UTF8String.fromString(s), n)
        val h = (0 until a.numElements()).map(a.getLong)
        val strGrams =
          if (s.length < n) Seq.empty
          else (0 to s.length - n).map(i => s.substring(i, i + n))
        assert(h.size == strGrams.distinct.size, s"[$s] n=$n")
        assert(h == h.distinct.sorted, s"[$s] n=$n")
      }
    }
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTPS", "HtTp")
    host <- Gen.oneOf("a.com", "A.Com", "WWW.Example.COM", "x-y.z.io")
    port <- Gen.oneOf("", ":80", ":443", ":8443")
    path <- Gen.oneOf("", "/", "/A/b", "/docs/7/", "/x//")
    q <- Gen.oneOf("", "?", "?id=1", "?utm_source=f", "?a=1&utm_x=2&b=3",
      "?&&ref&k=1", "?k=utm_source")
    frag <- Gen.oneOf("", "#top", "#a?b")
  } yield s"$scheme://$host$port$path$q$frag"

  private def canon(s: String): String =
    UrlCanonicalExpr.compute(UTF8String.fromString(s)).toString

  test("url_canonical: idempotent, lowercase authority, no fragment, no " +
    "default port, no tracking params, no trailing slash (random URLs)") {
    forAll(urlGen) { u =>
      val c = canon(u)
      assert(canon(c) == c, s"not idempotent: $u -> $c -> ${canon(c)}")
      val authority = c.substring(c.indexOf("://") + 3)
        .takeWhile(ch => ch != '/' && ch != '?')
      assert(authority == authority.toLowerCase, s"$u -> $c")
      assert(!c.contains("#"), s"fragment survived: $u -> $c")
      assert(!c.endsWith(":80/") && !c.contains(":80/") || c.startsWith("https"),
        s"default port survived: $u -> $c")
      assert(!c.contains("utm_source=f") && !c.contains("&ref") &&
        !c.contains("?ref"), s"tracking param survived: $u -> $c")
      val pathPart = c.substring(c.indexOf("://") + 3)
        .dropWhile(ch => ch != '/' && ch != '?').takeWhile(_ != '?')
      assert(pathPart == "/" || !pathPart.endsWith("/"),
        s"trailing slash survived: $u -> $c")
    }
  }

  test("packGroup: capacity, contiguity, and greediness hold on random " +
    "length streams including oversize docs") {
    val lens = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(8 -> Gen.choose(1L, 9L),
        1 -> Gen.choose(11L, 40L))))
    forAll(lens, n = 200) { ls =>
      val out = TextSampling.packGroup("s",
        ls.zipWithIndex.map { case (l, i) => ("s", i.toLong, l) }.iterator,
        window = 10L).toSeq
      out.groupBy(_._4).foreach { case (_, docs) =>
        assert(docs.map(_._3).sum <= 10 || docs.size == 1)
        var expect = 0L
        docs.sortBy(_._2).foreach { d =>
          assert(d._5 == expect); expect += d._3
        }
      }
      // greedy: first doc of window k+1 would not have fit in window k
      val bySeq = out.groupBy(_._4).toSeq.sortBy(_._1)
      bySeq.sliding(2).foreach {
        case Seq((_, prev), (_, next)) =>
          assert(prev.map(_._3).sum + next.minBy(_._2)._3 > 10)
        case _ => ()
      }
    }
  }
}
