package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UrlCanonicalExpr
import graft.SparkTestSession

/** Pins every rule of the [[UrlCanonicalExpr]] contract on adversarial
  * URLs — each case names the rule it exercises.
  */
class UrlCanonSpec extends AnyFunSuite {

  private def canon(s: String): String =
    UrlCanonicalExpr.compute(UTF8String.fromString(s)).toString

  test("case: scheme and host lowercase, path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Docs/A") ===
      "https://www.example.com/Docs/A")
  }

  test("default ports stripped per scheme; non-default ports survive") {
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("https://a.com:8443/x") === "https://a.com:8443/x")
    // :443 is only default for https — http keeps it
    assert(canon("http://a.com:443/x") === "http://a.com:443/x")
  }

  test("fragment dropped, including fragment-only tails and fragments " +
    "after the query") {
    assert(canon("https://a.com/x#top") === "https://a.com/x")
    assert(canon("https://a.com#top") === "https://a.com/")
    assert(canon("https://a.com/x?id=1#frag") === "https://a.com/x?id=1")
  }

  test("tracking params dropped; survivor order preserved (no re-sort)") {
    assert(canon("https://a.com/x?utm_source=f&b=2&a=1&gclid=G") ===
      "https://a.com/x?b=2&a=1")
    assert(canon("https://a.com/x?fbclid=F&msclkid=M&ref=r") ===
      "https://a.com/x")
    // utm_ is a name PREFIX match, not substring: 'myutm_x' survives,
    // and only the name is tested — a VALUE containing utm_ survives
    assert(canon("https://a.com/x?myutm_x=1&k=utm_source") ===
      "https://a.com/x?myutm_x=1&k=utm_source")
  }

  test("empty query segments dropped; fully-stripped query loses the ?") {
    assert(canon("https://a.com/x?&&id=1&&") === "https://a.com/x?id=1")
    assert(canon("https://a.com/x?") === "https://a.com/x")
    assert(canon("https://a.com/x?utm_source=o") === "https://a.com/x")
  }

  test("params without '=' are matched on the whole token") {
    assert(canon("https://a.com/x?ref&keep") === "https://a.com/x?keep")
  }

  test("trailing slashes stripped from non-root path; root and empty " +
    "paths normalize to /") {
    assert(canon("https://a.com/docs/7/") === "https://a.com/docs/7")
    assert(canon("https://a.com/docs/7///") === "https://a.com/docs/7")
    assert(canon("https://a.com/") === "https://a.com/")
    assert(canon("https://a.com") === "https://a.com/")
    assert(canon("https://a.com?id=1") === "https://a.com/?id=1")
  }

  test("non-URL input (no ://) is identity; null stays null via the " +
    "expression's null-safety") {
    assert(canon("not a url") === "not a url")
    assert(canon("mailto:x@y.z") === "mailto:x@y.z")
  }

  test("scheme must be RFC-3986 and anchored at position 0: a relative " +
    "path embedding an absolute URL in its query is identity") {
    // review finding: indexOf("://") parsed "/go?to=https" as the scheme
    // and rewrote the NON-URL input, colliding "/go?to=https://b.com/x/"
    // and "/go?to=https://b.com/x" onto one dedup key
    assert(canon("/go?to=https://b.com/x/") === "/go?to=https://b.com/x/")
    assert(canon("see https://a.com/ for details") ===
      "see https://a.com/ for details")
    assert(canon("ht tp://a.com/") === "ht tp://a.com/")
    assert(canon("1http://a.com/") === "1http://a.com/")
    // valid RFC-3986 schemes beyond http(s) still canonicalize
    assert(canon("FTP://A.com/Dir/") === "ftp://a.com/Dir")
    assert(canon("a+b-c.d://Host/p/") === "a+b-c.d://host/p")
  }

  test("SQL registration: url_canonical is callable from plain SQL") {
    val spark = SparkTestSession.spark
    val out = spark.sql(
      "SELECT url_canonical('HTTPS://A.com:443/p/?utm_source=x&id=1#f') AS c")
      .head().getString(0)
    assert(out === "https://a.com/p?id=1")
  }

  test("idempotence: canon(canon(u)) == canon(u) across the rule matrix") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Docs/A/?utm_source=f&id=1&fbclid=F#x",
      "http://a.com:80/", "https://a.com", "https://a.com/x?&&ref&k=1",
      "not a url")
    for (u <- urls) assert(canon(canon(u)) === canon(u), u)
  }
}
