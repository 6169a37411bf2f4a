package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the FIRST dedup any web corpus runs: the same
  * page is crawled as `HTTPS://WWW.Site.COM/a/?utm_source=feed#top` and
  * `https://www.site.com/a`, and byte-equality dedup misses every such
  * pair. One scan-side codegen kernel normalizes each URL to a canonical
  * key; dedup is then an exact hash `groupBy` on that key — linear, one
  * shuffle, no pairwise anything, which is what makes it the cheapest and
  * first pass in the pipeline at 100 TB.
  *
  * Canonical form (deterministic, documented contract — the unit spec
  * pins every rule, the oracle reproduces the whole mapping analytically):
  *   1. scheme and authority lowercase (ASCII);
  *   2. default port stripped (`:80` for http, `:443` for https; any
  *      other port is IDENTITY — `:8443` survives);
  *   3. fragment dropped;
  *   4. tracking params dropped — name starts with `utm_` or is exactly
  *      `fbclid`/`gclid`/`msclkid`/`ref` — remaining params keep their
  *      original order (no re-sort: `a=1&b=2` vs `b=2&a=1` are NOT
  *      equated); empty segments (`&&`) are dropped; if nothing
  *      survives, the `?` goes too;
  *   5. trailing slashes stripped from a non-root path; an empty path
  *      becomes `/`;
  *   6. percent-encoding and IDN are out of scope (left byte-identical);
  *   7. input without a valid RFC-3986 scheme anchored at position 0
  *      (`ALPHA *(ALPHA/DIGIT/+/-/.) "://"`) is not a URL — returned
  *      unchanged (a relative path whose QUERY embeds an absolute URL
  *      must not be parsed from the embedded `://`); null → null.
  *
  * Caveat on rule 6: the kernel operates on Spark's StringType, whose
  * contract is valid UTF-8. Raw crawl bytes that are NOT valid UTF-8
  * must be carried in a BINARY column (this expression's String
  * round-trip would replace invalid sequences with U+FFFD, merging
  * byte-distinct keys); canonicalize after a validated decode.
  */
case class UrlCanonicalExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"url_canonical requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    UrlCanonicalExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.UrlCanonicalExpr.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalExpr =
    copy(child = newChild)
}

object UrlCanonicalExpr {
  private val TrackingExact = java.util.Set.of("fbclid", "gclid", "msclkid", "ref")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val name = if (eq < 0) param else param.substring(0, eq)
    name.startsWith("utm_") || TrackingExact.contains(name)
  }

  /** True iff s(0, end) is an RFC-3986 scheme: ALPHA *(ALPHA / DIGIT /
    * "+" / "-" / "."). Anchoring the scheme this way (not a bare
    * indexOf("://")) keeps rule 7 honest: a RELATIVE url carrying an
    * absolute url in its query ("/go?to=https://b.com/x/") has no
    * scheme and must pass through unchanged — the old code parsed
    * "/go?to=https" as the scheme and rewrote the non-URL input,
    * colliding distinct documents onto one dedup key.
    */
  private def isScheme(s: String, end: Int): Boolean = {
    if (end <= 0) return false
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    while (i < end) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return false
      i += 1
    }
    true
  }

  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    val schemeEnd = s.indexOf("://")
    if (schemeEnd < 0 || !isScheme(s, schemeEnd)) return u
    val scheme = s.substring(0, schemeEnd).toLowerCase(Locale.ROOT)
    val rest = s.substring(schemeEnd + 3)

    // authority runs to the first of / ? #
    var ae = 0
    while (ae < rest.length && rest.charAt(ae) != '/' &&
      rest.charAt(ae) != '?' && rest.charAt(ae) != '#') ae += 1
    var authority = rest.substring(0, ae).toLowerCase(Locale.ROOT)
    if (scheme == "http" && authority.endsWith(":80"))
      authority = authority.substring(0, authority.length - 3)
    else if (scheme == "https" && authority.endsWith(":443"))
      authority = authority.substring(0, authority.length - 4)

    var tail = rest.substring(ae)
    val hi = tail.indexOf('#')
    if (hi >= 0) tail = tail.substring(0, hi) // rule 3: fragment dropped

    val qi = tail.indexOf('?')
    var path = if (qi < 0) tail else tail.substring(0, qi)
    val query = if (qi < 0) null else tail.substring(qi + 1)

    while (path.length > 1 && path.charAt(path.length - 1) == '/')
      path = path.substring(0, path.length - 1)
    if (path.isEmpty) path = "/"

    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(authority).append(path)
    if (query != null) {
      var first = true
      for (p <- query.split("&", -1)) {
        if (p.nonEmpty && !isTracking(p)) {
          sb.append(if (first) '?' else '&').append(p)
          first = false
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  def urlCanonical(c: Column): Column =
    ColumnBridge.column(UrlCanonicalExpr(ColumnBridge.expression(c)))
}
