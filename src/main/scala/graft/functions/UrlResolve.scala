package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 reference resolution: turn an extracted `href` into an
  * absolute URL against its page's base — the kernel that closes the
  * crawl loop (fetch → parse → extract links → FRONTIER), because real
  * pages link relatively far more often than absolutely.
  *
  * Implements the §5.2.2 transform over the five reference shapes:
  * absolute (`scheme:` present — passes through), network-path
  * (`//host/...` — adopts the base scheme), absolute-path (`/a/b`),
  * relative-path (`a/b`, `../a`, `.` — merged with the base path's
  * directory), and same-document (`?q` keeps the base path; empty or
  * `#frag` returns the base). Dot segments are removed by the §5.2.4
  * algorithm on every path; fragments are DROPPED from the output (the
  * [[TextFunctions.normalizeUrl]] convention — a frontier never fetches
  * a fragment). A base without `scheme://` makes the reference
  * unresolvable: returns the reference as-is (never throws — malformed
  * crawl data is data, not an error).
  *
  * Pure per-row kernel — composes inside the scan's codegen stage with
  * the href extraction regexps and [[MarkupExtractExpr]]'s entity
  * decoding. */
case class UrlResolveExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"url_resolve expects (STRING base, STRING ref), got $l, $r")
    }

  override def nullSafeEval(base: Any, ref: Any): Any =
    UrlResolveImpl.resolve(base.asInstanceOf[UTF8String],
      ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, r) =>
      s"graft.functions.UrlResolveImpl.resolve($b, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "url_resolve"
}

object UrlResolveExpr {
  def apply(base: Column, ref: Column): Column =
    GraftInternals.column(UrlResolveExpr(
      GraftInternals.expression(base), GraftInternals.expression(ref)))
}

object UrlResolveImpl {

  /** See [[UrlResolveExpr]]. */
  def resolve(baseU: UTF8String, refU: UTF8String): UTF8String = {
    val base = baseU.toString
    val ref0 = refU.toString.trim
    // strip the fragment from the reference first (output never has one)
    val hash = ref0.indexOf('#')
    val ref = if (hash >= 0) ref0.substring(0, hash) else ref0
    val out =
      if (hasScheme(ref)) normalizeAbsolute(ref)
      else {
        val (scheme, authority, bPath, bQuery) = splitBase(base)
        if (scheme.isEmpty) ref0 // unresolvable base: pass the ref through
        // network-path reference (§5.2.2): adopt the base scheme, then run
        // the SAME absolute-URL normalization (dot-segment removal, case
        // folding) as the hasScheme branch — otherwise the identical URL
        // spelled "//host/a/../b" vs "http://host/a/../b" would yield two
        // distinct frontier entries
        else if (ref.startsWith("//")) normalizeAbsolute(scheme + ":" + ref)
        else if (ref.isEmpty) scheme + "://" + authority + bPath +
          (if (bQuery.isEmpty) "" else "?" + bQuery)
        else if (ref.startsWith("?")) scheme + "://" + authority + bPath + ref
        else {
          val (rPath, rQuery) = {
            val q = ref.indexOf('?')
            if (q >= 0) (ref.substring(0, q), ref.substring(q))
            else (ref, "")
          }
          val merged =
            if (rPath.startsWith("/")) rPath
            else {
              // merge (§5.2.3): base path up to and incl. its last '/'
              val slash = bPath.lastIndexOf('/')
              (if (slash >= 0) bPath.substring(0, slash + 1) else "/") + rPath
            }
          scheme + "://" + authority + removeDotSegments(merged) + rQuery
        }
      }
    UTF8String.fromString(out)
  }

  private def hasScheme(s: String): Boolean = {
    if (s.isEmpty || !s.charAt(0).isLetter) return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return true
      if (!(c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) return false
      i += 1
    }
    false
  }

  /** §5.2.2 applies remove_dot_segments to the reference's path even
    * when the reference IS absolute — otherwise `http://h/a/../b`
    * written absolutely and `../b` written relatively resolve to two
    * distinct frontier entries for one URL. Non-hierarchical schemes
    * (no `://`) pass through untouched. */
  private def normalizeAbsolute(ref: String): String = {
    val (scheme, authority, path, query) = splitBase(ref)
    if (scheme.isEmpty) ref // mailto:, javascript:, … — no path hierarchy
    else scheme + "://" + authority + removeDotSegments(path) +
      (if (query.isEmpty) "" else "?" + query)
  }

  /** `(scheme, authority, path, query)` of an absolute base; empty
    * scheme marks an unresolvable base. The base's own fragment is
    * irrelevant (dropped). */
  private def splitBase(base: String): (String, String, String, String) = {
    val ss = base.indexOf("://")
    if (ss <= 0) return ("", "", "", "")
    val scheme = base.substring(0, ss)
    if (!hasScheme(scheme + ":")) return ("", "", "", "")
    var i = ss + 3
    val authStart = i
    while (i < base.length && base.charAt(i) != '/' && base.charAt(i) != '?' &&
      base.charAt(i) != '#') i += 1
    val authority = base.substring(authStart, i)
    val pathStart = i
    while (i < base.length && base.charAt(i) != '?' && base.charAt(i) != '#')
      i += 1
    val path = {
      val p = base.substring(pathStart, i)
      if (p.isEmpty) "/" else p
    }
    val query =
      if (i < base.length && base.charAt(i) == '?') {
        val qStart = i + 1
        var j = qStart
        while (j < base.length && base.charAt(j) != '#') j += 1
        base.substring(qStart, j)
      } else ""
    (scheme, authority, path, query)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, output-stack formulation:
    * `.` segments drop, `..` pops the previous segment (never above
    * root), trailing `.`/`..` keep a trailing slash. */
  private[functions] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var trailingSlash = path.endsWith("/")
    val segs = path.split("/", -1)
    for ((s, idx) <- segs.zipWithIndex) s match {
      case "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      // the leading slash's empty segment and the trailing one (covered
      // by trailingSlash) drop; a MID-PATH empty segment ("a//b") is a
      // real segment per RFC 3986 and must survive
      case "" if idx == 0 || idx == segs.length - 1 => ()
      case seg => out += seg
    }
    // a trailing "." or ".." resolves to a directory
    if (segs.nonEmpty && (segs.last == "." || segs.last == ".."))
      trailingSlash = true
    "/" + out.mkString("/") + (if (trailingSlash && out.nonEmpty) "/" else "")
  }
}
