package org.apache.spark.sql.graft

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as one-pass codegen expressions (round-20
  * optimization). The builtin-composition canonicalizer
  * ([[graft.text.Url]], kept as the `_builtin` spec reference and the
  * oracle-SQL generator) folds ~110 sequential `replace` passes for the
  * unreserved percent-decode (each materializing a fresh UTF8String),
  * 2 dangling-escape regex passes — ALL of that twice per URL (path +
  * query) — plus up to 48 dot-segment regex passes and 8
  * extraction/lowering expressions. These expressions compute the same
  * values with ONE character scan for the decode and precompiled
  * matchers elsewhere.
  *
  * Bug-for-bug parity with the builtin chain (UrlCanonSpec pins it by
  * fuzzing adversarial %-runs and by whole-corpus equality):
  *  - the single-pass decoder IS the fold's fixpoint semantics: the
  *    dangling-escape sentinel machinery exists precisely to make the
  *    sequential fold behave positionally — every '%' either starts a
  *    complete 2-hex escape (decoded if the octet is unreserved,
  *    hex-case-uppercased if reserved, kept verbatim otherwise) or is
  *    emitted verbatim and never participates in an escape; decoded
  *    output chars are unreserved (never '%'), so no escape can form
  *    across a decode boundary;
  *  - extraction regexes, the dot-segment pass structure (same 6
  *    patterns, same [[graft.text.Url.DotSegPasses]] bound, early exit
  *    on fixpoint — a no-op pass stays a no-op), lower() via
  *    UTF8String.toLowerCase, and the query-param sort in UTF8String
  *    (unsigned byte) order are all replicated verbatim;
  *  - null → null (every builtin in the chain is null-intolerant and
  *    the final `concat` propagates the null scheme).
  */
object UrlCanonCore {

  // the SAME extraction regexes graft.text.Url applies via
  // regexp_extract; group(1) with "" on no-match (RegExpExtract parity)
  private val SchemeRe = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://")
  private val HostRe = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)")
  private val PathRe = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)")
  private val QueryRe = Pattern.compile("^[^#]*?\\?([^#]*)")

  private def extract(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** lower() parity: UTF8String.toLowerCase (ASCII fast path, locale
    * fallback) — NOT java String.toLowerCase. */
  private def lower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  private def isHexChar(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c <= 'F') c - 'A' + 10
    else c - 'a' + 10

  /** RFC 3986 unreserved: ALPHA / DIGIT / - . _ ~ (the PctDecode set). */
  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** The HexCaseNorm reserved set: escapes of these octets get their
    * hex uppercased but stay encoded. */
  private val Reserved: Array[Boolean] = {
    val a = new Array[Boolean](128)
    ":/?#[]@!$&'()*+,;=".foreach(c => a(c.toInt) = true)
    a
  }

  /** Single-pass [[graft.text.Url.pctDecodeUnreserved]]. */
  def pctDecodeUnreserved(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n &&
          isHexChar(s.charAt(i + 1)) && isHexChar(s.charAt(i + 2))) {
        val h1 = s.charAt(i + 1)
        val h2 = s.charAt(i + 2)
        val v = hexVal(h1) * 16 + hexVal(h2)
        if (isUnreserved(v)) sb.append(v.toChar)
        else if (v < 128 && Reserved(v))
          sb.append('%').append(Character.toUpperCase(h1))
            .append(Character.toUpperCase(h2))
        else sb.append('%').append(h1).append(h2)
        i += 3
      } else {
        // ordinary char, or a dangling '%' (incomplete escape) — the
        // builtin chain sentinels it and restores it verbatim
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  // the SAME six dot-segment patterns, precompiled once
  private val Seg = graft.text.Url.NonDotSeg
  private val DotMid = Pattern.compile("/\\./")
  private val DotEnd = Pattern.compile("/\\.$")
  private val UpMid = Pattern.compile("/" + Seg + "/\\.\\./")
  private val UpEnd = Pattern.compile("/" + Seg + "/\\.\\.$")
  private val RootUp = Pattern.compile("^/\\.\\./")
  private val RootUpEnd = Pattern.compile("^/\\.\\.$")

  /** [[graft.text.Url.removeDotSegments]]: the same bounded fold of
    * regex passes. Fast path: every pattern contains the literal
    * substring "/." — a path without it is a fixpoint; and a pass that
    * changes nothing makes every later pass a no-op (the fold is a
    * deterministic function of its input), so the loop exits early. */
  def removeDotSegments(p: String): String = {
    if (p.indexOf("/.") < 0) return p
    var x = p
    var pass = 0
    while (pass < graft.text.Url.DotSegPasses) {
      val prev = x
      x = DotMid.matcher(x).replaceAll("/")
      x = DotEnd.matcher(x).replaceAll("/")
      x = UpMid.matcher(x).replaceAll("/")
      x = UpEnd.matcher(x).replaceAll("/")
      x = RootUp.matcher(x).replaceAll("/")
      x = RootUpEnd.matcher(x).replaceAll("/")
      if (x == prev) return x
      pass += 1
    }
    x
  }

  /** [[graft.text.Url.canonicalHost]]: lowercased host:port with the
    * scheme's default port stripped. */
  def canonicalHost(url: String): String = {
    val hp = lower(extract(HostRe, url))
    val scheme = lower(extract(SchemeRe, url))
    if (scheme == "https" && hp.endsWith(":443")) hp.substring(0, hp.length - 4)
    else if (scheme == "http" && hp.endsWith(":80")) hp.substring(0, hp.length - 3)
    else hp
  }

  /** [[graft.text.Url.urlDomain]]: canonical host without ANY port and
    * without a leading `www.` (regex ":[0-9]+$" then "^www\\."). */
  def urlDomain(url: String): String = {
    var h = canonicalHost(url)
    // strip ":[0-9]+$": at least one trailing digit preceded by ':'
    var i = h.length - 1
    var digits = 0
    while (i >= 0 && h.charAt(i) >= '0' && h.charAt(i) <= '9') { i -= 1; digits += 1 }
    if (digits > 0 && i >= 0 && h.charAt(i) == ':') h = h.substring(0, i)
    if (h.startsWith("www.")) h.substring(4) else h
  }

  /** UTF8String (unsigned byte) ordering — array_sort parity for the
    * query params (java String order differs past the BMP). */
  private val Utf8Order: java.util.Comparator[String] =
    (a: String, b: String) =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** [[graft.text.Url]].canonicalQuery: decode, split '&', drop utm_*
    * and empties, sort, re-join. */
  private def canonicalQuery(url: String): String = {
    val q = pctDecodeUnreserved(extract(QueryRe, url))
    if (q.isEmpty) return ""
    // split("&", -1) parity (trailing empties kept, then filtered out
    // like the builtin's =!= "" anyway)
    val parts = q.split("&", -1)
    val kept = new java.util.ArrayList[String](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty && !p.startsWith("utm_")) kept.add(p)
      i += 1
    }
    kept.sort(Utf8Order)
    String.join("&", kept)
  }

  /** [[graft.text.Url.canonicalize]] — the exact-dedup key. */
  def canonicalize(url: String): String = {
    val scheme = lower(extract(SchemeRe, url))
    val host = canonicalHost(url)
    val path = removeDotSegments(pctDecodeUnreserved(extract(PathRe, url)))
    val q = canonicalQuery(url)
    val sb = new java.lang.StringBuilder(
      scheme.length + 3 + host.length + path.length + q.length + 1)
    sb.append(scheme).append("://").append(host).append(path)
    if (q.nonEmpty) sb.append('?').append(q)
    sb.toString
  }

  def computeCanonical(u: UTF8String): UTF8String =
    UTF8String.fromString(canonicalize(u.toString))

  def computeDomain(u: UTF8String): UTF8String =
    UTF8String.fromString(urlDomain(u.toString))
}

/** `canonical_url` as one codegen pass — see [[UrlCanonCore]]. */
case class CanonicalUrlExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UrlCanonCore.computeCanonical(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlCanonCore.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input => s"$cls.MODULE$$.computeCanonical($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrlExpr =
    copy(child = newChild)
}

object CanonicalUrlExpr {
  def canonical_url(c: Column): Column =
    ColumnBridge.column(CanonicalUrlExpr(ColumnBridge.expression(c)))
}

/** `url_domain` as one codegen pass — see [[UrlCanonCore]]. */
case class UrlDomainExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UrlCanonCore.computeDomain(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UrlCanonCore.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input => s"$cls.MODULE$$.computeDomain($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlDomainExpr =
    copy(child = newChild)
}

object UrlDomainExpr {
  def url_domain(c: Column): Column =
    ColumnBridge.column(UrlDomainExpr(ColumnBridge.expression(c)))
}
