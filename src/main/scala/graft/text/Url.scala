package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the FIRST dedup stage of a crawl-scale
  * pretraining pipeline (CCNet / RefinedWeb / FineWeb all begin with
  * URL-level exact dedup before any content pass): two crawls of the
  * same page differ in scheme/host case, default ports, tracking
  * parameters, parameter order and fragments long before their bodies
  * differ, so exact dedup must key on a CANONICAL form.
  *
  * Everything here is pure `org.apache.spark.sql.functions` string
  * expressions — whole-stage-codegen'd, map-only, no shuffle, no UDF —
  * and every rule is replayable in ANSI SQL (the DuckDB oracle folds
  * the SAME [[PctDecode]] table, the piiScrub shared-table
  * discipline), so the d_url_dedup gate hash-pins the canonicalizer
  * end-to-end.
  *
  * Rules (RFC 3986 §6 normalization, the subset crawl dedup uses):
  *   - scheme and host lowercased (path/query stay case-sensitive)
  *   - default ports stripped (`:443` for https, `:80` for http);
  *     non-default ports KEPT
  *   - percent-decoding of UNRESERVED octets only (ALPHA / DIGIT /
  *     `-` `.` `_` `~`, both hex cases — §6.2.2.1) in the PATH and
  *     the QUERY — reserved octets like `%2F` stay encoded (decoding
  *     them would change the path) but their hex digits are
  *     case-normalized to uppercase (`%2f` → `%2F`); escapes of
  *     octets outside unreserved+reserved (raw UTF-8 bytes like
  *     `%C3`) keep their original case — a documented gap, they are
  *     rare in dedup-relevant URL spellings
  *   - dot-segments removed from the decoded path (§6.2.2.3):
  *     `/a/./b` and `/a/c/../b` both collapse to `/a/b`
  *   - tracking parameters dropped (`utm_*`), remaining parameters
  *     sorted; the `?` disappears when nothing is left
  *   - fragment dropped
  */
object Url {

  /** Unreserved-octet decode table, shared verbatim with the DuckDB
    * oracle so the two engines cannot drift. Both hex-case forms of
    * each octet (`%7E` and `%7e`) decode — RFC 3986 §6.2.2.1 treats
    * escape hex as case-insensitive. */
  private[graft] val PctDecode: Seq[(String, String)] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .flatMap { c =>
        val up = f"%%${c.toInt}%02X"
        val lo = f"%%${c.toInt}%02x"
        (up -> c.toString) +: (if (lo != up) Seq(lo -> c.toString) else Nil)
      }

  /** Hex-case normalization for escapes that stay encoded: the RFC
    * 3986 reserved set's lowercase-hex spellings map to uppercase
    * (`%2f` → `%2F`), so two crawls differing only in escape hex case
    * share a dedup key. Only reserved octets whose second hex digit
    * is a letter need an entry. */
  private[graft] val HexCaseNorm: Seq[(String, String)] =
    ":/?#[]@!$&'()*+,;=".flatMap { c =>
      val up = f"%%${c.toInt}%02X"
      val lo = f"%%${c.toInt}%02x"
      if (lo != up) Seq(lo -> up) else Nil
    }

  /** DANGLING-escape neutralization (round-14 review): a sequential
    * replace fold is not a single-pass decoder — decoding `%44` → `D`
    * after a dangling `%2` creates a `%2D` that a later fold entry
    * would decode, collapsing two genuinely different raw URLs onto
    * one dedup key. Before folding, every `%` that does NOT start a
    * complete 2-hex escape is replaced by a sentinel (U+0001, never
    * present in a URL), applied twice so overlapping dangling runs
    * (`%2%2%44`) are caught when the first pass re-exposes one; the
    * sentinel is restored to `%` after the fold. Decoded output chars
    * are alphanumerics/`-._~`, which can never re-form a sentinel
    * escape, so the fold is cascade-free on every input with dangling
    * depth ≤ 2 (deeper pathological `%`-runs are out of contract — the
    * worst case is an over-merged dedup key on garbage input). */
  private[graft] val DanglingRe = "%([0-9A-Fa-f]?)([^0-9A-Fa-f]|$)"
  private[graft] val Sentinel = "\u0001"

  /** Percent-decode unreserved octets (both hex cases) and uppercase
    * the hex of reserved escapes that stay encoded. */
  def pctDecodeUnreserved(c: Column): Column = {
    def neutralize(x: Column): Column =
      regexp_replace(x, DanglingRe, Sentinel + "$1$2")
    val guarded = neutralize(neutralize(c))
    val decoded = PctDecode.foldLeft(guarded) { case (acc, (code, ch)) =>
      replace(acc, lit(code), lit(ch))
    }
    // decoded output chars are unreserved (never '%'), so the
    // case-norm fold sees only escapes that were in the raw input
    val cased = HexCaseNorm.foldLeft(decoded) { case (acc, (lo, up)) =>
      replace(acc, lit(lo), lit(up))
    }
    replace(cased, lit(Sentinel), lit("%"))
  }

  /** A path segment that is neither `.` nor `..` — the only thing a
    * `..` may pop (RFC 3986 §6.2.2.3's stack never pops a dot-segment:
    * a bare `[^/]+` here let `/../../` annihilate PAIRWISE, silently
    * mis-resolving — not just truncating — traversal chains deeper
    * than the pass bound; round-16 probe). RE2-safe (no lookahead), so
    * the DuckDB oracle replays it verbatim. Shared with the oracle
    * builder — one definition, both engines. */
  val NonDotSeg = "(?:[^./][^/]*|\\.[^./][^/]*|\\.\\.[^/]+)"

  /** RFC 3986 §6.2.2.3 remove_dot_segments, as a BOUNDED fold of
    * regex passes (deterministic and replayable in any engine — the
    * reference algorithm's segment loop is not): each pass collapses
    * `/./`, a trailing `/.`, one level of `/seg/../` (innermost-first,
    * left-to-right, seg never itself a dot-segment — see
    * [[NonDotSeg]]), a trailing `/seg/..`, and a rootward `/../`.
    * [[DotSegPasses]] passes resolve any path with up to that many
    * nested `..` levels; deeper traversal chains (hand-crafted, not
    * crawl reality) retain residual LITERAL dot-segments — the
    * documented bound, and an OBSERVABLE one: saturation is detectable
    * by grepping the canonical output for `/../` (spec-pinned), never
    * a silently wrong key. Runs AFTER percent-decoding, so `/%2E%2E/`
    * collapses like `/../` (the RFC's ordering). */
  val DotSegPasses = 8
  def removeDotSegments(p: Column): Column =
    (1 to DotSegPasses).foldLeft(p) { (x, _) =>
      val a = regexp_replace(x, "/\\./", "/")
      val b = regexp_replace(a, "/\\.$", "/")
      val c2 = regexp_replace(b, "/" + NonDotSeg + "/\\.\\./", "/")
      val d = regexp_replace(c2, "/" + NonDotSeg + "/\\.\\.$", "/")
      val e = regexp_replace(d, "^/\\.\\./", "/")
      regexp_replace(e, "^/\\.\\.$", "/")
    }

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def hostPortOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))

  private def pathOf(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  private def queryOf(url: Column): Column =
    // anchored past a '#'-free prefix: a '?' INSIDE the fragment is
    // fragment text, not a query
    regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)

  /** Registered-domain-ish grouping key: the lowercased host without a
    * leading `www.` and without ANY port (the canonical URL keeps a
    * non-default port — different origin — but the per-domain rollup
    * groups origins of one site together). */
  def urlDomain(url: Column): Column =
    org.apache.spark.sql.graft.UrlDomainExpr.url_domain(url)

  /** Builtin-composition formulation — value-equality reference for the
    * codegen expression in specs (UrlCanonSpec). Do not use in hot
    * paths. */
  private[graft] def urlDomainBuiltin(url: Column): Column =
    regexp_replace(regexp_replace(canonicalHostBuiltin(url), ":[0-9]+$", ""),
      "^www\\.", "")

  private def stripSuffix(c: Column, suffix: String): Column =
    when(c.endsWith(suffix),
      substring(c, lit(1), length(c) - suffix.length)).otherwise(c)

  /** Lowercased host with the scheme's default port stripped;
    * non-default ports are kept (a different port IS a different
    * origin). */
  private[graft] def canonicalHostBuiltin(url: Column): Column = {
    val hp = hostPortOf(url)
    val scheme = schemeOf(url)
    when(scheme === "https", stripSuffix(hp, ":443"))
      .when(scheme === "http", stripSuffix(hp, ":80"))
      .otherwise(hp)
  }

  /** Canonical query string: unreserved escapes decoded (`?q=%41` ==
    * `?q=A` — decode FIRST, so an escaped `%75tm_` spelling cannot
    * smuggle a tracking param past the filter), `utm_*` params
    * dropped, rest sorted. */
  private def canonicalQuery(url: Column): Column = {
    val kept = array_sort(filter(split(pctDecodeUnreserved(queryOf(url)), "&"),
      p => !p.startsWith("utm_") && p =!= ""))
    array_join(kept, "&")
  }

  /** The canonical URL — the exact-dedup key. One-pass codegen
    * (round-20 optimization, [[org.apache.spark.sql.graft.UrlCanonCore]]);
    * the builtin-composition chain below stays as the spec reference
    * and the oracle-SQL generator's template. */
  def canonicalize(url: Column): Column =
    org.apache.spark.sql.graft.CanonicalUrlExpr.canonical_url(url)

  /** Builtin-composition formulation — value-equality reference for the
    * codegen expression in specs (UrlCanonSpec). Do not use in hot
    * paths. */
  private[graft] def canonicalizeBuiltin(url: Column): Column = {
    val q = canonicalQuery(url)
    concat(
      schemeOf(url), lit("://"), canonicalHostBuiltin(url),
      removeDotSegments(pctDecodeUnreserved(pathOf(url))),
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }
}
