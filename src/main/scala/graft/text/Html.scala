package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the FIRST transform of every real
  * pretraining pipeline (CCNet / RefinedWeb / FineWeb all start from
  * crawled HTML, not clean text): strip non-content subtrees, break the
  * markup into visual lines at block-element boundaries, then keep a
  * line iff it reads like body text — long enough and not link-dense
  * (the jusText / trafilatura line-level heuristic family) — or sits
  * inside a `<pre>`/`<code>` block (FineWeb keeps code; code lines are
  * short and symbol-heavy by nature, so the prose heuristics must not
  * judge them).
  *
  * Everything is `org.apache.spark.sql.functions` string expressions
  * and higher-order array functions — map-only, no shuffle, no UDF —
  * and every rule replays in ANSI SQL (RE2-safe regexes: no
  * backreferences, lazy quantifiers only; `(?i)` and `[\s\S]` are
  * RE2-valid), so the t_html_extract gate hash-pins the extractor
  * byte-for-byte.
  *
  * Real-crawl hardening (round 15): all tag regexes are
  * case-insensitive (`</P>`, `<BR/>`, `<SCRIPT>` are everyday crawl
  * markup), HTML comments are stripped explicitly (the generic
  * tag-strip would cut `<!-- a > b -->` at the first `>` and leak
  * ` b -->` into line text), script/style/head bodies match across
  * raw newlines (`[\s\S]*?` — lazy `.` stops at `\n`), `<head>` may
  * carry attributes (without catching `<header>`, hence
  * `(?:\s[^>]*)?`), and a bare `<a>` anchor contributes link mass.
  *
  * Pipeline:
  *   1. drop comments, `<script>`/`<style>` subtrees and the whole
  *      `<head>`
  *   2. mark `<pre>`/`<code>` boundaries with sentinel chars
  *      (\u0001 open / \u0002 close — neither survives to output)
  *   3. turn closing block tags + `<br>` into line breaks
  *   4. per line: text = tag-strip + sentinel-strip +
  *      whitespace-collapse + trim; link mass = Σ length of
  *      `<a …>…</a>` inner texts; pre-depth = running Σ(opens−closes)
  *   5. keep iff inside a pre/code block (depth before the line > 0,
  *      or the line carries a boundary itself) OR `len(text) >=
  *      MinTextChars` and `2 * link_mass <= len(text)` (link density
  *      ≤ ½)
  *   6. unescape HTML entities on the KEPT text only — after
  *      tag-strip, so `&lt;tags&gt;` in content cannot be eaten as
  *      markup; `&amp;` is decoded LAST so `&amp;lt;` correctly yields
  *      the literal `&lt;`
  *
  * The pre-depth is an UNCLAMPED running sum (replayable as a window
  * SUM in any engine), which fixes the behavior on BOTH malformed
  * shapes: a stray unmatched `</pre>` drives the depth negative and
  * suppresses the exemption until markup rebalances, and — the worse
  * quality outcome — a stray unmatched `<pre>`/`<code>` OPEN leaves
  * the depth positive for the REST of the document, exempting every
  * later line (nav/footer/ad boilerplate included) from the prose
  * heuristics. Both are accepted, documented behavior on malformed
  * input, chosen over clamping or a block-boundary depth reset because
  * neither of those is expressible as a plain window aggregate (the
  * oracle-replayability contract). A production crawl that cannot
  * tolerate the stray-open keep-everything mode should bound it
  * UPSTREAM of this extractor — e.g. drop documents whose total
  * open−close imbalance exceeds a threshold (one map-side aggregate
  * over the same per-line counts this pass already computes) — rather
  * than bend the scan itself away from window-SUM replayability.
  */
object Html {

  /** Entity decode table, shared verbatim with the DuckDB oracle.
    * ORDER MATTERS: `&amp;` last (see class doc). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&amp;" -> "&")

  /** Closing tags treated as line breaks. */
  val BlockTags: Seq[String] = Seq(
    "p", "div", "nav", "aside", "footer", "header", "section", "article",
    "h1", "h2", "h3", "h4", "li", "ul", "ol", "tr", "table", "blockquote")

  val MinTextChars = 10

  val BreakRe: String =
    "(?i)</(" + BlockTags.mkString("|") + ")>|<br\\s*/?>"

  /** `(?:\s[^>]*)?` — attributes optional, so a bare `<a>` still
    * contributes its inner text to link mass. */
  val AnchorRe: String = "(?i)<a(?:\\s[^>]*)?>(.*?)</a>"

  /** Non-content strips. Comments FIRST (commented-out markup must
    * not be seen by any later rule); element bodies span newlines. */
  val CommentRe: String = "<!--[\\s\\S]*?-->"
  val ScriptRe: String =
    "(?i)<script(?:\\s[^>]*)?>[\\s\\S]*?</script>"
  val StyleRe: String =
    "(?i)<style(?:\\s[^>]*)?>[\\s\\S]*?</style>"
  val HeadRe: String =
    "(?i)<head(?:\\s[^>]*)?>[\\s\\S]*?</head>"

  /** Pre/code boundary sentinels: substituted before line-breaking so
    * per-line open/close counts (and their running sum) identify the
    * lines exempt from the prose heuristics. `<pre>` is block-level —
    * its sentinels carry a line break, isolating the block on its own
    * lines — while `<code>` is inline: its sentinels exempt the
    * CONTAINING line without splitting the sentence around an inline
    * code span. The control chars never occur in text and are
    * stripped from the output. Oracle side: chr(1)/chr(2). */
  val PreOpen = "\u0001"
  val PreClose = "\u0002"
  val PreOpenRe: String = "(?i)<pre(?:\\s[^>]*)?>"
  val PreCloseRe: String = "(?i)</pre>"
  val CodeOpenRe: String = "(?i)<code(?:\\s[^>]*)?>"
  val CodeCloseRe: String = "(?i)</code>"

  def unescapeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }

  /** Drop subtrees that never carry content. */
  def stripNonContent(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      CommentRe, " "),
      ScriptRe, " "),
      StyleRe, " "),
      HeadRe, " ")

  /** Non-blank visual lines as `struct(t: clean text, lc: link mass,
    * ex: inside-pre/code exemption)`. The exemption is a prefix scan
    * (depth of pre/code blocks open BEFORE the line, or a boundary on
    * the line itself) computed by one linear fold over the line array
    * — still map-only, no shuffle; the oracle replays it as a window
    * SUM over the unnested lines. */
  def scoredLines(html: Column): Column =
    org.apache.spark.sql.graft.HtmlScoredLinesExpr.html_scored_lines(html)

  /** Builtin-composition formulation — value-equality reference for the
    * codegen expression in specs (HtmlExtractSpec). Do not use in hot
    * paths: the transform lambda interprets per line and the depth scan
    * concat-copies a boolean array per line (O(L²)). */
  private[graft] def scoredLinesBuiltin(html: Column): Column = {
    val marked = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      stripNonContent(html),
      PreOpenRe, "\n" + PreOpen), PreCloseRe, PreClose + "\n"),
      CodeOpenRe, PreOpen), CodeCloseRe, PreClose)
    val lines = split(regexp_replace(marked, BreakRe, "\n"), "\n")
    val scored = transform(lines, l => {
      val t = trim(regexp_replace(regexp_replace(regexp_replace(l,
        "<[^>]*>", " "), "[\u0001\u0002]", " "), "\\s+", " "))
      val lc = aggregate(
        transform(regexp_extract_all(l, lit(AnchorRe), lit(1)), a => length(a)),
        lit(0), (acc, x) => acc + x)
      val op = length(l) - length(replace(l, lit(PreOpen), lit("")))
      val cl = length(l) - length(replace(l, lit(PreClose), lit("")))
      struct(t.as("t"), lc.as("lc"), op.as("op"), cl.as("cl"))
    })
    // the depth scan accumulates ONLY booleans (not the line structs —
    // an accumulator carrying every line's text would copy O(L²) chars
    // on long pages; the boolean array still concat-copies per step but
    // the per-element cost is one byte) and zips the flags back onto
    // the scored lines elementwise. `scored` is LET-BOUND as a lambda
    // variable so the regex work per line runs ONCE — referencing the
    // Column twice would duplicate the whole transform (CollapseProject
    // inlines plain column references into every consumer).
    val zero = struct(lit(0).as("s"),
      expr("CAST(array() AS array<boolean>)").as("fs"))
    val flagged = element_at(transform(array(scored), sc => {
      val flags = aggregate(sc, zero,
        (acc, x) => struct(
          (acc.getField("s") + x.getField("op") - x.getField("cl")).as("s"),
          concat(acc.getField("fs"),
            array(acc.getField("s") > 0 || x.getField("op") > 0 ||
              x.getField("cl") > 0)).as("fs")),
        acc => acc.getField("fs"))
      zip_with(sc, flags, (x, f) => struct(
        x.getField("t").as("t"), x.getField("lc").as("lc"), f.as("ex")))
    }), 1)
    filter(flagged, s => length(s.getField("t")) > 0)
  }

  /** The prose keep rule (step 5's length/density leg). */
  def keepRule(t: Column, lc: Column): Column =
    length(t) >= MinTextChars && lc * 2 <= length(t)

  /** Full keep decision on a [[scoredLines]] struct: pre/code lines
    * are exempt from the prose heuristics. */
  def keepLine(s: Column): Column =
    s.getField("ex") || keepRule(s.getField("t"), s.getField("lc"))

  /** The extracted main content from a [[scoredLines]] column: kept
    * lines, entity-unescaped, joined with `\n` in document order. */
  def extractFromLines(ls: Column): Column =
    concat_ws("\n",
      transform(filter(ls, keepLine _),
        s => unescapeEntities(s.getField("t"))))

  /** The extracted main content of an HTML document — one codegen pass
    * (round-20 optimization,
    * [[org.apache.spark.sql.graft.HtmlExtractCore]]). */
  def extractMainText(html: Column): Column =
    org.apache.spark.sql.graft.HtmlMainTextExpr.html_main_text(html)

  /** Builtin-composition formulation — the spec reference. */
  private[graft] def extractMainTextBuiltin(html: Column): Column =
    extractFromLines(scoredLinesBuiltin(html))
}
