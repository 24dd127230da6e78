package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the FIRST transform of every real
  * pretraining pipeline (CCNet / RefinedWeb / FineWeb all start from
  * crawled HTML, not clean text): strip non-content subtrees, break the
  * markup into visual lines at block-element boundaries, then keep a
  * line iff it reads like body text — long enough and not link-dense
  * (the jusText / trafilatura line-level heuristic family).
  *
  * Everything is `org.apache.spark.sql.functions` string expressions
  * and higher-order array functions — whole-stage-codegen'd, map-only,
  * no shuffle, no UDF — and every rule replays in ANSI SQL (RE2-safe
  * regexes: no backreferences, lazy quantifiers only), so the
  * t_html_extract gate hash-pins the extractor byte-for-byte.
  *
  * Pipeline:
  *   1. drop `<script>`/`<style>` subtrees and the whole `<head>`
  *   2. turn closing block tags + `<br>` into line breaks
  *   3. per line: text = tag-strip + whitespace-collapse + trim;
  *      link mass = Σ length of `<a …>…</a>` inner texts
  *   4. keep iff `len(text) >= MinTextChars` and
  *      `2 * link_mass <= len(text)` (link density ≤ ½)
  *   5. unescape HTML entities on the KEPT text only — after
  *      tag-strip, so `&lt;tags&gt;` in content cannot be eaten as
  *      markup; `&amp;` is decoded LAST so `&amp;lt;` correctly yields
  *      the literal `&lt;`
  */
object Html {

  /** Entity decode table, shared verbatim with the DuckDB oracle.
    * ORDER MATTERS: `&amp;` last (see class doc). */
  private[graft] val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&amp;" -> "&")

  /** Closing tags treated as line breaks. */
  private[graft] val BlockTags: Seq[String] = Seq(
    "p", "div", "nav", "aside", "footer", "header", "section", "article",
    "h1", "h2", "h3", "h4", "li", "ul", "ol", "tr", "table", "blockquote")

  private[graft] val MinTextChars = 10

  private[graft] val BreakRe: String =
    "</(" + BlockTags.mkString("|") + ")>|<br */?>"
  private[graft] val AnchorRe: String = "<a [^>]*>(.*?)</a>"

  def unescapeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }

  /** Drop subtrees that never carry content. Lazy `.*?` keeps each
    * strip inside its own element; the synthetic fixtures (and crawl
    * practice) put no raw newlines inside these, so default
    * `.`-excludes-newline semantics match RE2's. */
  def stripNonContent(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      "<script[^>]*>.*?</script>", " "),
      "<style[^>]*>.*?</style>", " "),
      "<head>.*?</head>", " ")

  /** Non-blank visual lines as `struct(t: clean text, lc: link mass)`. */
  def scoredLines(html: Column): Column = {
    val lines = split(regexp_replace(stripNonContent(html), BreakRe, "\n"), "\n")
    val scored = transform(lines, l => {
      val t = trim(regexp_replace(regexp_replace(l, "<[^>]*>", " "), "\\s+", " "))
      val lc = aggregate(
        transform(regexp_extract_all(l, lit(AnchorRe), lit(1)), a => length(a)),
        lit(0), (acc, x) => acc + x)
      struct(t.as("t"), lc.as("lc"))
    })
    filter(scored, s => length(s.getField("t")) > 0)
  }

  /** The line-level keep rule (step 4 above). */
  def keepRule(t: Column, lc: Column): Column =
    length(t) >= MinTextChars && lc * 2 <= length(t)

  /** The extracted main content from a [[scoredLines]] column: kept
    * lines, entity-unescaped, joined with `\n` in document order. */
  def extractFromLines(ls: Column): Column =
    concat_ws("\n",
      transform(filter(ls, s => keepRule(s.getField("t"), s.getField("lc"))),
        s => unescapeEntities(s.getField("t"))))

  /** The extracted main content of an HTML document. */
  def extractMainText(html: Column): Column =
    extractFromLines(scoredLines(html))
}
