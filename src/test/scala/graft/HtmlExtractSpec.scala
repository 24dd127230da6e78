package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Html

/** The codegen'd HtmlScoredLinesExpr / HtmlMainTextExpr (round-20
  * optimization) must be BUG-FOR-BUG identical to the
  * builtin-composition extractor (interpreted transform lambda +
  * O(L²) boolean-array depth scan) — the t_html_extract and
  * t_pipeline_crawl oracles replay that exact rule chain in DuckDB.
  * Fixtures drive every regex alternative and documented edge (the
  * t_pretok_edge discipline); the corpus test pins equality over every
  * staged htmlAug document at sf0.001. */
class HtmlExtractSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val fixtures: Seq[String] = Seq(
    // plain prose lines, block tags upper/lower, <br/> forms
    "<p>A perfectly ordinary paragraph of body text.</p>",
    "<P>Uppercase markup with a break<BR/>second visual line here.</P>",
    "<div>div line one</div><DIV>div line two</DIV><br>tail text line",
    // head with attributes (not <header>), style/script spanning newlines
    "<head lang=\"en\"><title>T</title><style>b{x}</style></head><body><p>kept body line text</p></body>",
    "<header>site header nav text that is long enough</header><p>real content line</p>",
    "<script type=\"t\">\nvar x = \"<a href=/no>never counted</a>\";\n</script><p>after script body text</p>",
    "<style>\n.c { color: red }\n</style><p>after style body text</p>",
    // comments incl. '>' inside, commented-out markup
    "<!-- a > b --><p>text after tricky comment here</p>",
    "<!-- <p>commented out paragraph never seen</p> --><p>visible paragraph text</p>",
    // anchors: bare <a>, attributes, link-dense vs text-dense, empty anchor
    "<p>See <a href=\"/r\">reference one</a> for details about things.</p>",
    "<div><a>promo one</a> <a href=\"/p\">promo two</a></div>",
    "<footer>(c) 2026 <a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></footer>",
    "<p><a href=\"/x\"></a>empty anchor but plenty of prose around it</p>",
    // pre/code: exemption, inline code, unmatched open/close
    "<pre>x = f(1)\nm = h(3)\ny = g(2)</pre>",
    "<p>Inline <code>f()</code> call in a sentence that flows on.</p>",
    "<p>short</p><pre>tiny</pre><p>also-short</p>",
    "</pre><p>stray close then this long enough line of text</p>",
    "<pre><p>stray OPEN exempts everything after it</p><div><a href=\"/b\">B</a></div>",
    "<CODE>UPPER code block</CODE><p>trailing prose line long enough</p>",
    // entities incl. &amp;lt; double-escape order
    "<p>Entities &lt;tag&gt; &quot;q&quot; &#39;a&#39; &amp; &amp;lt; here</p>",
    // length rule boundary: exactly 9 / 10 chars
    "<p>123456789</p><p>1234567890</p>",
    // whitespace collapse: tabs/newlines/CR/FF inside lines
    "<p>tabs\tand\nnewlines\randvt\fff collapse</p>",
    // unicode + astral (code-point counting in length and link mass)
    "<p>emoji 😀😀 line with enough text to pass</p>",
    "<p><a href=\"/e\">😀😀😀😀😀😀</a> word</p>",
    "<p>世界 short</p><p>世界世界世界世界世界 longer body text line here</p>",
    // no markup at all, empty, whitespace-only
    "just bare text with no tags at all in it",
    "",
    "   \n\t  ",
    // nested/unclosed tags, angle soup
    "<p>unclosed paragraph flows until a break<div>next line of text</div>",
    "a < b but > c <notatag and <p>then real text content here</p>",
    "<table><tr><td>cell one text content</td></tr></table>")

  test("HtmlScoredLinesExpr == builtin scoredLines on tag-soup fixtures") {
    val r = fixtures.toDF("h")
      .select(col("h"),
        Html.scoredLines(col("h")).as("fast"),
        Html.scoredLinesBuiltin(col("h")).as("ref"))
      .collect()
    r.foreach { row =>
      assert(row.getSeq[Any](1) == row.getSeq[Any](2),
        s"html '${row.getString(0).take(60)}'")
    }
  }

  test("HtmlMainTextExpr == builtin extractMainText on fixtures") {
    val r = fixtures.toDF("h")
      .select(col("h"),
        Html.extractMainText(col("h")).as("fast"),
        Html.extractMainTextBuiltin(col("h")).as("ref"))
      .collect()
    r.foreach { row =>
      assert(row.getString(1) == row.getString(2),
        s"html '${row.getString(0).take(60)}': " +
          s"fast=${row.getString(1)} ref=${row.getString(2)}")
    }
  }

  test("null html: scored lines null, main text empty (builtin parity)") {
    val r = Seq[Option[String]](None).toDF("h")
      .select(Html.scoredLines(col("h")).as("lf"),
        Html.scoredLinesBuiltin(col("h")).as("lr"),
        Html.extractMainText(col("h")).as("mf"),
        Html.extractMainTextBuiltin(col("h")).as("mr"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getString(2) == "" && r.getString(3) == "")
  }

  test("parity holds over every staged htmlAug document at sf0.001") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val h = graft.queries.LlmOps.htmlAug(
      col("doc_id"), col("text"), col("source"))
    val bad = docs
      .select(Html.scoredLines(h).as("lf"), Html.scoredLinesBuiltin(h).as("lr"),
        Html.extractMainText(h).as("mf"), Html.extractMainTextBuiltin(h).as("mr"))
      .filter(!(col("lf") <=> col("lr")) || !(col("mf") <=> col("mr")))
      .count()
    assert(bad == 0L)
  }

  test("Html expressions generate compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = fixtures.take(5).toDF("h")
        .select(Html.scoredLines(col("h")).as("l"),
          Html.extractMainText(col("h")).as("m"))
        .collect()
      assert(r.length == 5 && r.forall(x => !x.isNullAt(1)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
