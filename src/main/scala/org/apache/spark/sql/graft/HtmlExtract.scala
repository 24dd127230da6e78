package org.apache.spark.sql.graft

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML main-content extraction as one-pass codegen expressions
  * (round-20 optimization). The builtin-composition extractor
  * ([[graft.text.Html]], kept as the spec reference and the oracle-SQL
  * template) evaluates an interpreted `transform` lambda per line —
  * three regexp_replace + one regexp_extract_all + an aggregate fold
  * per element — and the pre/code prefix scan concat-copies a growing
  * boolean array per line (O(L²) in the line count). These expressions
  * compute the same values with precompiled matchers and one linear
  * scan over the lines.
  *
  * Bug-for-bug parity (HtmlExtractSpec pins it over tag-soup fixtures
  * and by whole-corpus equality):
  *  - the same regexes in the same order (comments → script → style →
  *    head; pre/code sentinels before line-breaking; the same
  *    tag-strip / sentinel-strip / `\s+`-collapse per line);
  *  - trim() strips ASCII SPACES only (UTF8String.trim);
  *  - length() counts CODE POINTS (UTF8String.numChars) — the keep
  *    rule and link mass use code-point counts;
  *  - split("\n", -1) keeps trailing empties; blank lines are dropped
  *    AFTER the depth scan (they carry no sentinels, but order matters
  *    for parity);
  *  - entity unescape order ends with `&amp;` (so `&amp;lt;` yields a
  *    literal `&lt;`);
  *  - scored-lines: null → null; main-text: null → "" (concat_ws over
  *    a null array).
  */
object HtmlExtractCore {
  import graft.text.Html

  private val CommentP = Pattern.compile(Html.CommentRe)
  private val ScriptP = Pattern.compile(Html.ScriptRe)
  private val StyleP = Pattern.compile(Html.StyleRe)
  private val HeadP = Pattern.compile(Html.HeadRe)
  private val PreOpenP = Pattern.compile(Html.PreOpenRe)
  private val PreCloseP = Pattern.compile(Html.PreCloseRe)
  private val CodeOpenP = Pattern.compile(Html.CodeOpenRe)
  private val CodeCloseP = Pattern.compile(Html.CodeCloseRe)
  private val BreakP = Pattern.compile(Html.BreakRe)
  private val TagP = Pattern.compile("<[^>]*>")
  private val SentP = Pattern.compile("[\\u0001\\u0002]")
  private val WsP = Pattern.compile("\\s+")
  private val AnchorP = Pattern.compile(Html.AnchorRe)

  private val PreOpenC = '\u0001'
  private val PreCloseC = '\u0002'

  /** One scored line: cleaned text, link mass (code points), pre/code
    * exemption flag. */
  final class Line(val t: String, val lc: Int, val ex: Boolean)

  /** Steps 1–5 of the extractor pipeline (strip → mark → break → score
    * → depth-scan), blank lines dropped last — [[Html.scoredLines]]. */
  def scoredLines(html: String): Array[Line] = {
    var h = CommentP.matcher(html).replaceAll(" ")
    h = ScriptP.matcher(h).replaceAll(" ")
    h = StyleP.matcher(h).replaceAll(" ")
    h = HeadP.matcher(h).replaceAll(" ")
    h = PreOpenP.matcher(h).replaceAll("\n" + PreOpenC)
    h = PreCloseP.matcher(h).replaceAll(PreCloseC + "\n")
    h = CodeOpenP.matcher(h).replaceAll(PreOpenC.toString)
    h = CodeCloseP.matcher(h).replaceAll(PreCloseC.toString)
    h = BreakP.matcher(h).replaceAll("\n")
    val lines = h.split("\n", -1)
    val out = new java.util.ArrayList[Line](lines.length)
    var depth = 0
    var li = 0
    while (li < lines.length) {
      val l = lines(li)
      // sentinel counts (cheap char scan, not regex)
      var op = 0
      var cl = 0
      var ci = 0
      while (ci < l.length) {
        val c = l.charAt(ci)
        if (c == PreOpenC) op += 1 else if (c == PreCloseC) cl += 1
        ci += 1
      }
      val ex = depth > 0 || op > 0 || cl > 0
      depth += op - cl
      // cleaned text: tag-strip, sentinel-strip, \s+ collapse, trim(' ')
      var t = TagP.matcher(l).replaceAll(" ")
      t = SentP.matcher(t).replaceAll(" ")
      t = WsP.matcher(t).replaceAll(" ")
      var st = 0
      var en = t.length
      while (st < en && t.charAt(st) == ' ') st += 1
      while (en > st && t.charAt(en - 1) == ' ') en -= 1
      t = t.substring(st, en)
      if (t.nonEmpty) {
        // link mass: Σ code points of anchor inner texts
        var lc = 0
        val m = AnchorP.matcher(l)
        while (m.find()) {
          val g = m.group(1)
          if (g != null) lc += g.codePointCount(0, g.length)
        }
        out.add(new Line(t, lc, ex))
      }
      li += 1
    }
    out.toArray(new Array[Line](out.size))
  }

  /** [[Html.keepLine]]: pre/code exemption, else length ≥ 10 code
    * points and link density ≤ ½. */
  def keep(l: Line): Boolean = {
    if (l.ex) return true
    val len = l.t.codePointCount(0, l.t.length)
    len >= Html.MinTextChars && 2 * l.lc <= len
  }

  /** [[Html.unescapeEntities]] — same table, same order. */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    var x = s
    Html.Entities.foreach { case (e, ch) => x = x.replace(e, ch) }
    x
  }

  def computeScoredLines(html: UTF8String): ArrayData = {
    val ls = scoredLines(html.toString)
    val rows = new Array[Any](ls.length)
    var i = 0
    while (i < ls.length) {
      val l = ls(i)
      rows(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(l.t), l.lc, l.ex))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** Full extractor: kept lines, entity-unescaped, '\n'-joined. */
  def computeMainText(html: UTF8String): UTF8String = {
    if (html == null) return UTF8String.EMPTY_UTF8
    val ls = scoredLines(html.toString)
    val sb = new java.lang.StringBuilder()
    var i = 0
    var first = true
    while (i < ls.length) {
      val l = ls(i)
      if (keep(l)) {
        if (!first) sb.append('\n')
        sb.append(unescape(l.t))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `html_scored_lines` as one codegen pass — see [[HtmlExtractCore]]. */
case class HtmlScoredLinesExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("t", StringType, nullable = false),
      StructField("lc", IntegerType, nullable = false),
      StructField("ex", BooleanType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HtmlExtractCore.computeScoredLines(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HtmlExtractCore.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.computeScoredLines($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlScoredLinesExpr =
    copy(child = newChild)
}

object HtmlScoredLinesExpr {
  def html_scored_lines(c: Column): Column =
    ColumnBridge.column(HtmlScoredLinesExpr(ColumnBridge.expression(c)))
}

/** `html_main_text` as one codegen pass — see [[HtmlExtractCore]].
  * NOT null-intolerant: a null document extracts to "" (the builtin
  * chain's concat_ws over a null line array), so this overrides the
  * default null short-circuit. */
case class HtmlMainTextExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    HtmlExtractCore.computeMainText(
      child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HtmlExtractCore.getClass.getName.stripSuffix("$") + "$"
    val c = child.genCode(ctx)
    val in =
      if (child.nullable) s"(${c.isNull} ? null : ${c.value})" else s"${c.value}"
    val assigned = c.code +
      code"""
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
         |  $cls.MODULE$$.computeMainText($in);
         |""".stripMargin
    ev.copy(code = assigned, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlMainTextExpr =
    copy(child = newChild)
}

object HtmlMainTextExpr {
  def html_main_text(c: Column): Column =
    ColumnBridge.column(HtmlMainTextExpr(ColumnBridge.expression(c)))
}
