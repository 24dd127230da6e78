package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-doc text signals (round-19 optimization). The
  * quality-score and language-id combinators each evaluated an
  * interpreted `filter(toks, isInCollection(...))` lambda per token
  * (per marker set for lang-id — four of them) plus a regexp_count
  * scan; both signals run under a dozen gates. These expressions
  * compute the same values in one pass over the doc.
  *
  * Value parity is pinned by TextSignalsSpec against the combinator
  * formulations, which stay in graft.text as the `_builtin`
  * references. Semantics replicated exactly:
  *  - token boundaries are single spaces of the STAGED norm column
  *    (`split(norm, " ")`, trailing empties kept);
  *  - `length()` counts CODE POINTS (UTF8String.numChars), and the
  *    punct class `[^a-z0-9 ]` matches per code point;
  *  - the score is the same fixed-order double arithmetic
  *    ((0.4·stop + 0.3·lenSat) + 0.3·(1 − punct)) rounded HALF_UP to
  *    6dp (Spark's Round on doubles: NaN/∞ pass through);
  *  - lang-id ties break en > de > es > fr, CJK short-circuits first.
  */
object TextSignals {

  private val Stop = Array("the", "a", "of", "and", "to", "in", "is")
  private val En = Array("the", "a", "of")
  private val De = Array("der", "die", "und")
  private val Es = Array("el", "los", "una")
  private val Fr = Array("le", "les", "des")

  private def contains(set: Array[String], s: String): Boolean = {
    var i = 0
    while (i < set.length) {
      if (set(i) == s) return true
      i += 1
    }
    false
  }

  /** quality_score over the staged `norm` column (toks = split(norm)). */
  def qualityScore(normU: UTF8String): Double = {
    val norm = normU.toString
    // one char pass: code-point length, punct count, token boundaries +
    // stopword membership
    var ntok = 1
    var nstop = 0
    var len = 0
    var punct = 0
    var tokStart = 0
    val n = norm.length
    var i = 0
    while (i <= n) {
      if (i == n || norm.charAt(i) == ' ') {
        if (contains(Stop, norm.substring(tokStart, i))) nstop += 1
        if (i < n) ntok += 1
        tokStart = i + 1
      }
      i += 1
    }
    var cp = 0
    while (cp < n) {
      val c = norm.codePointAt(cp)
      len += 1
      if (!((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' '))
        punct += 1
      cp += Character.charCount(c)
    }
    // ANSI parity: the builtin chain's punct/length division THROWS on
    // an empty norm under Spark 4's default ANSI mode — silently
    // returning NaN here would let dirty rows through a pipeline that
    // previously failed fast on them
    if (len == 0)
      throw new ArithmeticException(
        "[DIVIDE_BY_ZERO] quality_score punct ratio: empty normalized text")
    val stopRatio = nstop.toDouble / ntok
    val lenSat = math.min(1.0, len.toDouble / 500.0)
    val punctRatio = punct.toDouble / len
    round6((0.4 * stopRatio + 0.3 * lenSat) + 0.3 * (1.0 - punctRatio))
  }

  /** Spark Round(_, 6) on doubles: HALF_UP via BigDecimal.valueOf;
    * NaN/∞ pass through. */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private val Zh = UTF8String.fromString("zh")
  private val EnS = UTF8String.fromString("en")
  private val DeS = UTF8String.fromString("de")
  private val EsS = UTF8String.fromString("es")
  private val FrS = UTF8String.fromString("fr")

  /** lang_id over the RAW text (tokens derived via the norm chain). */
  def langId(rawU: UTF8String): UTF8String = {
    val raw = rawU.toString
    // CJK short-circuit on the raw text
    var cp = 0
    val rn = raw.length
    while (cp < rn) {
      val c = raw.codePointAt(cp)
      if (c >= 0x4e00 && c <= 0x9fff) return Zh
      cp += Character.charCount(c)
    }
    val norm = NormCore.normalize(raw)
    var en = 0; var de = 0; var es = 0; var fr = 0
    var tokStart = 0
    val n = norm.length
    var i = 0
    while (i <= n) {
      if (i == n || norm.charAt(i) == ' ') {
        val t = norm.substring(tokStart, i)
        if (contains(En, t)) en += 1
        if (contains(De, t)) de += 1
        if (contains(Es, t)) es += 1
        if (contains(Fr, t)) fr += 1
        tokStart = i + 1
      }
      i += 1
    }
    if (en >= de && en >= es && en >= fr) EnS
    else if (de >= es && de >= fr) DeS
    else if (es >= fr) EsS
    else FrS
  }
}

/** [[TextSignals.qualityScore]] over a staged `norm` column. */
case class QualityScoreExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    TextSignals.qualityScore(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextSignals.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input => s"$cls.MODULE$$.qualityScore($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

object QualityScoreExpr {
  def quality_score_norm(norm: Column): Column =
    ColumnBridge.column(QualityScoreExpr(ColumnBridge.expression(norm)))
}

/** [[TextSignals.langId]] over the raw text column. */
case class LangIdExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextSignals.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextSignals.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input => s"$cls.MODULE$$.langId($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  def lang_id_raw(raw: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(raw)))
}
