package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The corpus text-normalization chain
  * `regexp_replace(lower(trim(c)), "\\s+", " ")` and its tokenization
  * `split(norm, " ")` as one-pass codegen expressions — these two run
  * under nearly EVERY text gate (all dedup detectors, every quality /
  * mixing / tokenizer-adjacent stage), so the per-doc regex machinery
  * (pattern match + replacement buffer + regex split) was a tax on the
  * whole suite.
  *
  * Bug-for-bug value parity with the builtin chain (NormTokensSpec
  * pins it over the normalization edge cases; the d_winnow detector
  * has shipped the same replica inside WinnowFingerprints since
  * round 9):
  *  - trim() strips ASCII SPACES only — tab/newline edges survive into
  *    the collapse and become a leading/trailing single space, whose
  *    split then yields EMPTY tokens;
  *  - lower() mirrors UTF8String.toLowerCase exactly: full-ASCII
  *    strings take the locale-independent ASCII path, anything else
  *    falls back to String.toLowerCase() under the default locale;
  *  - `\s` is Java regex's ASCII class [ \t\n\x0B\f\r];
  *  - split keeps trailing empty strings (Spark's limit −1).
  */
object NormCore {

  private def isFullAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** trim(ASCII space) → lower (UTF8String parity) → collapse \s+ runs
    * to one space, in two passes over the chars and one output buffer. */
  def normalize(text: String): String = {
    var st = 0
    var en = text.length
    while (st < en && text.charAt(st) == ' ') st += 1
    while (en > st && text.charAt(en - 1) == ' ') en -= 1
    val seg = text.substring(st, en)
    val lowered =
      if (isFullAscii(seg)) {
        val a = seg.toCharArray
        var i = 0
        while (i < a.length) {
          val c = a(i)
          if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
          i += 1
        }
        new String(a)
      } else seg.toLowerCase()
    // collapse: only build a new string when a change is needed
    val n = lowered.length
    var i = 0
    var dirty = false
    while (i < n && !dirty) {
      val c = lowered.charAt(i)
      if (isWs(c) && (c != ' ' || (i + 1 < n && isWs(lowered.charAt(i + 1)))))
        dirty = true
      i += 1
    }
    if (!dirty) return lowered
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val c = lowered.charAt(i)
      if (isWs(c)) {
        sb.append(' ')
        while (i + 1 < n && isWs(lowered.charAt(i + 1))) i += 1
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  def computeNorm(v: UTF8String): UTF8String =
    UTF8String.fromString(normalize(v.toString))

  def computeTokens(v: UTF8String): ArrayData = {
    val norm = normalize(v.toString)
    // split(" ", -1): trailing empties kept — matches Spark's split
    val parts = norm.split(" ", -1)
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = UTF8String.fromString(parts(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** `norm_text` as one codegen pass — see [[NormCore]]. */
case class NormTextExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormCore.computeNorm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NormCore.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input => s"$cls.MODULE$$.computeNorm($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormTextExpr =
    copy(child = newChild)
}

object NormTextExpr {
  def norm_text(c: Column): Column =
    ColumnBridge.column(NormTextExpr(ColumnBridge.expression(c)))
}

/** `tokens` (= split(norm_text, " ")) as one codegen pass — see
  * [[NormCore]]. */
case class NormTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NormCore.computeTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NormCore.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.computeTokens($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormTokens =
    copy(child = newChild)
}

object NormTokens {
  def norm_tokens(c: Column): Column =
    ColumnBridge.column(NormTokens(ColumnBridge.expression(c)))
}
