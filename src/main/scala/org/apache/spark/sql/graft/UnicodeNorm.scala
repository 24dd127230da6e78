package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization — the first transform a real crawl
  * pipeline applies to raw text (CCNet, C4 and the mC4 family all NFC-
  * or NFKC-normalize before any dedup key or quality signal is
  * computed, because `é` as U+00E9 and as `e`+U+0301 must hash, match
  * and count identically). Spark has no built-in for it; this wraps
  * `java.text.Normalizer` as a native unary expression so it stays
  * inside whole-stage codegen — no UDF, no serialization boundary.
  *
  * Parity contract: Java's Normalizer and DuckDB's `nfc_normalize`
  * (utf8proc) both implement the Unicode standard's canonical
  * composition, so the t_normalize gate can hash-compare outputs
  * cross-engine. The ASCII fast path (`isNormalized` is O(n) with no
  * allocation, and ASCII is always normalized) makes the expression
  * scan-speed on the overwhelmingly-ASCII fraction of a real corpus. */
object UnicodeNorm {

  /** Canonical composition (NFC). */
  def nfc(c: Column): Column =
    ColumnBridge.column(UnicodeNormalizeExpr(ColumnBridge.expression(c), "NFC"))

  /** Canonical decomposition (NFD) — the spec-side inverse probe. */
  def nfd(c: Column): Column =
    ColumnBridge.column(UnicodeNormalizeExpr(ColumnBridge.expression(c), "NFD"))

  def compute(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  private val cls = UnicodeNorm.getClass.getName.stripSuffix("$") + "$"

  case class UnicodeNormalizeExpr(child: Expression, formName: String)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StringType

    @transient private lazy val form = java.text.Normalizer.Form.valueOf(formName)

    override def nullSafeEval(s: Any): Any =
      compute(s.asInstanceOf[UTF8String], form)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fRef = ctx.addReferenceObj("normForm", form, "java.text.Normalizer.Form")
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = $cls.MODULE$$.compute($s, $fRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
      copy(child = newChild)
  }
}
