package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** Unary UDF whose result [[DataType]] is declared explicitly instead of
  * being derived from Scala types — the escape hatch Spark's typed UDF
  * API removed (reference: sql/custom/UnsafeUdf.scala:32-58). The caller
  * promises `f` returns values in the *Catalyst internal* representation
  * of `tgtDataType` (UTF8String for strings, micros for timestamps, …).
  *
  * Codegen embeds this instance as a reference object and calls
  * `nullSafeEval` from generated Java — one virtual call per row, but the
  * surrounding operators stay inside whole-stage codegen.
  */
case class UnsafeUnaryUdfExpression(
    child: Expression,
    f: Any => Any,
    tgtDataType: DataType) extends UnaryExpression {

  override def dataType: DataType = tgtDataType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = f(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unsafeUdf", this, classOf[UnsafeUnaryUdfExpression].getName)
    val boxed = CodeGenerator.boxedType(dataType)
    defineCodeGen(ctx, ev, input => s"($boxed) $ref.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnsafeUnaryUdfExpression =
    copy(child = newChild)
}

object UnsafeUdf {

  /** Wraps a plain `Any => Any` Scala function (operating on *external*
    * Scala values) with Catalyst↔Scala converters on both sides and
    * returns a `Column => Column` with the declared source/target types
    * (reference: sql/custom/UnsafeUdf.scala:51-58). */
  def unsafeUnaryUdf(f: Any => Any, srcType: DataType, tgtType: DataType): Column => Column = {
    val toScala    = CatalystTypeConverters.createToScalaConverter(srcType)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(tgtType)
    val g: Any => Any = v => toCatalyst(f(toScala(v)))
    (c: Column) =>
      ExpressionUtils.column(
        UnsafeUnaryUdfExpression(ExpressionUtils.expression(c), g, tgtType))
  }

  /** Raw variant: `f` must consume/produce Catalyst internal values. */
  def unsafeUnaryUdfInternal(f: Any => Any, tgtType: DataType): Column => Column =
    (c: Column) =>
      ExpressionUtils.column(
        UnsafeUnaryUdfExpression(ExpressionUtils.expression(c), f, tgtType))
}
