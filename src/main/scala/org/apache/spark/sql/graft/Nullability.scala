package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** Identity expression whose only job is to override the `nullable`
  * flag Catalyst derives for its child — letting the user hand the
  * optimizer (or a downstream schema contract, e.g. Avro) a better
  * nullability fact than inference produced.
  *
  * Semantics follow the reference's nullability override
  * (reference: sql/custom/NullableHelper.scala:26-37): forcing
  * non-nullable adds a runtime guard — if a null does show up, fail
  * loudly rather than corrupt downstream assumptions.
  *
  * Codegen: pass-through of the child's generated code; the forced
  * non-nullable variant pins `isNull` to false after the guard so the
  * surrounding whole-stage codegen can drop its null checks.
  */
case class SetNullable(child: Expression, forcedNullable: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = forcedNullable

  private def nullViolation(): Nothing =
    throw new IllegalStateException(
      s"SetNullable(forcedNullable=false) encountered a NULL value in ${child.sql}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null && !forcedNullable) nullViolation()
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    if (forcedNullable) {
      ev.copy(code = c.code, isNull = c.isNull, value = c.value)
    } else {
      val ref = ctx.addReferenceObj("setNullable", this, classOf[SetNullable].getName)
      val guarded = c.code +
        code"""
           |if (${c.isNull}) {
           |  $ref.graftNullViolation();
           |}
           |""".stripMargin
      ev.copy(code = guarded, isNull = FalseLiteral, value = c.value)
    }
  }

  /** Called from generated code on violation. */
  def graftNullViolation(): Unit = nullViolation()

  override protected def withNewChildInternal(newChild: Expression): SetNullable =
    copy(child = newChild)
}

/** Column-level API over [[SetNullable]]
  * (reference: sql/custom/NullableHelper.scala:45-53). */
object Nullability {
  def makeNotNullable(data: Column): Column =
    ExpressionUtils.column(SetNullable(ExpressionUtils.expression(data), forcedNullable = false))
  def makeNullable(data: Column): Column =
    ExpressionUtils.column(SetNullable(ExpressionUtils.expression(data), forcedNullable = true))
}
