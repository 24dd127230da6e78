package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for the similarity operators.
  *
  * The higher-order-function formulation (`aggregate` over `zip_with`)
  * is CodegenFallback in Spark: every element walks an interpreted
  * lambda tree and `zip_with` allocates a struct array per row — and a
  * filter-over-projection evaluates the whole fold twice. These
  * expressions run the same arithmetic as ONE tight Java loop inside
  * whole-stage codegen.
  *
  * Determinism contract: the loop accumulates left-to-right in array
  * order, each element widened to double first — the exact IEEE
  * operation sequence of the HOF fold it replaces, so results are
  * bit-identical and the DuckDB oracles (`list_dot_product` on
  * `DOUBLE[]`) keep hash-matching. Null elements are not supported
  * (embedding columns are containsNull-free).
  */
object VectorOps {

  private val AcceptedArray = TypeCollection(
    ArrayType(FloatType, containsNull = false),
    ArrayType(DoubleType, containsNull = false),
    ArrayType(FloatType, containsNull = true),
    ArrayType(DoubleType, containsNull = true))

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Σ aᵢ·bᵢ in array order as double. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** √(Σ aᵢ²) in array order as double. */
  def l2norm(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))

  def dotCompute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def normCompute(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(AcceptedArray, AcceptedArray)
    override def dataType: DataType = DoubleType

    private lazy val lFloat = isFloat(left.dataType)
    private lazy val rFloat = isFloat(right.dataType)

    override def nullSafeEval(a: Any, b: Any): Any =
      dotCompute(a.asInstanceOf[ArrayData], lFloat, b.asInstanceOf[ArrayData], rFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = VectorOps.getClass.getName.stripSuffix("$") + "$"
      defineCodeGen(ctx, ev, (a, b) =>
        s"$cls.MODULE$$.dotCompute($a, $lFloat, $b, $rFloat)")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  case class L2Norm(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(AcceptedArray)
    override def dataType: DataType = DoubleType

    private lazy val cFloat = isFloat(child.dataType)

    override def nullSafeEval(a: Any): Any =
      normCompute(a.asInstanceOf[ArrayData], cFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = VectorOps.getClass.getName.stripSuffix("$") + "$"
      defineCodeGen(ctx, ev, a => s"$cls.MODULE$$.normCompute($a, $cFloat)")
    }

    override protected def withNewChildInternal(newChild: Expression): L2Norm =
      copy(child = newChild)
  }
}
