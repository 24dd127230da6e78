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
  * `DOUBLE[]`) keep hash-matching. Degenerate inputs also match the
  * fold: a null element, or length-mismatched dot operands (where
  * `zip_with` pads with null), make the result NULL — never a silent
  * partial sum.
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

  /** Boxed Double: null on length mismatch or null element (matching
    * the NULL the aggregate-over-zip_with fold produces). */
  def dotCompute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def normCompute(a: ArrayData, aFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
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
    override def nullable: Boolean = true // null on mismatch/null element

    private lazy val lFloat = isFloat(left.dataType)
    private lazy val rFloat = isFloat(right.dataType)

    override def nullSafeEval(a: Any, b: Any): Any =
      dotCompute(a.asInstanceOf[ArrayData], lFloat, b.asInstanceOf[ArrayData], rFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = VectorOps.getClass.getName.stripSuffix("$") + "$"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("dotRes")
        s"""java.lang.Double $r = $cls.MODULE$$.dotCompute($a, $lFloat, $b, $rFloat);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
           |""".stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  case class L2Norm(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(AcceptedArray)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // null on null element

    private lazy val cFloat = isFloat(child.dataType)

    override def nullSafeEval(a: Any): Any =
      normCompute(a.asInstanceOf[ArrayData], cFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = VectorOps.getClass.getName.stripSuffix("$") + "$"
      nullSafeCodeGen(ctx, ev, a => {
        val r = ctx.freshName("normRes")
        s"""java.lang.Double $r = $cls.MODULE$$.normCompute($a, $cFloat);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): L2Norm =
      copy(child = newChild)
  }
}
