package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd IVF centroid argmax: for one embedding, the cell id of the
  * nearest centroid by round(cosine, 9), ties to the HIGHER cell id —
  * the exact semantics of the higher-order-function formulation it
  * replaces (`array_max(transform(seeds, sd => struct(round(cosine(vec,
  * cvec), 9), cell_id))).getField("cell_id")`), which walked an
  * interpreted lambda tree and allocated a struct per (row, seed): fine
  * at the gate's 16 cells, a real cost at the production cell counts
  * (k in the thousands — the SemDeDup regime where k ≈ n / targetCellSize).
  *
  * The centroid matrix is a REFERENCE OBJECT in the generated code, not
  * a per-row broadcast column: the caller collects the dimension-sized
  * seed table once (k vectors — tiny by contract, the same
  * dimension-sized-by-definition shape as batchTopK's query set) and the
  * expression closes over `cells`/`centroids`/precomputed centroid
  * norms. Per row the work is one vector-norm pass plus k dots in one
  * tight loop — no per-seed ArrayData views, no struct churn.
  *
  * Parity contract with the HOF formulation (spec'd value-equal):
  *  - cosine = dot(vec, c) / (‖vec‖·‖c‖), accumulated left-to-right in
  *    array order, floats widened to double first (identical IEEE
  *    sequence to [[VectorOps]], whose compute helpers this reuses);
  *  - round follows Spark's Round on doubles: NaN/Inf pass through,
  *    else HALF_UP at scale 9;
  *  - comparison follows Spark's SQL ordering on struct(double, long):
  *    a null similarity (null vector element or dimension mismatch)
  *    sorts below every value, NaN (a zero-norm side) above every
  *    non-NaN, −0.0 == 0.0; equal similarities tie to the higher cell;
  *  - an empty seed set yields NULL (array_max of an empty array).
  */
object NearestCentroid {

  private val AcceptedArray = TypeCollection(
    ArrayType(FloatType, containsNull = false),
    ArrayType(DoubleType, containsNull = false),
    ArrayType(FloatType, containsNull = true),
    ArrayType(DoubleType, containsNull = true))

  def nearest_centroid(vec: Column, cells: Array[Long],
      centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidExpr(
      ColumnBridge.expression(vec), cells, centroids))

  /** Spark Round-on-double semantics: NaN/Inf unchanged, else HALF_UP. */
  private def round9(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark SQL double ordering: −0.0 == 0.0, NaN greatest. */
  private def cmpDouble(a: Double, b: Double): Int =
    if (a == b) 0
    else if (a.isNaN) { if (b.isNaN) 0 else 1 }
    else if (b.isNaN) -1
    else java.lang.Double.compare(a, b)

  /** Boxed cell id of the argmax seed; null iff the seed set is empty.
    * `norms` carries the precomputed centroid L2 norms (same fold as
    * [[VectorOps.normCompute]], done once at expression construction).
    * A null matrix row (centroid with a null element) yields a null
    * similarity — sorting below every real value, like the HOF
    * formulation's null cosine. */
  def assignCompute(vec: ArrayData, vecFloat: Boolean, cells: Array[Long],
      cents: Array[Array[Double]], norms: Array[Double]): java.lang.Long = {
    if (cells.length == 0) return null
    val n = vec.numElements()
    // vector norm once per row; null element → null cosine for EVERY
    // seed → the tie-break alone decides (highest cell id)
    var vecNorm: java.lang.Double = 0.0
    var acc = 0.0
    var i = 0
    while (i < n && vecNorm != null) {
      if (vec.isNullAt(i)) vecNorm = null
      else {
        val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        acc += x * x
      }
      i += 1
    }
    val nv = if (vecNorm == null) null else java.lang.Double.valueOf(math.sqrt(acc))
    var bestS: java.lang.Double = null
    var bestCell = 0L
    var has = false
    var s = 0
    while (s < cells.length) {
      val c = cents(s)
      val sim: java.lang.Double =
        if (c == null || nv == null || c.length != n) null
        else {
          var d = 0.0
          var j = 0
          while (j < n) {
            val x = if (vecFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
            d += x * c(j)
            j += 1
          }
          round9(d / (nv.doubleValue() * norms(s)))
        }
      val better =
        if (!has) true
        else if (sim == null) bestS == null && cells(s) > bestCell
        else if (bestS == null) true
        else {
          val cmp = cmpDouble(sim.doubleValue(), bestS.doubleValue())
          cmp > 0 || (cmp == 0 && cells(s) > bestCell)
        }
      if (better) { bestS = sim; bestCell = cells(s); has = true }
      s += 1
    }
    bestCell
  }

  case class NearestCentroidExpr(child: Expression, cells: Array[Long],
      centroids: Array[Array[Double]])
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(AcceptedArray)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true // null input or empty seed set

    private def isFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    @transient private lazy val norms: Array[Double] =
      centroids.map { c =>
        if (c == null) Double.NaN // unused: a null row short-circuits to null sim
        else {
          var acc = 0.0
          var i = 0
          while (i < c.length) { acc += c(i) * c(i); i += 1 }
          math.sqrt(acc)
        }
      }

    override def nullSafeEval(a: Any): Any =
      assignCompute(a.asInstanceOf[ArrayData], isFloat, cells, centroids, norms)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = NearestCentroid.getClass.getName.stripSuffix("$") + "$"
      val cellsRef = ctx.addReferenceObj("cells", cells, "long[]")
      val centsRef = ctx.addReferenceObj("cents", centroids, "double[][]")
      val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val r = ctx.freshName("cellRes")
        s"""java.lang.Long $r = $cls.MODULE$$.assignCompute($a, $isFloat, $cellsRef, $centsRef, $normsRef);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
      copy(child = newChild)
  }
}
