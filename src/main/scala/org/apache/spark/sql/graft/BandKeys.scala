package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** All `bands` LSH band keys of a MinHash signature in one pass:
  * `out(b) = hash(slice(sig, b*rows+1, rows), b)` — BIT-IDENTICAL to
  * the builtin `hash(...)` (Murmur3, seed 42, elements folded in
  * order, then the band index) the banding paths used via
  * `transform(sequence(0, bands−1), b => hash(slice(sig, ...), b))`
  * (BandKeysSpec pins the equality), so candidate sets are unchanged
  * byte for byte. The HOF form interpreted its lambda per band and
  * allocated a `rows`-element slice array per band per signature —
  * 32 interpreted calls + 32 allocations per window/doc on the hot
  * dedup paths; here it is one tight loop over the signature buffer.
  * `posexplode` of the result yields exactly the (band, bkey) pair
  * the bucket self-joins key on. */
case class BandKeys(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bands >= 1 && rows >= 1)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BandKeys.compute(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BandKeys.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input, $bands, $rows)")
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

object BandKeys {

  /** Seed of the builtin `hash()` expression. */
  private final val Seed = 42

  def compute(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Int](bands)
    val n = sig.numElements()
    var b = 0
    while (b < bands) {
      var h = Seed
      var j = b * rows
      val end = math.min(j + rows, n) // slice truncates at the array end
      while (j < end) {
        h = Murmur3_x86_32.hashLong(sig.getLong(j), h)
        j += 1
      }
      h = Murmur3_x86_32.hashInt(b, h)
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def band_keys(c: Column, bands: Int, rows: Int): Column =
    ColumnBridge.column(BandKeys(ColumnBridge.expression(c), bands, rows))
}
