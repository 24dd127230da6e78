package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Every word `n`-gram of a token array, in one pass — value-identical
  * to `graft.text.shingles_from(t, n)` (AllShinglesSpec pins it: space-
  * joined, position order, multiplicity kept, empty array under `n`
  * tokens), whose `transform(sequence(...), i => concat_ws(...))`
  * formulation interprets a lambda and re-slices per position. The
  * UTF8String concat builds each shingle directly from the token
  * buffers (round-19 optimization — the bigram/gram frequency gates
  * evaluate this per corpus occurrence, twice per plan). */
case class AllShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    AllShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AllShingles.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): AllShingles =
    copy(child = newChild)
}

object AllShingles {

  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = tokens.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - n + 1)
    var s = 0
    while (s <= len - n) {
      var sh = toks(s)
      var j = 1
      while (j < n) {
        sh = UTF8String.concat(sh, Space, toks(s + j))
        j += 1
      }
      out(s) = sh
      s += 1
    }
    new GenericArrayData(out)
  }

  def all_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(AllShingles(ColumnBridge.expression(c), n))
}
