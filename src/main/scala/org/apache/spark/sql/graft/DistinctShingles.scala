package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word `n`-gram shingles of lowercased, whitespace-tokenized
  * text, produced in one pass (single tight loop; the higher-order
  * -function formulation runs interpreted lambdas per element plus a
  * regex normalization pass). Output order is first-occurrence — callers
  * using it for set operations (intersection sizes, counts) are
  * order-insensitive. Values are identical to
  * `array_distinct(graft.text.shingles(norm_text(c), n))`. */
case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DistinctShingles.compute(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DistinctShingles.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input.toString(), $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

object DistinctShingles {

  def compute(text: String, n: Int): ArrayData = {
    // tokenize (lowercased) in one scan
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    val sb = new java.lang.StringBuilder(16)
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || Character.isWhitespace(text.charAt(i))) {
        if (sb.length > 0) { tokens += sb.toString; sb.setLength(0) }
      } else sb.append(Character.toLowerCase(text.charAt(i)))
      i += 1
    }
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](tokens.length * 2)
    var s = 0
    while (s <= tokens.length - n) {
      val shingle = new java.lang.StringBuilder(32)
      var j = 0
      while (j < n) {
        if (j > 0) shingle.append(' ')
        shingle.append(tokens(s + j))
        j += 1
      }
      seen.add(shingle.toString)
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }

  def distinct_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(DistinctShingles(ColumnBridge.expression(c), n))
}
