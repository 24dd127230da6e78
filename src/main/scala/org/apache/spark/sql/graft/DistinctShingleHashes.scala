package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 of every distinct word `n`-gram shingle, in one pass —
  * value-identical to `transform(distinct_shingles(c, n), xxhash64)`
  * (seed 42, the builtin's default) but produced by a single tight loop
  * with no interpreted higher-order lambda and no shingle-string column
  * ever leaving the expression.
  *
  * This is the CACHE-NARROWING form of [[DistinctShingles]]: a pipeline
  * that stages per-doc shingle sets into a persisted frame (e.g.
  * `LlmOps.pipelineE2e` stage 1) stores a primitive long array instead
  * of repeated text, so downstream set intersections (near-dup verify,
  * decontamination joins) read packed longs from the columnar cache
  * rather than re-tokenizing strings. Set sizes and intersection sizes
  * — hence jaccard values and containment flags — are unchanged unless
  * two distinct shingles in the SAME compared pair collide in 64 bits
  * (p ≈ |set|²/2⁶⁴ per pair; vanishing even at 100 TB, where a corpus
  * of 10¹² docs × ~10³ shingles would see a handful of spurious
  * per-pair collisions corpus-WIDE — noise far below the detector's own
  * banding recall).
  */
case class DistinctShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DistinctShingleHashes.compute(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DistinctShingleHashes.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input.toString(), $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctShingleHashes =
    copy(child = newChild)
}

object DistinctShingleHashes {

  /** Seed of the builtin `xxhash64` function — parity with
    * `xxhash64(shingle)` lets these hashes join against indexes built
    * the string way (Dedup.shingleIndex). */
  private final val Seed = 42L

  def compute(text: String, n: Int): ArrayData = {
    // tokenize (lowercased) in one scan — same loop as DistinctShingles
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
    if (tokens.length < n) return new GenericArrayData(Array.empty[Long])
    // distinct on the STRING shingle (not its hash): a 64-bit collision
    // must not drop a set element, only equality downstream may merge
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
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) {
      val u = UTF8String.fromString(it.next())
      out(idx) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, Seed)
      idx += 1
    }
    new GenericArrayData(out)
  }

  def distinct_shingle_hashes(c: Column, n: Int): Column =
    ColumnBridge.column(DistinctShingleHashes(ColumnBridge.expression(c), n))
}
