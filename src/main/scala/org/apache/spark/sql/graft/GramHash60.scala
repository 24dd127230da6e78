package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-position 60-bit gram hashes of a token array, one digest pass
  * per gram with NO gram-string materialization:
  * `out(i) = hash60(t(i) + " " + ... + t(i+n-1))` for i in
  * [0, len−n], empty array when the doc is shorter than `n` — value-
  * identical to the HOF formulation
  * `transform(sequence(0, size(t)−n), i => hash60(concat_ws(" ",
  * slice(t, i+1, n))))` (GramHashSpec pins the equality), which
  * interpreted a lambda per position and allocated slice + joined
  * string + md5-hex per gram. The digest consumes the tokens' UTF-8
  * bytes directly (space separators interleaved), so per gram the only
  * work is one md5 over ~gram bytes.
  *
  * This is the span-dedup gram key (d_dup_spans / t_pipeline_spans):
  * the 60-bit key's cross-doc collision odds follow the repo's
  * shingle-hash argument (DistinctShingleHashes) — a false duplicated
  * gram needs two distinct grams in different docs to collide in 60
  * bits, ~G²/2⁶¹ corpus-wide.
  */
case class GramHash60s(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramHash60s.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GramHash60s.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramHash60s =
    copy(child = newChild)
}

object GramHash60s {

  private val Space = Array[Byte](' ')

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    // token bytes fetched once, reused by the n grams that contain them
    val tb = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      tb(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](len - n + 1)
    var s = 0
    while (s <= len - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        md.update(tb(s + j))
        j += 1
      }
      val d = md.digest()
      var acc = 0L
      var k = 0
      while (k < 8) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
      out(s) = acc >>> 4
      s += 1
    }
    new GenericArrayData(out)
  }

  def gram_hash60s(c: Column, n: Int): Column =
    ColumnBridge.column(GramHash60s(ColumnBridge.expression(c), n))
}

/** Positional token hashes: `out(i) = hash60(i + "|" + t(i))` over the
  * whole token array — value-identical to
  * `transform(t, (tok, i) => hash60(concat(i.cast("string"), "|",
  * tok)))` (GramHashSpec pins it), the t_pipeline_spans `ph` column,
  * without the per-token lambda interpretation and concat/hex churn. */
case class PosTokenHash60s(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PosTokenHash60s.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PosTokenHash60s.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): PosTokenHash60s =
    copy(child = newChild)
}

object PosTokenHash60s {

  def compute(tokens: ArrayData): ArrayData = {
    val len = tokens.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](len)
    var i = 0
    while (i < len) {
      md.reset()
      // ASCII digits of the 0-based index, then '|', then token bytes
      md.update(String.valueOf(i).getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      md.update('|'.toByte)
      md.update(tokens.getUTF8String(i).getBytes)
      val d = md.digest()
      var acc = 0L
      var k = 0
      while (k < 8) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
      out(i) = acc >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  def pos_token_hash60s(c: Column): Column =
    ColumnBridge.column(PosTokenHash60s(ColumnBridge.expression(c)))
}
