package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Map-side Bloom membership probe against a BROADCAST dense bitmap:
  * true iff ALL `k` positions `hash60(i || "|" || v) % m` (the
  * [[graft.sketch.Sketch.bloomPos]] convention — bit-identical to the
  * SQL oracles) are set. Replaces, for broadcastable filters, the
  * probe shape `posexplode(k positions) → join(bit table) →
  * groupBy(count == k)`, which multiplied the probe stream k× and paid
  * a join + an extra aggregation per probed value — per-GRAM probes
  * (t_decontam_bloom) made that the gate's dominant cost. The k
  * seeded digests reuse [[Hash60]]'s thread-local MessageDigest; the
  * bitmap rides a Spark broadcast so the task binary carries a handle,
  * not the bits.
  *
  * No false negatives, FPR = fill^k — exactly the set-bit-table
  * semantics, because the bitmap IS the set-bit table in dense form.
  * Callers must gate on [[graft.sketch.Sketch.BloomBitmapMaxBits]];
  * past that the position-keyed shuffle join (the sharded-Bloom
  * deployment shape) remains the scale path.
  */
case class BloomHitExpr(child: Expression, words: Broadcast[Array[Long]],
    m: Long, k: Int) extends UnaryExpression with ExpectsInputTypes {

  require(m >= 1 && k >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType

  @transient private lazy val prefixes = BloomHitExpr.seedPrefixes(k)

  override def nullSafeEval(input: Any): Any =
    BloomHitExpr.contains(input.asInstanceOf[UTF8String], words.value,
      m, prefixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BloomHitExpr.getClass.getName.stripSuffix("$") + "$"
    val bcRef = ctx.addReferenceObj("bloomBitmap", words,
      classOf[Broadcast[Array[Long]]].getName)
    val preRef = ctx.addReferenceObj("bloomPrefixes",
      BloomHitExpr.seedPrefixes(k), "byte[][]")
    defineCodeGen(ctx, ev, input =>
      s"$cls.MODULE$$.contains($input, (long[]) $bcRef.value(), ${m}L, $preRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHitExpr =
    copy(child = newChild)
}

object BloomHitExpr {

  def seedPrefixes(k: Int): Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i|".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII))

  def contains(v: UTF8String, words: Array[Long], m: Long,
      prefixes: Array[Array[Byte]]): Boolean = {
    var i = 0
    while (i < prefixes.length) {
      val pos = Hash60.compute(v, prefixes(i)) % m
      if (((words((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }

  def bloom_hit(c: Column, words: Broadcast[Array[Long]], m: Long,
      k: Int): Column =
    ColumnBridge.column(BloomHitExpr(ColumnBridge.expression(c), words, m, k))
}
