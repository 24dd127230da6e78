package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit md5 hash
  * (`conv(substring(md5(cast(v as binary)), 1, 15), 16, 10)` —
  * [[graft.sketch.Sketch.hash60]]) computed straight from the digest
  * bytes: one thread-local MessageDigest update over the value's UTF-8
  * bytes, then the first 60 bits of the digest as a non-negative Long.
  * Value-identical to the builtin chain (the first 15 lowercase-hex
  * chars ARE the digest's first 60 bits, big-endian), but skips the
  * 32-char hex-string materialization, the substring copy and the
  * base-16 string parse — the chain showed up as the top CPU cost of
  * every sketch-family gate (CMS/KMV/Bloom/hashed-n-gram features),
  * which hash per TOKEN or per GRAM at corpus scale.
  *
  * `prefix` is prepended to the hashed bytes (UTF-8) — the fused form
  * of the `hash60(concat(lit(seed + "|"), v))` seeding convention used
  * by [[graft.sketch.Sketch.cmsBucket]] / `bloomPos`, saving the
  * per-row concat allocation. Empty prefix = plain hash60.
  */
case class Hash60(child: Expression, prefix: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Hash60.compute(input.asInstanceOf[UTF8String],
      Hash60.prefixBytes(prefix))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Hash60.getClass.getName.stripSuffix("$") + "$"
    // hoist the constant prefix bytes out of the per-row path
    val pre = ctx.addReferenceObj("hash60prefix",
      Hash60.prefixBytes(prefix), "byte[]")
    defineCodeGen(ctx, ev, input =>
      s"$cls.MODULE$$.compute($input, $pre)")
  }

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def prefixBytes(prefix: String): Array[Byte] =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** First 60 bits of md5(prefix ++ utf8-bytes(v)) as a non-negative
    * Long — exactly `conv(substring(md5hex, 1, 15), 16, 10)`: 15 hex
    * chars = the digest's first 7.5 bytes, big-endian. */
  def compute(v: UTF8String, prefix: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    if (prefix.length > 0) md.update(prefix)
    md.update(v.getBytes)
    val d = md.digest()
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  def hash60(c: Column): Column =
    ColumnBridge.column(Hash60(ColumnBridge.expression(c), ""))

  /** hash60 of `seed.toString + "|" + v` without the per-row concat. */
  def hash60Seeded(c: Column, seed: Int): Column =
    ColumnBridge.column(Hash60(ColumnBridge.expression(c), s"$seed|"))
}
