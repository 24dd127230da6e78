package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused HLL register + rank (round-20 optimization): the builtin
  * chain ([[graft.sketch.Sketch.hllRegister]]/`hllRank`, kept as the
  * spec reference and the oracle-SQL template) computed TWO md5 hex
  * strings per value — one for the register
  * (`conv(substring(md5hex,1,2),16,10)`), one for the rank (a
  * regexp_extract leading-zero count over hex chars 3..17 plus a
  * 16-way CASE) — per OCCURRENCE of the value stream. This expression
  * computes both from ONE digest:
  *
  *  - register = the digest's first byte (hex chars 1–2);
  *  - rank = leading-zero BITS of the digest's next 60 bits
  *    (hex chars 3–17) + 1, capped at
  *    [[graft.sketch.Sketch.HllRankCap]] — `lz_hex_chars·4 + extra`
  *    IS the bit-level leading-zero count (each leading '0' hex char
  *    is 4 zero bits; the first non-zero char contributes 3/2/1/0 for
  *    1 / 2–3 / 4–7 / 8–f), and an all-zero 60-bit tail (61) caps to
  *    50 exactly like the hex form.
  *
  * Value-identical (HllRegRankSpec fuzzes it against the builtin
  * chain). Serves t_hll_distinct and st_hll_stream.
  */
object HllRegRank {

  val RankCap = 50

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** (register, rank) of a value, from one md5 digest. */
  def compute(v: UTF8String): GenericInternalRow = {
    val md = digests.get()
    md.reset()
    md.update(v.getBytes)
    val d = md.digest()
    val reg = d(0) & 0xff
    // bits 8..67 of the digest = hex chars 3..17 = the 60-bit rank tail
    var acc = 0L
    var i = 1
    while (i < 9) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    val v60 = acc >>> 4
    val lzBits =
      if (v60 == 0L) 60 else java.lang.Long.numberOfLeadingZeros(v60) - 4
    val rank = math.min(lzBits + 1, RankCap)
    new GenericInternalRow(Array[Any](reg, rank))
  }

  def hll_reg_rank(c: Column): Column =
    ColumnBridge.column(HllRegRankExpr(ColumnBridge.expression(c)))
}

/** `hll_reg_rank` — struct(r: int, rank: int), one digest per value. */
case class HllRegRankExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("r", IntegerType, nullable = false),
    StructField("rank", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    HllRegRank.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HllRegRank.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(org.apache.spark.sql.catalyst.expressions.GenericInternalRow) " +
        s"$cls.MODULE$$.compute($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): HllRegRankExpr =
    copy(child = newChild)
}
