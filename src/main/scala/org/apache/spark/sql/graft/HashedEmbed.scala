package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** In-pipe EMBEDDING GENERATION: a deterministic hashed
  * random-projection featurizer turning a token array into a
  * `dims`-long integer vector — e_d = Σ_tokens sign(d, token), with
  * sign(d, t) = +1 iff the first hex char of md5("d:t") is in '0'..'7'
  * (the high bit of the first digest byte) — the
  * [[PortableCosineLshKeys]] md5-sign-plane discipline applied to a
  * hashed bag-of-words feature space (signed random projection of the
  * token-count vector; Achlioptas-style ±1 planes). Every component is
  * an exact INTEGER, so a DuckDB oracle replays the embedding
  * bit-for-bit (`CASE WHEN substr(md5(d || ':' || tok), 1, 1) BETWEEN
  * '0' AND '7' THEN 1 ELSE -1 END` summed per doc/dim), and the
  * documented ONNX mapPartitions slot (Multimodal) gets an
  * oracle-able stand-in: the pipeline shape downstream — index,
  * retrieve, dedup — is identical whichever encoder fills the column.
  *
  * Scale shape: map-only, one pass over each row's tokens; per-token
  * sign vectors are md5-derived and cached in a bounded
  * executor-static map (vocabulary-scale entries; past the cap the
  * signs are recomputed — correctness never depends on the cache).
  * Null token elements contribute zero (the empty-token convention of
  * bpe_count); a null array yields null. */
case class HashedEmbedExpr(child: Expression, dims: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dims >= 1 && dims <= 4096, s"bad embedding dims: $dims")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    HashedEmbed.compute(a.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HashedEmbed.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, a =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($a, $dims)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedEmbedExpr =
    copy(child = newChild)
}

object HashedEmbed {

  def hashed_embed(tokens: Column, dims: Int): Column =
    ColumnBridge.column(HashedEmbedExpr(ColumnBridge.expression(tokens), dims))

  /** Per-(dims, token) ±1 sign vectors. Bounded: past [[CacheCap]]
    * entries new tokens are computed uncached — an unbounded token
    * space (the 100 TB case) cannot OOM an executor through this map. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Array[Byte]]()
  private val CacheCap = 1 << 20

  private def signsOf(dims: Int, tok: String): Array[Byte] = {
    val key = (dims, tok)
    val hit = cache.get(key)
    if (hit != null) return hit
    val md = java.security.MessageDigest.getInstance("MD5")
    val s = new Array[Byte](dims)
    var d = 0
    while (d < dims) {
      md.reset()
      val digest = md.digest(
        (d.toString + ":" + tok).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first hex char in '0'..'7'  ==  high bit of byte 0 clear
      s(d) = if ((digest(0) & 0x80) == 0) 1 else -1
      d += 1
    }
    if (cache.size < CacheCap) cache.put(key, s)
    s
  }

  def compute(tokens: ArrayData, dims: Int): ArrayData = {
    val acc = new Array[Long](dims)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val sg = signsOf(dims, tokens.getUTF8String(i).toString)
        var d = 0
        while (d < dims) { acc(d) += sg(d); d += 1 }
      }
      i += 1
    }
    new GenericArrayData(acc.map(_.asInstanceOf[Any]))
  }
}
