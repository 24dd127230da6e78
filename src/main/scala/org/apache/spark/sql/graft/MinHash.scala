package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature of whitespace-tokenized text: word
  * `n`-gram shingles are hashed incrementally from token FNV-1a hashes
  * (no shingle strings are materialized), each shingle contributes to
  * `k` seeded minima via splitmix64 remixing. Single tight Java loop —
  * the higher-order-function formulation walks interpreted lambda trees
  * per element; this expression is the codegen'd scale path, kept inside
  * whole-stage codegen via the reference-object pattern.
  *
  * Pair with banding for LSH dedup (Dedup.minhashLshCandidates).
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && k >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String].toString, n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSignature.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input.toString(), $n, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime  = 0x100000001b3L
  private final val Golden    = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — cheap independent hash family h_i(x). */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(text: String, n: Int, k: Int): ArrayData = {
    val minima = new Array[Long](k)
    java.util.Arrays.fill(minima, Long.MaxValue)
    val ring = new Array[Long](n) // last n token hashes
    var nTokens = 0
    var tokenHash = FnvOffset
    var inToken = false
    val len = text.length
    var i = 0
    while (i <= len) {
      val ws = i == len || Character.isWhitespace(text.charAt(i))
      if (!ws) {
        // lowercase inline so callers don't need a separate (regex)
        // normalization pass; hash UTF-16 code units (tokenization is
        // whitespace-only, so this is a consistent token identity)
        val c = Character.toLowerCase(text.charAt(i))
        tokenHash ^= (c & 0xffL); tokenHash *= FnvPrime
        tokenHash ^= ((c >> 8) & 0xffL); tokenHash *= FnvPrime
        inToken = true
      } else if (inToken) {
        ring(nTokens % n) = tokenHash
        nTokens += 1
        tokenHash = FnvOffset
        inToken = false
        if (nTokens >= n) {
          // combine the window's n token hashes order-sensitively
          var sh = Golden
          var j = nTokens - n
          while (j < nTokens) {
            sh = mix(sh ^ ring(j % n)) * FnvPrime
            j += 1
          }
          var h = 0
          while (h < k) {
            val v = mix(sh + Golden * h)
            if (v < minima(h)) minima(h) = v
            h += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(minima)
  }

  def minhash_signature(c: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), n, k))
}
