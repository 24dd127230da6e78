package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-window MinHash machinery for span-level near dedup
  * ([[graft.dedup.Dedup.fuzzySpans]]). Two sibling expressions over the
  * doc's token array, one per plan branch, each emitting one struct per
  * stride-`stride` window of `window` tokens:
  *
  *  - [[MinHashWindowSigs]] → (nt, sig): the `k`-minima MinHash
  *    signature of the window's `n`-gram shingles — the BANDING branch.
  *  - [[WindowShingleSets]] → (nt, sh): the window's distinct shingle
  *    hashes in position order — the VERIFY branches.
  *
  * Split deliberately: the two run in DIFFERENT subtrees of the fuzzy-
  * spans plan (banding once, verify twice via the candidate semi-joins),
  * and a combined expression would recompute the k×positions signature
  * mixes in branches that only need shingle sets (measured 6.8 → 9.5 s
  * at sf0.1 when round 19 first fused them into one struct).
  *
  * Value-identical (MinHashWindowsSpec pins it) to the formulation they
  * replaced:
  *
  *   wt    = slice(t, wi*stride+1, window)
  *   wtext = concat_ws(" ", wt)
  *   sig   = MinHashSignature.minhash_signature(wtext, n, k)
  *   sh    = DistinctShingleHashes.distinct_shingle_hashes(wtext, n)
  *
  * EDGE SCOPE of that claim (round-19 advice): these expressions hash
  * the STAGED token array verbatim, while the old chain re-tokenized
  * the joined window text by Character.isWhitespace — so a document
  * whose norm-chain tokens include EMPTY tokens (tab/newline edges,
  * which NormTokens keeps) or tokens containing non-ASCII Unicode
  * whitespace gets different window token streams under the two
  * formulations. The staged-token semantics is the CONTRACT — it is
  * what the d_dup_spans_fuzzy oracle replays
  * (`string_split(norm, ' ')` sliced positionally, empties included) —
  * and MinHashWindowsSpec pins those edge documents on THIS
  * formulation against the gate oracle's slicing, not against the old
  * chain.
  *
  * The old chain materialized the window text and re-tokenized it per
  * window —
  * with stride < window every token was re-parsed window/stride times,
  * and the per-window token StringBuilders + shingle strings +
  * LinkedHashSet churn made the d_dup_spans_fuzzy corpus scan GC-bound
  * (117 s summed task GC at sf1). Here token hashes and per-position
  * shingle hashes are computed once per DOC and each window only takes
  * minima / dedups over its position slice.
  *
  * `sh` dedups by 64-bit VALUE where the old expression deduped by
  * shingle STRING — divergent only when two distinct shingles in one
  * 16-token window collide in 64 bits (~14²/2⁶⁵ per window), the
  * repo's standing shingle-hash collision argument.
  */
object MinHashWindowsCore {

  // MinHashSignature's constants — the signatures must stay
  // bit-identical to that expression's output on the window text
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime  = 0x100000001b3L
  private final val Golden    = 0x9e3779b97f4a7c15L
  private final val XxSeed    = 42L

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a over the LOWERCASED UTF-16 code units of a token — exactly
    * the token hash MinHashSignature.compute derives when it re-parses
    * the window text (tokens coming out of `tokens(text)` are already
    * lowercase, and lowercasing is idempotent). */
  private def fnvToken(t: UTF8String): Long = {
    val s = t.toString
    var h = FnvOffset
    var i = 0
    val len = s.length
    while (i < len) {
      val c = Character.toLowerCase(s.charAt(i))
      h ^= (c & 0xffL); h *= FnvPrime
      h ^= ((c >> 8) & 0xffL); h *= FnvPrime
      i += 1
    }
    h
  }

  private def nWindows(len: Int, window: Int, stride: Int): Int =
    (math.max(len - window, 0) / stride) + 1

  /** (nt, sig) per window — see [[MinHashWindowSigs]]. */
  def computeSigs(tokens: ArrayData, window: Int, stride: Int, n: Int,
      k: Int): ArrayData = {
    val len = tokens.numElements()
    val nWin = nWindows(len, window, stride)
    val tokFnv = new Array[Long](len)
    var i = 0
    while (i < len) {
      tokFnv(i) = fnvToken(tokens.getUTF8String(i))
      i += 1
    }
    // per-position combined shingle hash (order-sensitive mix chain)
    val nPos = math.max(len - n + 1, 0)
    val fnvSh = new Array[Long](nPos)
    var p = 0
    while (p < nPos) {
      var sh = Golden
      var j = 0
      while (j < n) {
        sh = mix(sh ^ tokFnv(p + j)) * FnvPrime
        j += 1
      }
      fnvSh(p) = sh
      p += 1
    }
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val s0 = w * stride
      val nt = math.min(window, len - s0)
      val pEnd = s0 + nt - n
      val minima = new Array[Long](k)
      java.util.Arrays.fill(minima, Long.MaxValue)
      var pp = s0
      while (pp <= pEnd && pp < nPos) {
        val base = fnvSh(pp)
        var h = 0
        while (h < k) {
          val v = mix(base + Golden * h)
          if (v < minima(h)) minima(h) = v
          h += 1
        }
        pp += 1
      }
      out(w) = InternalRow(nt, new GenericArrayData(minima))
      w += 1
    }
    new GenericArrayData(out)
  }

  /** (nt, sh) per window — see [[WindowShingleSets]]. */
  def computeShingleSets(tokens: ArrayData, window: Int, stride: Int,
      n: Int): ArrayData = {
    val len = tokens.numElements()
    val nWin = nWindows(len, window, stride)
    val tokBytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      tokBytes(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    val nPos = math.max(len - n + 1, 0)
    val xxSh = new Array[Long](nPos)
    var buf = new Array[Byte](64)
    var p = 0
    while (p < nPos) {
      var blen = 0
      var j = 0
      while (j < n) {
        val tb = tokBytes(p + j)
        val need = blen + tb.length + 1
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
        if (j > 0) { buf(blen) = ' '; blen += 1 }
        System.arraycopy(tb, 0, buf, blen, tb.length)
        blen += tb.length
        j += 1
      }
      xxSh(p) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, blen, XxSeed)
      p += 1
    }
    val out = new Array[Any](nWin)
    val dedup = new Array[Long](window) // ≤ window−n+1 distinct per window
    var w = 0
    while (w < nWin) {
      val s0 = w * stride
      val nt = math.min(window, len - s0)
      val pEnd = s0 + nt - n
      var nDedup = 0
      var pp = s0
      while (pp <= pEnd && pp < nPos) {
        val x = xxSh(pp)
        var d = 0
        var found = false
        while (d < nDedup && !found) { found = dedup(d) == x; d += 1 }
        if (!found) { dedup(nDedup) = x; nDedup += 1 }
        pp += 1
      }
      out(w) = InternalRow(nt,
        new GenericArrayData(java.util.Arrays.copyOf(dedup, nDedup)))
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-window (nt, sig) structs — the banding-branch half of
  * [[MinHashWindowsCore]]; see that scaladoc. */
case class MinHashWindowSigs(child: Expression, window: Int, stride: Int,
    n: Int, k: Int) extends UnaryExpression with ExpectsInputTypes {

  require(window > stride && n <= window && k >= 1)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nt", IntegerType, nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false),
      nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashWindowsCore.computeSigs(input.asInstanceOf[ArrayData],
      window, stride, n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashWindowsCore.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.computeSigs(" +
        s"$input, $window, $stride, $n, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashWindowSigs =
    copy(child = newChild)
}

object MinHashWindowSigs {
  def minhash_window_sigs(c: Column, window: Int, stride: Int, n: Int,
      k: Int): Column =
    ColumnBridge.column(MinHashWindowSigs(ColumnBridge.expression(c),
      window, stride, n, k))
}

/** Per-window (nt, sh) structs — the verify-branch half of
  * [[MinHashWindowsCore]]; see that scaladoc. */
case class WindowShingleSets(child: Expression, window: Int, stride: Int,
    n: Int) extends UnaryExpression with ExpectsInputTypes {

  require(window > stride && n <= window)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nt", IntegerType, nullable = false),
    StructField("sh", ArrayType(LongType, containsNull = false),
      nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashWindowsCore.computeShingleSets(input.asInstanceOf[ArrayData],
      window, stride, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashWindowsCore.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.computeShingleSets(" +
        s"$input, $window, $stride, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowShingleSets =
    copy(child = newChild)
}

object WindowShingleSets {
  def window_shingle_sets(c: Column, window: Int, stride: Int,
      n: Int): Column =
    ColumnBridge.column(WindowShingleSets(ColumnBridge.expression(c),
      window, stride, n))
}
