package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd unigram-LM (SentencePiece-family) segmentation: encode a
  * word as the MINIMUM-COST piece sequence under a fixed
  * integer-scored piece vocabulary — Viterbi over piece boundaries,
  * the other production tokenizer family beside BPE ([[BpeTokens]]).
  * Greedy longest-match is NOT optimal under a scored vocabulary (the
  * spec plants a word where they differ); the DP is.
  *
  * The vocabulary rides the generated code as a REFERENCE OBJECT (the
  * [[BpeTokens]] / [[NearestCentroid]] pattern): the caller passes the
  * driver-held (piece, cost) table — vocabulary-sized by contract —
  * and each row pays O(len · maxPieceLen) hash probes, no UDF, no
  * broadcast-join, no per-piece HOF tree walk.
  *
  * Parity contract (replayed by the DuckDB oracle's recursive-CTE DP):
  *  - positions are Unicode code points (the same unit as DuckDB's
  *    character slicing `word[a:b]`);
  *  - dp[i] = min over j in [i − maxPieceLen, i) of dp[j] +
  *    cost(word[j..i)); a single code point absent from the
  *    vocabulary costs `unkCost` (the OOV floor), a longer absent
  *    piece is not a candidate;
  *  - ties prefer the SMALLEST j (the longest final piece) — the
  *    deterministic tie-break both engines express as ORDER BY
  *    (cost, j);
  *  - backtracking from dp[n] yields the piece sequence; cost
  *    arithmetic is all Long (no floats anywhere, the reason the
  *    scores are integers in the first place). */
object UnigramTokens {

  def unigram_encode(word: Column, pieces: Seq[(String, Long)],
      unkCost: Long): Column =
    ColumnBridge.column(UnigramEncodeExpr(ColumnBridge.expression(word),
      pieces.map(_._1), pieces.map(_._2), unkCost))

  def unigram_count(tokens: Column, pieces: Seq[(String, Long)],
      unkCost: Long): Column =
    ColumnBridge.column(UnigramCountExpr(ColumnBridge.expression(tokens),
      pieces.map(_._1), pieces.map(_._2), unkCost))

  private val Inf = java.lang.Long.MAX_VALUE / 4

  /** Viterbi segmentation of one word; shared by codegen and eval. */
  def segmentSyms(word: String, hm: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, unkCost: Long): Array[String] = {
    // split into code-point symbols (the DuckDB character unit)
    var n = 0
    var i = 0
    while (i < word.length) { i += Character.charCount(word.codePointAt(i)); n += 1 }
    val cps = new Array[String](n)
    i = 0; n = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      cps(n) = word.substring(i, i + cc)
      i += cc; n += 1
    }
    val dp = new Array[Long](n + 1)
    val bk = new Array[Int](n + 1)
    dp(0) = 0L; bk(0) = -1
    i = 1
    while (i <= n) {
      var best = Inf
      var bj = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (dp(j) < Inf) {
          val sb = new java.lang.StringBuilder
          var k = j
          while (k < i) { sb.append(cps(k)); k += 1 }
          val pc = hm.get(sb.toString)
          val c =
            if (pc != null) dp(j) + pc.longValue
            else if (i - j == 1) dp(j) + unkCost
            else Inf
          // strict < with j ascending keeps the smallest j on ties
          if (c < best) { best = c; bj = j }
        }
        j += 1
      }
      dp(i) = best; bk(i) = bj
      i += 1
    }
    // backtrack (every position is reachable: a single code point is
    // always a candidate via the vocabulary or the OOV floor)
    var cnt = 0
    var pos = n
    while (pos > 0) { pos = bk(pos); cnt += 1 }
    val out = new Array[String](cnt)
    pos = n
    var o = cnt - 1
    while (pos > 0) {
      val j = bk(pos)
      val sb = new java.lang.StringBuilder
      var k = j
      while (k < pos) { sb.append(cps(k)); k += 1 }
      out(o) = sb.toString
      o -= 1; pos = j
    }
    out
  }

  def segmentCompute(w: UTF8String, hm: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, unkCost: Long): ArrayData =
    new GenericArrayData(segmentSyms(w.toString, hm, maxLen, unkCost)
      .map(s => UTF8String.fromString(s).asInstanceOf[Any]))

  private val cls = UnigramTokens.getClass.getName.stripSuffix("$") + "$"

  /** word → Viterbi-optimal piece array under the scored vocabulary.
    * Seq (not Array) constructor parameters so case-class structural
    * equality holds and Catalyst CSE can dedup identical expressions. */
  case class UnigramEncodeExpr(child: Expression, pieces: Seq[String],
      costs: Seq[Long], unkCost: Long)
      extends UnaryExpression with ExpectsInputTypes {
    require(pieces.length == costs.length, "piece/cost arrays differ in length")
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    @transient private lazy val hm: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
      val pi = pieces.iterator; val ci = costs.iterator
      while (pi.hasNext) m.put(pi.next(), ci.next())
      m
    }
    @transient private lazy val maxLen: Int =
      if (pieces.isEmpty) 1
      else math.max(1, pieces.map(p => p.codePointCount(0, p.length)).max)

    override def nullSafeEval(w: Any): Any =
      segmentCompute(w.asInstanceOf[UTF8String], hm, maxLen, unkCost)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("unigramVocab", hm, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, w =>
        s"${ev.value} = $cls.MODULE$$.segmentCompute($w, $mRef, $maxLen, ${unkCost}L);")
    }

    override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
      copy(child = newChild)
  }

  def countCompute(tokens: ArrayData, hm: java.util.HashMap[String, java.lang.Long],
      maxLen: Int, unkCost: Long): Long = {
    var total = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        total += segmentSyms(tokens.getUTF8String(i).toString, hm, maxLen,
          unkCost).length.toLong
      }
      i += 1
    }
    total
  }

  /** array<string> of tokens → Σ Viterbi piece counts (the
    * [[BpeTokens.BpeCountExpr]] shape for the unigram family — what a
    * sequence-budget packer counts in). */
  case class UnigramCountExpr(child: Expression, pieces: Seq[String],
      costs: Seq[Long], unkCost: Long)
      extends UnaryExpression with ExpectsInputTypes {
    require(pieces.length == costs.length, "piece/cost arrays differ in length")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType

    @transient private lazy val hm: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
      val pi = pieces.iterator; val ci = costs.iterator
      while (pi.hasNext) m.put(pi.next(), ci.next())
      m
    }
    @transient private lazy val maxLen: Int =
      if (pieces.isEmpty) 1
      else math.max(1, pieces.map(p => p.codePointCount(0, p.length)).max)

    override def nullSafeEval(a: Any): Any =
      countCompute(a.asInstanceOf[ArrayData], hm, maxLen, unkCost)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("unigramVocab", hm, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $cls.MODULE$$.countCompute($a, $mRef, $maxLen, ${unkCost}L);")
    }

    override protected def withNewChildInternal(newChild: Expression): UnigramCountExpr =
      copy(child = newChild)
  }
}
