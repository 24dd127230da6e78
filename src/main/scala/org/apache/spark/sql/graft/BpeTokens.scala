package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd BPE application: encode a word (or count the encoded
  * symbols of a whole token array) under a LEARNED merge list — the
  * map-side half of byte-pair encoding, where [[graft.text.Bpe
  * .learnMerges]] is the vocabulary-sized learning half.
  *
  * The merge list rides the generated code as a REFERENCE OBJECT (the
  * [[NearestCentroid]] pattern): the caller passes the driver-held
  * ordered merges — dimension-sized by contract, a few thousand pairs
  * for a real tokenizer — and each row pays K greedy left-to-right
  * passes over its symbols with zero per-row interpretation overhead.
  * No UDF, no broadcast-column crossJoin, no per-merge HOF tree walk.
  *
  * Parity contract (spec'd value-equal against the interpreted
  * [[graft.text.Bpe.applyMerge]] fold chain):
  *  - symbols are Unicode code points (surrogate pair = one symbol),
  *    the same unit as `split(word, "")` and DuckDB's `word[i:i]`;
  *  - each merge applies greedily leftmost, non-overlapping ("a a a"
  *    under (a,a) → [aa, a]); merges apply strictly in learned order,
  *    which for any fixed word equals the round-interleaved order the
  *    learner used (each round's pass is the same deterministic fold);
  *  - `bpe_count` sums encoded lengths over a token array; a null
  *    token element contributes 0 (like an empty string), a null array
  *    yields null. */
object BpeTokens {

  def bpe_encode(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(word),
      merges.map(_._1).toArray, merges.map(_._2).toArray))

  def bpe_count(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(tokens),
      merges.map(_._1).toArray, merges.map(_._2).toArray))

  /** Apply all merges in order to one word; returns the symbol array.
    * Shared by both expressions and by their interpreted eval. */
  def encodeSyms(word: String, lefts: Array[String], rights: Array[String]): Array[String] = {
    // split into code-point symbols
    var n = 0
    var i = 0
    while (i < word.length) { i += Character.charCount(word.codePointAt(i)); n += 1 }
    var syms = new Array[String](n)
    i = 0; n = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      syms(n) = word.substring(i, i + cc)
      i += cc; n += 1
    }
    var m = 0
    while (m < lefts.length && syms.length >= 2) {
      val l = lefts(m); val r = rights(m)
      val out = new Array[String](syms.length)
      var o = 0
      var j = 0
      while (j < syms.length) {
        if (o > 0 && syms(j) == r && out(o - 1) == l) { out(o - 1) = l + r }
        else { out(o) = syms(j); o += 1 }
        j += 1
      }
      syms = if (o == syms.length) out else java.util.Arrays.copyOf(out, o)
      m += 1
    }
    syms
  }

  def encodeCompute(word: UTF8String, lefts: Array[String], rights: Array[String]): ArrayData =
    new GenericArrayData(encodeSyms(word.toString, lefts, rights)
      .map(s => UTF8String.fromString(s).asInstanceOf[Any]))

  def countCompute(tokens: ArrayData, lefts: Array[String], rights: Array[String]): Long = {
    var total = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i).toString
        total += encodeSyms(w, lefts, rights).length.toLong
      }
      i += 1
    }
    total
  }

  private val cls = BpeTokens.getClass.getName.stripSuffix("$") + "$"

  /** word → encoded symbol array under the merge list. */
  case class BpeEncodeExpr(child: Expression, lefts: Array[String],
      rights: Array[String]) extends UnaryExpression with ExpectsInputTypes {
    require(lefts.length == rights.length, "merge list sides differ in length")
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(w: Any): Any =
      encodeCompute(w.asInstanceOf[UTF8String], lefts, rights)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lRef = ctx.addReferenceObj("bpeLefts", lefts, "java.lang.String[]")
      val rRef = ctx.addReferenceObj("bpeRights", rights, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, w =>
        s"${ev.value} = $cls.MODULE$$.encodeCompute($w, $lRef, $rRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
      copy(child = newChild)
  }

  /** array<string> of tokens → Σ encoded symbol counts. */
  case class BpeCountExpr(child: Expression, lefts: Array[String],
      rights: Array[String]) extends UnaryExpression with ExpectsInputTypes {
    require(lefts.length == rights.length, "merge list sides differ in length")
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType))
    override def dataType: DataType = LongType

    override def nullSafeEval(a: Any): Any =
      countCompute(a.asInstanceOf[ArrayData], lefts, rights)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lRef = ctx.addReferenceObj("bpeLefts", lefts, "java.lang.String[]")
      val rRef = ctx.addReferenceObj("bpeRights", rights, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = $cls.MODULE$$.countCompute($a, $lRef, $rRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
      copy(child = newChild)
  }
}
