package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd WordPiece encoding: greedy longest-match-first
  * segmentation of a word (or token-count over a whole token array)
  * under a vocabulary split into word-INITIAL pieces and `##`
  * CONTINUATION pieces — the BERT tokenizer's matching rule, where
  * [[graft.text.WordPiece.learnMerges]] is the likelihood-scored
  * learning half. Unlike BPE application (replay the merges) or the
  * unigram LM (Viterbi DP), WordPiece encoding is a deterministic
  * greedy scan: at each position take the LONGEST vocabulary piece
  * matching the remaining word (initial pieces at position 0,
  * continuation pieces after), and if no piece matches the whole word
  * collapses to `[UNK]` — the real tokenizer's out-of-vocabulary
  * behavior, preserved rather than papered over.
  *
  * The two piece sets ride the generated code as REFERENCE OBJECTS
  * (the [[BpeTokens]] pattern): tokenizer-sized by contract, zero
  * per-row interpretation overhead, no UDF.
  *
  * Parity contract (DuckDB oracle replays the same greedy scan as a
  * recursive CTE):
  *  - positions and piece lengths are Unicode code points (surrogate
  *    pair = one unit), the unit DuckDB's `word[i:j]` slices by;
  *  - longest-match tries lengths from min(maxPieceLen, remaining)
  *    down to 1 — equivalently the MAX matching length, which is what
  *    the oracle's `list_max(list_filter(...))` computes;
  *  - continuation pieces render as `"##" || piece`; `[UNK]` replaces
  *    the ENTIRE word on any dead end; the empty word encodes to an
  *    empty array;
  *  - `wordpiece_count` sums piece counts over a token array (an
  *    `[UNK]` word counts 1); a null token element contributes 0, a
  *    null array yields null. */
object WordPieceTokens {

  def wordpiece_encode(word: Column, initPieces: Seq[String],
      contPieces: Seq[String]): Column =
    ColumnBridge.column(WordPieceEncodeExpr(ColumnBridge.expression(word),
      initPieces, contPieces))

  def wordpiece_count(tokens: Column, initPieces: Seq[String],
      contPieces: Seq[String]): Column =
    ColumnBridge.column(WordPieceCountExpr(ColumnBridge.expression(tokens),
      initPieces, contPieces))

  /** Immutable lookup bundle shared by interpreted eval and codegen —
    * built once per plan, rides as one reference object. */
  final class Vocab(initPieces: Array[String], contPieces: Array[String])
      extends Serializable {
    val init = new java.util.HashSet[java.lang.String]()
    val cont = new java.util.HashSet[java.lang.String]()
    initPieces.foreach(init.add)
    contPieces.foreach(cont.add)
    private def maxCp(ps: Array[String]): Int =
      if (ps.isEmpty) 0
      else ps.map(p => p.codePointCount(0, p.length)).max
    val maxInit: Int = maxCp(initPieces)
    val maxCont: Int = maxCp(contPieces)
  }

  private val Unk = "[UNK]"

  /** Greedy longest-match segmentation of one word; `[UNK]` on any
    * dead end. Shared by both expressions. */
  def encodePieces(word: String, v: Vocab): Array[String] = {
    // code-point boundaries (bnd(i) = UTF-16 offset of code point i)
    var n = 0
    var i = 0
    while (i < word.length) { i += Character.charCount(word.codePointAt(i)); n += 1 }
    if (n == 0) return Array.empty
    val bnd = new Array[Int](n + 1)
    i = 0; var c = 0
    while (i < word.length) {
      bnd(c) = i
      i += Character.charCount(word.codePointAt(i)); c += 1
    }
    bnd(n) = word.length
    val out = new Array[String](n) // at most one piece per code point
    var o = 0
    var pos = 0
    while (pos < n) {
      val initial = pos == 0
      val set = if (initial) v.init else v.cont
      var l = math.min(if (initial) v.maxInit else v.maxCont, n - pos)
      var hit = 0
      while (l >= 1 && hit == 0) {
        if (set.contains(word.substring(bnd(pos), bnd(pos + l)))) hit = l
        l -= 1
      }
      if (hit == 0) return Array(Unk)
      val s = word.substring(bnd(pos), bnd(pos + hit))
      out(o) = if (initial) s else "##" + s
      o += 1
      pos += hit
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  def encodeCompute(word: UTF8String, v: Vocab): ArrayData =
    new GenericArrayData(encodePieces(word.toString, v)
      .map(s => UTF8String.fromString(s).asInstanceOf[Any]))

  def countCompute(tokens: ArrayData, v: Vocab): Long = {
    var total = 0L
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i))
        total += encodePieces(tokens.getUTF8String(i).toString, v).length.toLong
      i += 1
    }
    total
  }

  private val cls = WordPieceTokens.getClass.getName.stripSuffix("$") + "$"
  private val vocabCls = classOf[Vocab].getName

  /** word → greedy WordPiece segmentation under the split vocabulary.
    * Piece lists are Seq (not Array) constructor parameters so case-class
    * structural equality holds and Catalyst common-subexpression
    * elimination can dedup semantically identical expressions. */
  case class WordPieceEncodeExpr(child: Expression, initPieces: Seq[String],
      contPieces: Seq[String]) extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    @transient private lazy val vocab =
      new Vocab(initPieces.toArray, contPieces.toArray)

    override def nullSafeEval(w: Any): Any =
      encodeCompute(w.asInstanceOf[UTF8String], vocab)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vRef = ctx.addReferenceObj("wpVocab", vocab, vocabCls)
      nullSafeCodeGen(ctx, ev, w =>
        s"${ev.value} = $cls.MODULE$$.encodeCompute($w, $vRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeExpr =
      copy(child = newChild)
  }

  /** array<string> of tokens → Σ WordPiece piece counts. Seq params
    * for structural equality (see [[WordPieceEncodeExpr]]). */
  case class WordPieceCountExpr(child: Expression, initPieces: Seq[String],
      contPieces: Seq[String]) extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType))
    override def dataType: DataType = LongType

    @transient private lazy val vocab =
      new Vocab(initPieces.toArray, contPieces.toArray)

    override def nullSafeEval(ts: Any): Any =
      countCompute(ts.asInstanceOf[ArrayData], vocab)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vRef = ctx.addReferenceObj("wpVocab", vocab, vocabCls)
      nullSafeCodeGen(ctx, ev, ts =>
        s"${ev.value} = $cls.MODULE$$.countCompute($ts, $vRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): WordPieceCountExpr =
      copy(child = newChild)
  }
}
