package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprints (Schleimer/Wilkerson/Aiken MOSS
  * scheme): tokenize, hash every word k-gram (first 8 hex chars of its
  * md5 — lexicographic == numeric for fixed-width lowercase hex, and
  * DuckDB md5 agrees byte-for-byte, which keeps the SQL oracle exact),
  * slide a window of w hashes keeping each window's minimum, distinct,
  * sort.
  *
  * Replaces the Column-combinator formulation whose nested
  * higher-order-function lambdas re-inlined the WHOLE gram+hash pipeline
  * per window position (interpreted lambdas re-evaluate every non-lambda
  * subexpression per element — the plan showed transform(transform(...))
  * inside the window-min lambda): O(windows × grams × |doc|) per
  * document, which turned the fingerprint self-join query from seconds
  * into minutes one scale factor up. This expression is one tight loop,
  * O(|doc| + grams × w).
  *
  * Tokenization parity with `split(norm_text(text), " ")`: lowercase,
  * split on ASCII whitespace (Spark's `\s` regex class is ASCII-only),
  * runs collapse and ends trim by construction of the splitter.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && w >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowFingerprints.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input.toString(), $k, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private def isFullAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  private def asciiLower(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  def compute(text: String, k: Int, w: Int): ArrayData = {
    // replicate split(regexp_replace(lower(trim(s)),'\s+',' '),' ')
    // EXACTLY, including its edge cases: trim() strips ASCII spaces
    // only, so text edged with '\n'/'\t' normalizes to a leading/
    // trailing single space whose split yields an EMPTY token that
    // participates in grams -- a hand-rolled drop-empty tokenizer would
    // diverge from the HOF formulation and the SQL oracle there. Same
    // regex engine (java.util.regex) as Spark's regexp_replace.
    var st = 0
    var en = text.length
    while (st < en && text.charAt(st) == ' ') st += 1
    while (en > st && text.charAt(en - 1) == ' ') en -= 1
    val seg = text.substring(st, en)
    // mirror UTF8String.toLowerCase exactly: ASCII-only strings take a
    // locale-independent ASCII path; anything else falls back to
    // String.toLowerCase() under the DEFAULT locale (so e.g. a Turkish
    // JVM lowercases 'I' differently only when the string has a
    // non-ASCII char — bug-for-bug parity with Spark's lower())
    val lowered =
      if (isFullAscii(seg)) asciiLower(seg)
      else seg.toLowerCase()
    val norm = Ws.matcher(lowered).replaceAll(" ")
    val tokens: Array[String] = norm.split(" ", -1)
    val n = tokens.length
    // the SQL guard is len(t) >= k + w - 1 -- at least one full window
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val nGrams = n - (k - 1)
    val hashes = new Array[String](nGrams)
    val gram = new java.lang.StringBuilder()
    var g = 0
    while (g < nGrams) {
      gram.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) gram.append(' ')
        gram.append(tokens(g + j))
        j += 1
      }
      md.reset()
      val dig = md.digest(gram.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars = first 4 digest bytes
      val hex = new Array[Char](8)
      var b = 0
      while (b < 4) {
        hex(b * 2) = Character.forDigit((dig(b) >> 4) & 0xf, 16)
        hex(b * 2 + 1) = Character.forDigit(dig(b) & 0xf, 16)
        b += 1
      }
      hashes(g) = new String(hex)
      g += 1
    }
    // window minima (w is small; O(nGrams·w) beats deque bookkeeping)
    val mins = new java.util.TreeSet[String]()
    var p = 0
    while (p + w <= nGrams) {
      var m = hashes(p)
      var q = 1
      while (q < w) {
        if (hashes(p + q).compareTo(m) < 0) m = hashes(p + q)
        q += 1
      }
      mins.add(m)
      p += 1
    }
    val out = new Array[Any](mins.size)
    val it = mins.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  def winnow_fingerprints(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
}

/** [[WinnowFingerprints]] emitting each fingerprint as the INT value
  * of its 8 hex chars (= the md5's first 32 bits) instead of the hex
  * string — for the JOIN-KEY uses (winnowPairs / winnowRecall) where
  * the fingerprint never reaches the output. Hex↔int is a bijection
  * and fixed-width lowercase hex compares lexicographically ==
  * numerically, so selected positions, per-doc sets, shared counts and
  * hence the pair results are IDENTICAL (WinnowIntSpec pins set
  * equality) — while the inverted-index shuffle key narrows from an
  * 8-char string to 4 bytes and the self-join equality is an int
  * compare. The string form stays for t_winnow, whose output pins the
  * hex rendering. */
case class WinnowFingerprintInts(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && w >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprintInts.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowFingerprintInts.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input.toString(), $k, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintInts =
    copy(child = newChild)
}

object WinnowFingerprintInts {

  /** Same normalization/gram/window-min pipeline as
    * [[WinnowFingerprints.compute]], with fingerprints kept as the
    * md5's first 32 bits compared UNSIGNED (hex-string order).
    *
    * API CAVEAT (round-19 advice): the values are unsigned 32-bit
    * quantities stored in signed IntegerType — the emitted array is
    * UNSIGNED-sorted, which is NOT ascending under signed Int
    * comparison once the high bit is set. Consumers may use these ints
    * for EQUALITY ONLY (join keys, set membership); ordering or range
    * comparisons on them silently diverge from the hex-string form.
    * Current uses (winnowPairs join key, set-equality specs) comply. */
  def compute(text: String, k: Int, w: Int): ArrayData = {
    val strs = WinnowFingerprints.compute(text, k, w)
    val n = strs.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      // 8 lowercase hex chars → unsigned 32-bit value (array is already
      // distinct + hex-sorted == unsigned-sorted)
      out(i) = java.lang.Integer.parseUnsignedInt(
        strs.getUTF8String(i).toString, 16)
      i += 1
    }
    new GenericArrayData(out)
  }

  def winnow_fingerprint_ints(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprintInts(ColumnBridge.expression(c), k, w))
}
