package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-trigram Shannon entropy in ONE map pass:
  * H = log2(N) − Σ c·log2(c) / N over the counts c of the N = len−2
  * overlapping codepoint trigrams.
  *
  * The declarative formulation (explode all trigrams → groupBy(doc,
  * trigram) → groupBy(doc)) shuffles the corpus's every trigram twice —
  * O(total_chars) exchange rows. Per-doc entropy needs no cross-doc
  * state at all, so this expression counts trigrams in a per-row hash
  * map (exact identity: three ≤21-bit codepoints packed into one long)
  * and the operator becomes shuffle-free. Counts are summed in sorted
  * order so the double accumulation is deterministic; callers round
  * (e.g. to 6 digits) to absorb the remaining engine-order difference
  * from SQL oracles, exactly as the aggregation formulation did.
  *
  * Input is expected PRE-normalized (see graft.text.norm_text) — the
  * expression does no case folding or whitespace collapsing, keeping
  * normalization semantics in one place. Returns null for inputs
  * shorter than 3 codepoints (no trigrams).
  */
case class TrigramEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TrigramEntropy.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TrigramEntropy.getClass.getName.stripSuffix("$") + "$"
    val tmp = ctx.freshName("entropy")
    nullSafeCodeGen(ctx, ev, input =>
      s"""java.lang.Double $tmp = $cls.MODULE$$.compute($input.toString());
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramEntropy =
    copy(child = newChild)
}

object TrigramEntropy {

  /** Entropy of the codepoint-trigram distribution, or null if the text
    * has fewer than 3 codepoints. */
  def compute(s: String): java.lang.Double = {
    // codepoint array: trigram identity must match substring semantics
    // (codepoints, not UTF-16 units) so supplementary characters count
    // the same way SQL `substring` counts them
    val cps = s.codePoints().toArray
    val n = cps.length - 2
    if (n <= 0) return null
    val counts = new java.util.HashMap[Long, Int](Math.min(n, 1 << 12))
    var i = 0
    while (i < n) {
      // three codepoints (≤ 0x10FFFF = 21 bits) packed into 63 bits —
      // exact trigram identity, zero collisions
      val key = (cps(i).toLong << 42) | (cps(i + 1).toLong << 21) | cps(i + 2).toLong
      counts.put(key, counts.getOrDefault(key, 0) + 1)
      i += 1
    }
    val cs = new Array[Long](counts.size)
    var k = 0
    val it = counts.values().iterator()
    while (it.hasNext) { cs(k) = it.next().toLong; k += 1 }
    java.util.Arrays.sort(cs) // deterministic accumulation order
    val ln2 = Math.log(2.0)
    var sum = 0.0
    var j = 0
    while (j < cs.length) {
      val c = cs(j).toDouble
      sum += c * (Math.log(c) / ln2)
      j += 1
    }
    Math.log(n.toDouble) / ln2 - sum / n
  }

  def trigram_entropy(c: Column): Column =
    ColumnBridge.column(TrigramEntropy(ColumnBridge.expression(c)))
}
