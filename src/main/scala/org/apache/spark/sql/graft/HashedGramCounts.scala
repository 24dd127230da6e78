package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-doc hashed (unigram + bigram) feature counts — the fastText
  * feature space of [[graft.text.Classify.perceptronTrainHashed]] —
  * in one pass: every unigram token and every adjacent bigram
  * (`t(i) + " " + t(i+1)`) hashes to
  * `fidx = 1 + hash60(gram) % buckets` ([[Hash60]] — md5-identical to
  * the SQL oracles), counts accumulate into a local (buckets+1) array,
  * and the output is one (fidx, cnt) struct per OCCUPIED feature, fidx
  * ascending.
  *
  * Value-identical (HashedGramCountsSpec) to the chain it replaced —
  *
  *   explode(concat(t, transform(sequence(1, size(t)−1),
  *     i => concat(element_at(t, i), " ", element_at(t, i+1)))))
  *   → hash60 % buckets + 1 → groupBy(doc, y, fidx).count()
  *
  * — but the bigram lambda (interpreted per element, one concat
  * allocation per bigram), the gram-string explode and, decisively,
  * the corpus-scale (doc, fidx) SHUFFLE AGGREGATE all disappear: with
  * buckets-bounded features the per-doc aggregation is complete inside
  * the expression, so the design matrix becomes map-only (the
  * severed matrix's doc-repartition is the only exchange left).
  * Bias rows (fidx 0) stay the caller's concern.
  */
case class HashedGramCounts(child: Expression, buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(buckets >= 2)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fidx", IntegerType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashedGramCounts.compute(input.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HashedGramCounts.getClass.getName.stripSuffix("$") + "$"
    defineCodeGen(ctx, ev, input =>
      s"(${classOf[ArrayData].getName}) $cls.MODULE$$.compute($input, $buckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedGramCounts =
    copy(child = newChild)
}

object HashedGramCounts {

  private val Space = Array[Byte](' ')

  def compute(tokens: ArrayData, buckets: Int): ArrayData = {
    val len = tokens.numElements()
    val counts = new Array[Long](buckets + 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hit(digest: Array[Byte]): Unit = {
      var acc = 0L
      var k = 0
      while (k < 8) { acc = (acc << 8) | (digest(k) & 0xffL); k += 1 }
      val fidx = 1 + ((acc >>> 4) % buckets).toInt
      counts(fidx) += 1L
    }
    val tb = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      tb(i) = tokens.getUTF8String(i).getBytes
      md.reset()
      md.update(tb(i))
      hit(md.digest())
      i += 1
    }
    i = 0
    while (i < len - 1) {
      md.reset()
      md.update(tb(i))
      md.update(Space)
      md.update(tb(i + 1))
      hit(md.digest())
      i += 1
    }
    var occupied = 0
    i = 1
    while (i <= buckets) { if (counts(i) != 0L) occupied += 1; i += 1 }
    val out = new Array[Any](occupied)
    var o = 0
    i = 1
    while (i <= buckets) {
      if (counts(i) != 0L) { out(o) = InternalRow(i, counts(i)); o += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  def hashed_gram_counts(c: Column, buckets: Int): Column =
    ColumnBridge.column(HashedGramCounts(ColumnBridge.expression(c), buckets))
}
