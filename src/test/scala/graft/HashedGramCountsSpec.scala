package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text._

/** The one-pass HashedGramCounts expression (round-19 optimization)
  * must reproduce the explode → hash60 → groupBy(doc, fidx) hashed
  * (unigram + bigram) design matrix it replaced — the
  * t_quality_clf_ng oracle replays that bucketing arithmetic verbatim,
  * so the (fidx, cnt) multiset per doc is hash-pinned. */
class HashedGramCountsSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val buckets = 64

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "one"),                        // single token: no bigrams
    (3L, "rep rep rep rep"),            // colliding grams accumulate
    (4L, "Mixed CASE with punct-uation and d1g1ts 42"),
    (5L, (1 to 200).map(i => s"tok${i % 37}").mkString(" ")))

  test("HashedGramCounts == explode/hash60/groupBy reference matrix") {
    val base = docs.toDF("doc", "txt")
    val t = col("t")
    val bigrams = when(size(t) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + lit(1)))))
    val ref = base.select(col("doc"), tokens(col("txt")).as("t"))
      .select(col("doc"), explode(concat(t, bigrams)).as("g"))
      .select(col("doc"),
        (graft.sketch.Sketch.hash60Builtin(col("g")) % buckets + 1)
          .cast("int").as("fidx"))
      .groupBy(col("doc"), col("fidx"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val fast = base.select(col("doc"),
        explode(org.apache.spark.sql.graft.HashedGramCounts
          .hashed_gram_counts(tokens(col("txt")), buckets)).as("fc"))
      .select(col("doc"), col("fc.fidx"), col("fc.cnt"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(fast == ref)
    // sanity: bigrams contributed (doc 1 has 9 unigrams + 8 bigrams)
    assert(ref.collect { case ((1L, _), c) => c }.sum == 17L)
  }

  test("HashedGramCounts generates compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = docs.toDF("doc", "txt")
        .select(org.apache.spark.sql.graft.HashedGramCounts
          .hashed_gram_counts(tokens(col("txt")), buckets).as("fc"))
        .collect()
      assert(r.length == docs.length && r.forall(!_.isNullAt(0)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
