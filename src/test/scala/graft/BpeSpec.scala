package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Bpe
import org.apache.spark.sql.graft.BpeTokens

/** BPE tokenizer learning + codegen application: hand-checked merges,
  * greedy-overlap semantics, codegen == interpreted-fold parity, and
  * the learn-time vs encode-time application equivalence the t_pack_bpe
  * oracle rests on. */
class BpeSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("learnMerges reproduces the hand-computed merge sequence") {
    // vocabulary of the classic BPE example shape: "low lower newest"
    // weights chosen so the argmax order is unambiguous by frequency
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    // pair counts round 1: (l,o)=7 (w,e)=2+6=8 (e,s)=9 (s,t)=9 (o,w)=7
    // (e,r)=2 (n,e)=6 (w,i)=3 (i,d)=3 (d,e)=3 (t,..)=0
    // argmax: freq 9 tie between (e,s) and (s,t) → lexicographic (e,s)
    val got = Bpe.learnMerges(wf, 3)
    assert(got.head == (("e", "s", 9L)), s"$got")
    // after merge 1: newest → n e w es t, widest → w i d es t — note
    // (w,e) drops to 2 (newest's w-e became w-es), so round 2 argmax is
    // (es,t)=9
    assert(got(1) == (("es", "t", 9L)), s"$got")
    // after merge 2: n e w est / w i d est; round 3 top is the 7-7 tie
    // (l,o) vs (o,w) → lexicographic (l,o)
    assert(got(2) == (("l", "o", 7L)), s"$got")
  }

  test("learnMerges stops early when no adjacent pairs remain") {
    val wf = Seq(("ab", 3L), ("c", 9L)).toDF("word", "freq")
    val got = Bpe.learnMerges(wf, 10)
    // round 1 merges (a,b); after that every word is a single symbol
    assert(got == Seq(("a", "b", 3L)))
  }

  test("merge application is greedy leftmost, non-overlapping") {
    assert(BpeTokens.encodeSyms("aaa", Array("a"), Array("a")).toSeq ==
      Seq("aa", "a"))
    assert(BpeTokens.encodeSyms("aaaa", Array("a"), Array("a")).toSeq ==
      Seq("aa", "aa"))
    // the merged symbol can seed a LATER merge but not re-match its own
    assert(BpeTokens.encodeSyms("aab", Array("a", "aa"), Array("a", "b")).toSeq ==
      Seq("aab"))
    assert(BpeTokens.encodeSyms("", Array("a"), Array("a")).toSeq == Seq())
  }

  test("codegen bpe_encode == interpreted applyMerge fold chain") {
    val merges = Seq(("e", "s"), ("es", "t"), ("w", "e"))
    val words = Seq("newest", "widest", "lowest", "tsetse", "we", "x", "")
      .toDF("word")
    val interp = words.select(col("word"),
      merges.foldLeft(Bpe.charSyms(col("word"))) { case (c, (l, r)) =>
        Bpe.applyMerge(c, l, r)
      }.as("syms"))
    val codegen = words.select(col("word"),
      BpeTokens.bpe_encode(col("word"), merges).as("syms"))
    val i = interp.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val c = codegen.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(i == c, s"interp $i vs codegen $c")
    // (w,e) cannot fire on newest: by its turn the next symbol is "est"
    assert(c("newest") == Seq("n", "e", "w", "est"), s"${c("newest")}")
  }

  test("bpe_count sums encoded lengths; null element counts 0; null array is null") {
    val merges = Seq(("a", "b"))
    val df = Seq(
      (1L, Seq("ab", "aab", "b")),   // 1 + 2 + 1 = 4
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "toks")
    val got = df.select(col("id"),
      BpeTokens.bpe_count(col("toks"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(1L -> 4L, 2L -> 0L, 3L -> -1L))
    // null ELEMENT: build via sql to get a null inside the array
    val withNull = spark.sql("SELECT array('ab', CAST(NULL AS STRING), 'a') AS toks")
      .select(BpeTokens.bpe_count(col("toks"), merges).as("n"))
      .collect().head.getLong(0)
    assert(withNull == 2L)
  }

  test("encode-time application equals learn-time round-interleaved application") {
    // the equivalence the t_pack_bpe oracle rests on: applying the
    // learned merges in order to a fresh word gives the same symbols as
    // the learner's round-by-round vocabulary rewriting
    val docs = Tables.documents(spark, sf0001)
    val wf = docs.select(explode(graft.text.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val learned = Bpe.learnMerges(wf, 4)
    assert(learned.size == 4)
    val merges = learned.map { case (l, r, _) => (l, r) }
    // learner's final vocabulary: replay the fold chain over the words
    val finalVocab = wf.select(col("word"),
      merges.foldLeft(Bpe.charSyms(col("word"))) { case (c, (l, r)) =>
        Bpe.applyMerge(c, l, r)
      }.as("syms"))
    val viaChain = finalVocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val viaEncode = wf.select(col("word"),
      BpeTokens.bpe_encode(col("word"), merges).as("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(viaChain == viaEncode)
    // and bpe_count over a doc's tokens == Σ per-word encoded lengths
    val fromCount = docs.select(col("doc_id"),
      BpeTokens.bpe_count(graft.text.tokens(col("text")), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromVocab = docs
      .select(col("doc_id"), explode(graft.text.tokens(col("text"))).as("word"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => viaEncode(r.getString(1)).size.toLong).sum
      }
    assert(fromCount == fromVocab)
  }
}
