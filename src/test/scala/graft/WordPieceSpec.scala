package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.WordPiece
import org.apache.spark.sql.graft.WordPieceTokens

/** WordPiece tokenizer family: the likelihood argmax (hand-checked
  * against raw-frequency BPE on a fixture where they disagree), greedy
  * longest-match-first encoding with `##` continuations and the
  * whole-word `[UNK]` dead end, codegen == interpreted parity, and the
  * gate-level invariants (pieces reassemble the word; the greedy
  * segmentation legitimately differs from merge application). */
class WordPieceSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def vocab(init: Seq[String], cont: Seq[String]) =
    new WordPieceTokens.Vocab(init.toArray, cont.toArray)

  test("learnMerges takes the LIKELIHOOD argmax, not BPE's frequency argmax") {
    // (x,z) and (w,y) have pair freq 90 — BPE's pick — but x, y carry
    // unigram mass 100 each, so their score 2^40/100 loses to (a,b):
    // pf 9 over unigram masses 9 and 9 → score 9·2^40/81 = 2^40/9.
    val wf = Seq(("xy", 10L), ("ab", 9L), ("xz", 90L), ("wy", 90L))
      .toDF("word", "freq")
    val got = WordPiece.learnMerges(wf, 1)
    assert(got.size == 1)
    val (l, r, pf, score) = got.head
    assert((l, r, pf) == (("a", "b", 9L)), s"$got")
    // exact Q40 quotient: (9 << 40) div 81, truncating
    assert(score == (BigInt(9) * WordPiece.ScoreScale / 81).toLong, s"$got")
  }

  test("learnMerges stops early when no adjacent pairs remain") {
    val wf = Seq(("ab", 3L), ("c", 9L)).toDF("word", "freq")
    val got = WordPiece.learnMerges(wf, 10)
    assert(got.size == 1 && (got.head._1, got.head._2) == (("a", "b")))
  }

  test("greedy longest-match-first with ## continuations") {
    val v = vocab(Seq("un", "a", "u"), Seq("able", "b", "le", "n"))
    // longest initial piece is "un" (maxInit 2), then the longest
    // continuation covering the tail is "able" — not "b"+"le"
    assert(WordPieceTokens.encodePieces("unable", v).toSeq ==
      Seq("un", "##able"))
    // single-char word, initial side only
    assert(WordPieceTokens.encodePieces("a", v).toSeq == Seq("a"))
    // empty word → empty segmentation
    assert(WordPieceTokens.encodePieces("", v).toSeq == Seq())
  }

  test("a dead end collapses the WHOLE word to [UNK]") {
    val v = vocab(Seq("un", "a"), Seq("able"))
    // "un" matches, then "ax" has no continuation piece → [UNK], not
    // a partial [un, ...] prefix
    assert(WordPieceTokens.encodePieces("unax", v).toSeq == Seq("[UNK]"))
    // no initial piece at all
    assert(WordPieceTokens.encodePieces("zzz", v).toSeq == Seq("[UNK]"))
  }

  test("positions and lengths are code points (surrogate pair = one unit)") {
    val smile = new String(Character.toChars(0x1F600)) // astral plane
    val v = vocab(Seq(smile), Seq("a"))
    assert(WordPieceTokens.encodePieces(smile + "a", v).toSeq ==
      Seq(smile, "##a"))
  }

  test("greedy encoding legitimately differs from merge application") {
    // merges [(b,c)] segment "abc" as [a, bc]; the greedy scan over the
    // classified vocabulary {ab, a | ##c, ##bc} takes the LONGEST
    // initial piece "ab" first → [ab, ##c]. This is the real
    // BPE-vs-WordPiece encode-time divergence the gate preserves.
    import org.apache.spark.sql.graft.BpeTokens
    assert(BpeTokens.encodeSyms("abc", Array("b"), Array("c")).toSeq ==
      Seq("a", "bc"))
    val v = vocab(Seq("ab", "a"), Seq("c", "bc"))
    assert(WordPieceTokens.encodePieces("abc", v).toSeq == Seq("ab", "##c"))
  }

  test("codegen wordpiece_encode == interpreted encodePieces") {
    val init = Seq("un", "a", "z")
    val cont = Seq("able", "b", "le", "n", "a")
    val words = Seq("unable", "un", "a", "unax", "zaaa", "", "aba")
    val got = words.toDF("word")
      .select(col("word"),
        WordPieceTokens.wordpiece_encode(col("word"), init, cont).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val v = vocab(init, cont)
    words.foreach { w =>
      assert(got(w) == WordPieceTokens.encodePieces(w, v).toSeq,
        s"codegen/interpreted diverge on '$w'")
    }
  }

  test("wordpiece_count sums pieces; [UNK] counts 1; null element 0; null array null") {
    val init = Seq("un", "a")
    val cont = Seq("able", "a")
    val df = Seq(
      (1L, Seq("unable", "aa", "zzz")), // 2 + 2 + 1([UNK]) = 5
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "toks")
    val got = df.select(col("id"),
      WordPieceTokens.wordpiece_count(col("toks"), init, cont).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(1L -> 5L, 2L -> 0L, 3L -> -1L), s"$got")
  }

  test("gate invariants at sf0.001: pieces reassemble the word; learn rounds dense") {
    val dir = "/root/testdata/sf0.001"
    val enc = graft.queries.LlmOps.wordpieceEncode(spark, dir).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getString(3).split(" ").filter(_.nonEmpty)
      if (pieces.sameElements(Array("[UNK]"))) ()
      else {
        // first piece unmarked, the rest ##-marked, concatenation
        // reassembles the word exactly
        assert(pieces.tail.forall(_.startsWith("##")), s"$word: ${r.getString(3)}")
        assert(!pieces.head.startsWith("##"), s"$word: ${r.getString(3)}")
        val glued = pieces.head + pieces.tail.map(_.drop(2)).mkString
        assert(glued == word, s"$word reassembled as $glued")
      }
    }
    val learn = graft.queries.LlmOps.wordpieceLearn(spark, dir).collect()
    assert(learn.map(_.getLong(0)).toSeq == (1L to learn.length).toSeq)
    assert(learn.forall(_.getLong(4) > 0L), "a zero Q40 score means the " +
      "scale is too coarse for this corpus — raise ScoreScale")
  }

  test("t_tokenizer_stats totals equal each family's pack-gate token sums") {
    val dir = "/root/testdata/sf0.001"
    val stats = graft.queries.LlmOps.tokenizerStats(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.keySet ==
      Set("whitespace", "bpe", "unigram", "wordpiece"))
    def packedTotal(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("n_tokens"))).collect().head.getLong(0)
    assert(stats("bpe") ==
      packedTotal(graft.queries.LlmOps.packBpe(spark, dir)))
    assert(stats("unigram") ==
      packedTotal(graft.queries.LlmOps.packUnigram(spark, dir)))
    assert(stats("wordpiece") ==
      packedTotal(graft.queries.LlmOps.packWordpiece(spark, dir)))
    // subword families always refine whitespace tokens
    assert(Seq("bpe", "unigram", "wordpiece")
      .forall(f => stats(f) >= stats("whitespace")))
  }
}
