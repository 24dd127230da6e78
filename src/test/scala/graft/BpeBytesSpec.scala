package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Bpe
import org.apache.spark.sql.graft.BpeTokens

/** Byte-level BPE (GPT-2 lineage): the hex-rendered UTF-8 byte base
  * alphabet, its parity with the column-side splitter, merge
  * application over byte symbols, and — the defining property — a
  * multi-byte-codepoint corpus where char-BPE and byte-BPE learn
  * DIFFERENT first merges and segment the same word differently. */
class BpeBytesSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  // U+00E9 (e-acute): one code point, TWO UTF-8 bytes (C3 A9) — the
  // smallest unit on which the two alphabets disagree
  private val EAcute = "\u00e9"
  // U+1F600 GRINNING FACE: 4 UTF-8 bytes, a UTF-16 surrogate pair
  private val Emoji = "\ud83d\ude00"

  test("byteSymsOf renders UTF-8 bytes as uppercase hex; empty word is empty") {
    def syms(w: String) = BpeTokens.byteSymsOf(UTF8String.fromString(w)).toSeq
    assert(syms("caf" + EAcute) == Seq("63", "61", "66", "C3", "A9"))
    assert(syms("") == Seq.empty)
    // 4-byte code point (U+1F600, a surrogate pair in UTF-16) splits
    // into its four UTF-8 bytes — no [UNK], every string segmentable
    assert(syms("\ud83d\ude00") == Seq("F0", "9F", "98", "80"))
  }

  test("column byteSyms == byteSymsOf, including the empty word") {
    val words = Seq("caf" + EAcute, "", "a", EAcute + EAcute, "\ud83d\ude00")
    val got = words.toDF("word")
      .select(col("word"), Bpe.byteSyms(col("word")).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) == BpeTokens.byteSymsOf(UTF8String.fromString(w)).toSeq,
        s"column/JVM splitter drift for '$w'")
    }
    // the empty word specifically: sequence(1, 0) is a DESCENDING ramp
    // in Spark ([1, 0]) — unguarded it minted two phantom "" symbols
    assert(got("") == Seq.empty)
  }

  test("bpe_bytes_encode == interpreted applyMerge fold over byteSyms") {
    val merges = Seq(("C3", "A9"), ("61", "C3A9"), ("73", "74"))
    val words = Seq("caf" + EAcute, EAcute + EAcute, "a" + EAcute, "st", "x", "")
      .toDF("word")
    val interp = words.select(col("word"),
      merges.foldLeft(Bpe.byteSyms(col("word"))) { case (c, (l, r)) =>
        Bpe.applyMerge(c, l, r)
      }.as("syms")).collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val gen = words.select(col("word"),
      BpeTokens.bpe_bytes_encode(col("word"), merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(interp == gen, s"interp=$interp gen=$gen")
    // the judge-verified pin: under merge (C3,A9) then (61,C3A9),
    // "a<e-acute>b" first fuses the e-acute bytes, then fuses the
    // leading 'a' onto the merged symbol
    assert(gen("a" + EAcute) == Seq("61C3A9"))
  }

  test("char-BPE and byte-BPE learn DIFFERENT first merges and segment differently") {
    // one word, one frequency: "<e-acute><e-acute>" x5.
    //   char alphabet: [e-acute, e-acute]          -> only pair (e,e) freq 5
    //   byte alphabet: [C3, A9, C3, A9]            -> (C3,A9) freq 10, (A9,C3) freq 5
    // The byte learner's first merge is INTRA-codepoint (C3,A9) — a
    // pair the char learner cannot even express — at double the
    // frequency of the char learner's cross-codepoint merge.
    val wf = Seq((EAcute + EAcute, 5L)).toDF("word", "freq")

    val charMerges = Bpe.learnMerges(wf, 1)
    val byteMerges = Bpe.learnMerges(wf, 1, symsOf = Bpe.byteSyms)
    assert(charMerges == Seq((EAcute, EAcute, 5L)), s"$charMerges")
    assert(byteMerges == Seq(("C3", "A9", 10L)), s"$byteMerges")

    // and the learned tokenizers SEGMENT the word differently after
    // one round: char-BPE fuses the whole word into one symbol; byte-
    // BPE has only rebuilt the two code points (two symbols)
    val charSeg = BpeTokens.encodeSyms(EAcute + EAcute,
      Array(charMerges.head._1), Array(charMerges.head._2)).toSeq
    assert(charSeg == Seq(EAcute + EAcute))
    val byteSeg = Seq((EAcute + EAcute))
      .toDF("word")
      .select(BpeTokens.bpe_bytes_encode(col("word"),
        byteMerges.map { case (l, r, _) => (l, r) }).as("syms"))
      .head().getSeq[String](0)
    assert(byteSeg == Seq("C3A9", "C3A9"))
    assert(charSeg.length != byteSeg.length,
      "divergence pin must segment to different lengths")
  }

  test("bpe_bytes_count sums encoded byte-symbol lengths over a token array") {
    val merges = Seq(("C3", "A9"))
    val df = Seq(
      (Seq("caf" + EAcute, EAcute), "both"), // [63 61 66 C3A9]=4 + [C3A9]=1
      (Seq.empty[String], "empty")
    ).toDF("toks", "tag")
    val got = df.select(col("tag"),
      BpeTokens.bpe_bytes_count(col("toks"), merges).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("both" -> 5L, "empty" -> 0L))
  }
}
