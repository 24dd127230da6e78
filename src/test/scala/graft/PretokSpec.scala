package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** GPT-2-style regex pre-tokenization ([[graft.text.pretok]]): the
  * contraction and digit-run cases where whitespace and regex pretok
  * segment DIFFERENTLY, the space-marker convention, and the lossless
  * concat invariant over the gate corpus. */
class PretokSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def segs(texts: String*): Map[String, Seq[String]] =
    texts.toDF("text")
      .select(col("text"), graft.text.pretok(col("text")).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  test("contractions split off; whitespace tokenization keeps them attached") {
    val got = segs("don't know", "it's we're i'll you've i'm he'd")
    assert(got("don't know") == Seq("don", "'t", " know"))
    assert(got("it's we're i'll you've i'm he'd") ==
      Seq("it", "'s", " we", "'re", " i", "'ll", " you", "'ve",
        " i", "'m", " he", "'d"))
    // the divergence pin: whitespace segments "don't" as ONE token
    val ws = Seq("don't know").toDF("text")
      .select(graft.text.tokens(col("text"))).head().getSeq[String](0)
    assert(ws == Seq("don't", "know"))
  }

  test("digit runs and punctuation runs split from letter runs") {
    val got = segs("abc123 45x", "a+b, c!!")
    assert(got("abc123 45x") == Seq("abc", "123", " 45", "x"))
    assert(got("a+b, c!!") == Seq("a", "+", "b", ",", " c", "!!"))
  }

  test("a lone apostrophe is punctuation, not a contraction") {
    // 'x matches no contraction suffix: the quote falls through to the
    // punctuation-run alternative and x to the letter-run one
    assert(segs("rock 'x roll")("rock 'x roll") ==
      Seq("rock", " '", "x", " roll"))
  }

  test("mid-text tokens keep their leading space (GPT-2 space marker)") {
    val got = segs("the cat sat")("the cat sat")
    assert(got == Seq("the", " cat", " sat"))
    assert(got.tail.forall(_.startsWith(" ")))
  }

  test("segmentation is lossless over the gate corpus: concat(pretok) == norm_text") {
    val bad = Tables.documents(spark, sf0001)
      .select(graft.text.norm_text(col("text")).as("n"),
        concat_ws("", graft.text.pretok(col("text"))).as("joined"))
      .filter(col("n") =!= col("joined"))
      .count()
    assert(bad == 0L)
  }

  test("byte merges learned over pretok differ from the whitespace-census byte chain") {
    val pre = graft.queries.LlmOps.bpeBytesPretokLearn(spark, sf0001)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val ws = graft.queries.LlmOps.bpeBytesLearn(spark, sf0001)
      .collect().map(r => (r.getString(1), r.getString(2)))
      .take(pre.length)
    assert(pre.nonEmpty)
    // space-prefixed pretokens put the space byte (20) into the merge
    // alphabet — a pair the whitespace census cannot even express
    assert(pre.exists { case (l, _) => l == "20" || l.startsWith("20") },
      s"no space-byte merge in ${pre.toSeq}")
    assert(ws.forall { case (l, r) => !l.startsWith("20") && !r.startsWith("20") })
    assert(pre.toSeq != ws.toSeq, "pretok and whitespace chains agree — no divergence")
  }

  test("the census gate diverges from the whitespace census exactly by space markers") {
    val pre = graft.queries.LlmOps.bpePretok(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(pre.nonEmpty)
    // this corpus is pure space-separated lowercase words, so every
    // pretoken is a word (first of its doc) or a space-prefixed word —
    // and space-prefixed forms dominate mid-text
    assert(pre.keys.forall(t => t.matches(" ?[a-z]+")))
    assert(pre.keys.exists(_.startsWith(" ")))
  }

  test("t_bpe_pretok_encode: lossless hex concat, counts consistent, space-marker symbols minted") {
    val enc = graft.queries.LlmOps.bpePretokEncode(spark, sf0001).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val word = r.getString(0)
      val syms = r.getString(3).split(" ").filter(_.nonEmpty)
      // the merge fold never loses bytes: rejoined symbols == the
      // word's full UTF-8 hex rendering
      val hex = word.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString
      assert(syms.mkString == hex, s"lossy encode of '$word'")
      assert(r.getLong(2) == syms.length.toLong)
    }
    // the GPT-2 signature: some merged symbol BEGINS with the space
    // byte (20) — a " t"-style marker symbol no whitespace-census
    // tokenizer can mint
    assert(enc.exists(_.getString(3).split(" ")
        .exists(s => s.length > 2 && s.startsWith("20"))),
      "no space-marker merged symbol in the encode table")
  }

  test("t_pack_bpe_pretok totals == census freq x encoded length; all docs packed") {
    val enc = graft.queries.LlmOps.bpePretokEncode(spark, sf0001).collect()
    val fromCensus = enc.map(r => r.getLong(1) * r.getLong(2)).sum
    val pack = graft.queries.LlmOps.packBpePretok(spark, sf0001).collect()
    assert(pack.map(_.getLong(2)).sum == fromCensus,
      "packed token total diverges from the census count")
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(pack.map(_.getLong(1)).sum == nDocs)
  }

  test("t_tokenizer_write_commit: the committed-artifact re-encode == the in-memory encode") {
    val viaArtifact = graft.queries.LlmOps.tokenizerWriteCommit(spark, sf0001)
      .collect().toSeq
    val inMemory = graft.queries.LlmOps.bpePretokEncode(spark, sf0001)
      .collect().toSeq
    assert(viaArtifact == inMemory)
  }

  test("t_pretok_edge: fixture segmentation hits every pattern branch; corpus invariants hold") {
    val rows = graft.queries.LlmOps.pretokEdge(spark, sf0001).collect()
    def toks(item: String): Seq[String] = rows.filter(_.getString(0) == item)
      .sortBy(_.getLong(1)).map(_.getString(2)).toSeq
    // all seven contraction suffixes ('s 't 're 've 'm 'll 'd)
    assert(toks("fix1") == Seq("don", "'t", " stop", ";", " it", "'s",
      " alice", "'s", " can", "'t", " and", " won", "'t"))
    assert(toks("fix4") == Seq("i", "'m", " we", "'re", " you", "'ve",
      " they", "'ll", " she", "'d", " mix", "'d", " o", "'", "clock"))
    // digit runs split from letters; dots split digit runs
    assert(toks("fix2") == Seq("abc", "123", " def", "456", " 7890",
      " x", "2", "y", " 3", ".", "14", " v", "2", ".", "0", ".", "1"))
    // punctuation runs: single, doubled, bracketed, ellipsis, symbols
    assert(toks("fix3") == Seq("hello", ",", " world", "!!", " (", "foo",
      ")", " --", " bar", "...", " #", "tag", " $", "5", ";", " a", "+",
      "b", "=", "c"))
    def cell(item: String): Long =
      rows.find(_.getString(0) == item).get.getLong(1)
    assert(cell("corpus_lossy_docs") == 0L,
      "concat(pretok) != norm_text on some corpus doc")
    assert(cell("corpus_n_pretokens") > 0L)
  }
}
