package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.UnigramTokens

/** Unigram-LM (SentencePiece-family) Viterbi segmentation: optimality
  * vs greedy longest-match, the longest-final-piece tie-break, the OOV
  * single-char floor, code-point symbol units, and the corpus gate's
  * cost/piece reconciliation. */
class UnigramSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val unk = 99000000L

  private def seg(word: String, vocab: Seq[(String, Long)]): Seq[String] =
    Seq(word).toDF("w")
      .select(UnigramTokens.unigram_encode(col("w"), vocab, unk))
      .head.getSeq[String](0)

  test("Viterbi beats greedy longest-match on a planted ambiguous word") {
    // greedy longest-match from the left grabs "abc" and is stuck with
    // an expensive "d"; the optimal split is "ab" + "cd"
    val vocab = Seq("a" -> 50L, "b" -> 50L, "c" -> 50L, "d" -> 900L,
      "ab" -> 10L, "cd" -> 10L, "abc" -> 10L)
    // greedy: abc(10) + d(900) = 910 ; viterbi: ab(10) + cd(10) = 20
    assert(seg("abcd", vocab) == Seq("ab", "cd"))
    // hand-replayed greedy for the record: longest prefix in vocab at
    // pos 0 is "abc" (len 3 beats "ab"/"a"), then "d"
    val greedy = {
      var i = 0; val out = Seq.newBuilder[String]
      val vs = vocab.map(_._1).toSet
      while (i < 4) {
        val l = (math.min(4, 4 - i) to 1 by -1)
          .find(n => vs.contains("abcd".substring(i, i + n))).get
        out += "abcd".substring(i, i + l); i += l
      }
      out.result()
    }
    assert(greedy == Seq("abc", "d")) // differs from the Viterbi answer
  }

  test("ties prefer the longest final piece (smallest j)") {
    // two optimal paths of equal cost 20: [xy, z] and [x, yz] — the DP
    // must pick the one whose FINAL piece is longer: [x, yz]
    val vocab = Seq("x" -> 10L, "y" -> 10L, "z" -> 10L,
      "xy" -> 10L, "yz" -> 10L)
    assert(seg("xyz", vocab) == Seq("x", "yz"))
  }

  test("OOV single code points cost the unk floor; longer misses are not candidates") {
    val vocab = Seq("a" -> 1L, "b" -> 1L)
    // 'q' is not in the vocabulary: it segments as its own unk piece
    assert(seg("aqb", vocab) == Seq("a", "q", "b"))
    // an entirely unknown word degrades to per-code-point pieces
    assert(seg("qq", vocab) == Seq("q", "q"))
  }

  test("symbols are code points (astral chars are one piece)") {
    val clef = new String(Character.toChars(0x1D11E)) // U+1D11E, 2 UTF-16 units
    val vocab = Seq("a" -> 1L)
    assert(seg(s"a${clef}a", vocab) == Seq("a", clef, "a"))
  }

  test("t_unigram_encode gate: costs reconcile with the vocab, multi-char pieces used") {
    val out = graft.queries.LlmOps.unigramEncode(spark, SharedSpark.sf0001).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val pieces = r.getString(3).split(" ").toSeq
      assert(pieces.mkString == r.getString(0), s"pieces don't respell '${r.getString(0)}'")
      assert(r.getLong(2) == pieces.length.toLong)
      assert(r.getLong(2) <= r.getString(0).length.toLong)
    }
    // the learned vocabulary actually compresses: some word uses a
    // multi-char piece (fewer pieces than characters)
    assert(out.exists(r => r.getLong(2) < r.getString(0).length.toLong),
      "no word segmented with a multi-char piece")
  }

  test("t_pack_unigram: sequence budgets reconcile with per-word piece counts") {
    val enc = graft.queries.LlmOps.unigramEncode(spark, SharedSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, SharedSpark.sf0001)
      .select(col("doc_id"), graft.text.norm_text(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val wantTotal = docs.map(_._2.map(enc).sum).sum
    val out = graft.queries.LlmOps.packUnigram(spark, SharedSpark.sf0001).collect()
    assert(out.map(_.getLong(2)).sum == wantTotal,
      "packed token total != sum of per-word Viterbi piece counts")
    assert(out.map(_.getLong(1)).sum == docs.length.toLong)
  }

  test("t_unigram_prune: dropped pieces vanish, live drops force re-segmentation") {
    val v0 = graft.queries.LlmOps.unigramEncode(spark, SharedSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSeq
    val out = graft.queries.LlmOps.unigramPrune(spark, SharedSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(out.map(_._1) == v0.map(_._1)) // same vocabulary of words
    // n_pieces_v0 agrees with the standalone encode gate
    val v0counts = v0.map(r => r._1 -> r._3.split(" ").length.toLong).toMap
    out.foreach { case (w, n0, _, _) => assert(n0 == v0counts(w)) }
    // recount the prune driver-side: usage over V0 segmentations,
    // 12 least-used multi-char pieces drop (ties by piece asc)
    val usage = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    v0.foreach { case (_, f, pieces) =>
      pieces.split(" ").foreach(p => usage(p) += f) }
    val multiV0 = v0.flatMap(_._3.split(" ")).distinct // used pieces only
    // the V0 vocabulary's multi pieces include UNUSED ones the spec
    // can't see from encode output alone — so check the containment
    // direction: no piece in the pruned output may be one of the 12
    // least-used (usage asc, piece asc) among pieces we can rank
    val survivors = out.flatMap(_._4.split(" ")).toSet
    val rankedUsed = multiV0.filter(_.length > 1)
      .map(p => (usage(p), p)).sorted
    // at least one USED multi piece was pruned (K exceeds the dead
    // count) and its words re-segmented
    assert(out.exists { case (_, n0, n1, _) => n0 != n1 },
      "prune round changed no segmentation — K too small to bite")
    val prunedLive = rankedUsed.map(_._2).filterNot(survivors)
    assert(prunedLive.nonEmpty, "no live piece was pruned")
    // pruned live pieces are a PREFIX of the usage ranking (the least
    // used go first; dead pieces rank before any live one)
    val k = prunedLive.map(p => rankedUsed.indexWhere(_._2 == p)).max
    assert(rankedUsed.take(k + 1).map(_._2).toSet.subsetOf(
      prunedLive.toSet ++ rankedUsed.take(k + 1).map(_._2).filter(survivors)),
      "pruned set is not usage-ranked")
    assert(prunedLive.toSet ==
      rankedUsed.take(prunedLive.size).map(_._2).toSet,
      "pruned live pieces are not exactly the least-used ones")
    // single code points never prune: every word still respells
    out.foreach { case (w, _, _, ps) =>
      assert(ps.split(" ").mkString == w, s"$w does not respell") }
  }

  test("t_unigram_em: 3 hard-EM rounds descend the vocab, later rounds re-segment") {
    val out = graft.queries.LlmOps.unigramEm(spark, SharedSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(out.nonEmpty)
    // coverage never breaks: final pieces respell every word
    out.foreach { case (w, _, _, _, _, ps) =>
      assert(ps.split(" ").mkString == w, s"$w does not respell") }
    // the descent hit its target: 24 - 3*6 = 6 multi pieces can
    // survive, so the final segmentations use at most 6 distinct ones
    val multisUsed = out.flatMap(_._6.split(" ")).filter(
      p => p.codePointCount(0, p.length) > 1).distinct
    assert(multisUsed.length <= 6,
      s"${multisUsed.length} multi pieces used after a descent to 6")
    // round 1 agrees with the V0 count only if no LIVE piece dropped;
    // EM must actually move: at least TWO distinct rounds re-segment
    // some word (one round = the prune gate; the loop is the point)
    val moved = Seq(
      out.exists(r => r._2 != r._3),
      out.exists(r => r._3 != r._4),
      out.exists(r => r._4 != r._5)).count(identity)
    assert(moved >= 2, "EM descent is trivial at this fixture")
    // piece counts never shrink as the vocabulary shrinks HERE (the
    // fixture's renorm deltas are non-negative): each word's count is
    // monotone non-decreasing across rounds
    out.foreach { case (w, n0, n1, n2, n3, _) =>
      assert(n0 <= n1 && n1 <= n2 && n2 <= n3, s"$w count shrank") }
  }
}
