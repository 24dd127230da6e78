package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measures the sample-learning divergence bound the
  * [[graft.queries.LlmOps.bpeLearnSampled]] docstring promises, at
  * sf0.1 (the bench SF) with a deterministic 1-in-4 document sample.
  *
  * The merge LISTS are not order-identical here — the synthetic corpus
  * draws words near-uniformly, so adjacent-pair frequencies tie within
  * sampling noise and ranks reshuffle (a Zipfian natural corpus
  * separates ranks far more). What sampling must preserve is the
  * TOKENIZER, measured two ways:
  *
  *  - merge-pair overlap: the sampled run re-discovers most of the
  *    full-corpus merge set (order aside);
  *  - compression agreement (the bound that matters downstream): the
  *    corpus BPE token count under the sampled tokenizer stays within
  *    2% of the full-corpus tokenizer's — token BUDGETS, packing, and
  *    mixing decisions are insensitive to the sampling.
  */
class BpeSampleSpec extends AnyFunSuite {
  import SharedSpark._

  test("1/4-sample BPE learning at sf0.1: high merge overlap, <=2% compression drift") {
    val full = graft.queries.LlmOps.bpeLearnSampled(spark, sf01, sampleMod = 1)
      .map(m => (m._1, m._2))
    val sampled = graft.queries.LlmOps.bpeLearnSampled(spark, sf01, sampleMod = 4)
      .map(m => (m._1, m._2))
    assert(full.size == 32 && sampled.size == 32)
    val overlap = full.toSet.intersect(sampled.toSet).size
    info(s"merge-pair overlap: $overlap/32")
    assert(overlap >= 16, s"sampled learning re-discovered only $overlap/32 merges")
    def corpusTokens(merges: Seq[(String, String)]): Long =
      Tables.documents(spark, sf01)
        .select(sum(org.apache.spark.sql.graft.BpeTokens
          .bpe_count(graft.text.tokens(col("text")), merges)).cast("long").as("n"))
        .collect().head.getLong(0)
    val (nFull, nSampled) = (corpusTokens(full), corpusTokens(sampled))
    val drift = math.abs(nSampled - nFull).toDouble / nFull
    info(f"corpus BPE tokens: full=$nFull sampled=$nSampled drift=${drift * 100}%.3f%%")
    assert(drift <= 0.02,
      f"sampled tokenizer drifted ${drift * 100}%.2f%% in corpus token count")
  }
}
