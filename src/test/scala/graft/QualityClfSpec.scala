package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Classify

/** Trained linear quality classifier (t_quality_clf): exact-integer
  * batch-perceptron semantics on a hand-computable fixture, convergence
  * to a separating hyperplane on a planted separable corpus, and the
  * gate wiring end to end. */
class QualityClfSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  // planted SEPARABLE corpus: +1 docs are stopword-ish prose, -1 docs
  // symbol soup — disjoint vocabularies, so a linear separator exists
  private def fixture = Seq(
    (1L, 1, "the of and the to"),
    (2L, 1, "the the a of is"),
    (3L, 1, "a to in the of"),
    (4L, -1, "zz qq xx zz yy"),
    (5L, -1, "qq qq zz xx xx"),
    (6L, -1, "yy zz qq xx qq")
  ).toDF("doc_id", "y", "text")

  test("epoch-1 weights equal the hand-computed full-gradient sum") {
    // with w0 = 0 every margin is 0 <= 0, so w1 = sum of y * x over ALL
    // docs — per token: (count in +1 docs) - (count in -1 docs)
    val m = Classify.perceptronTrain(fixture, col("y"),
      nFeatures = 16, epochs = 1)
    val byTok = m.features.map { case (i, t) => t -> m.weightsByEpoch.head(i) }.toMap
    // "the" appears 5x in +1 docs, 0x in -1 → +5; "qq" 0/5 → -5
    assert(byTok("the") == 5L, s"$byTok")
    assert(byTok("qq") == -5L, s"$byTok")
    assert(byTok("of") == 3L && byTok("zz") == -4L, s"$byTok")
    // bias: 3 docs at +1, 3 at -1 → 0
    assert(m.weightsByEpoch.head(0) == 0L)
  }

  test("perceptron converges on the separable fixture: 100% train accuracy") {
    val m = Classify.perceptronTrain(fixture, col("y"),
      nFeatures = 16, epochs = 6)
    val scored = Classify.perceptronScore(fixture, m, col("y")).collect()
    assert(scored.length == 6)
    assert(scored.forall(r => r.getInt(3) == r.getInt(1)),
      s"misclassified: ${scored.filter(r => r.getInt(3) != r.getInt(1)).toSeq}")
    // once separated, later epochs stop updating (no misclassified docs)
    val wLast = m.weightsByEpoch.last.toSeq
    val wPrev = m.weightsByEpoch(m.weightsByEpoch.length - 2).toSeq
    assert(wLast == wPrev, "weights still moving after separation")
  }

  test("feature space is the deterministic top-k; unseen tokens drop out") {
    val m = Classify.perceptronTrain(fixture, col("y"),
      nFeatures = 4, epochs = 1) // 3 token features + bias
    // top-3 by freq desc, token asc: the(4), qq(4) tie -> qq < the;
    // xx(4) ties too: ascending token order among the 4-freq group
    assert(m.features.map(_._2) == Seq("qq", "the", "xx"), s"${m.features}")
    // scoring a doc of only-unseen tokens gives bias-only score
    val scored = Classify.perceptronScore(
      Seq((9L, 1, "unknown words only")).toDF("doc_id", "y", "text"),
      m, col("y")).collect()
    assert(scored.head.getLong(2) == m.weightsByEpoch.last(0))
  }

  test("gate wiring: per-epoch weight table + holdout predictions at sf0.001") {
    val learn = graft.queries.LlmOps.qualityClfLearn(spark, sf0001).collect()
    assert(learn.nonEmpty)
    // epochs x (features + bias) rows, epoch 1..E each fully present
    val byEpoch = learn.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byEpoch.values.toSet.size == 1, s"ragged epochs: $byEpoch")
    assert(learn.exists(_.getString(1) == "_bias"))
    val pred = graft.queries.LlmOps.qualityClfPred(spark, sf0001).collect()
    assert(pred.nonEmpty)
    assert(pred.forall(r => r.getInt(3) == 1 || r.getInt(3) == -1))
    // the distilled rule is learnable from token counts: holdout
    // accuracy must beat chance (the 14-doc sf0.001 holdout is too
    // small to demand the majority baseline; the ORACLE pins the exact
    // predictions either way — this asserts the signal, not the noise)
    val acc = pred.count(r => r.getInt(3) == r.getInt(1)).toDouble / pred.length
    assert(acc > 0.5, s"holdout accuracy $acc not better than chance")
  }
}
