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

  test("hashed perceptron: epoch-1 weights equal bucket-summed gradients; bigrams counted") {
    // replicate the epoch-1 full-gradient sum by hand in bucket space:
    // with w0 = 0 every doc misclassifies, so w1[b] = sum over grams g
    // with bucket(g) = b of y * count(g)
    val w = Classify.perceptronTrainHashed(fixture, col("y"),
      buckets = 64, epochs = 1)
    assert(w.length == 1 && w.head.length == 65)
    def bucket(g: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      (1 + java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    val grams = Seq(
      (1, Seq("the", "of", "and", "the", "to")),
      (1, Seq("the", "the", "a", "of", "is")),
      (1, Seq("a", "to", "in", "the", "of")),
      (-1, Seq("zz", "qq", "xx", "zz", "yy")),
      (-1, Seq("qq", "qq", "zz", "xx", "xx")),
      (-1, Seq("yy", "zz", "qq", "xx", "qq")))
    val expect = new Array[Long](65)
    grams.foreach { case (y, t) =>
      val gs = t ++ t.sliding(2).map(_.mkString(" "))
      gs.foreach(g => expect(bucket(g)) += y)
      expect(0) += y // bias row: cnt 1 per doc
    }
    assert(w.head.toSeq == expect.toSeq,
      s"got ${w.head.toSeq}\nexp ${expect.toSeq}")
  }

  test("hashed model separates the planted fixture and beats chance on the sf0.001 holdout") {
    val w = Classify.perceptronTrainHashed(fixture, col("y"),
      buckets = 64, epochs = 6)
    val scored = Classify.perceptronScoreHashed(fixture, w.last, 64, col("y"))
      .collect()
    assert(scored.forall(r => r.getInt(3) == r.getInt(1)),
      s"misclassified: ${scored.filter(r => r.getInt(3) != r.getInt(1)).toSeq}")
    val pred = graft.queries.LlmOps.qualityClfNgPred(spark, sf0001).collect()
    assert(pred.nonEmpty)
    val acc = pred.count(r => r.getInt(3) == r.getInt(1)).toDouble / pred.length
    assert(acc > 0.5, s"hashed holdout accuracy $acc not better than chance")
  }

  test("MEASURED holdout accuracy: hashed (unigram+bigram) vs directory unigram at sf0.01") {
    // the verdict-requested comparison row: both models trained on the
    // same md5-split corpus, accuracy measured on the same holdout
    def accOf(rows: Array[org.apache.spark.sql.Row]) =
      rows.count(r => r.getInt(3) == r.getInt(1)).toDouble / rows.length
    val uni = accOf(graft.queries.LlmOps.qualityClfPred(spark, sf001).collect())
    val ng = accOf(graft.queries.LlmOps.qualityClfNgPred(spark, sf001).collect())
    info(f"sf0.01 holdout accuracy: unigram-directory $uni%.4f, hashed-ngram $ng%.4f")
    // the hashed space sees strictly more signal (bigrams) with no
    // directory truncation; allow a small collision penalty but it
    // must stay in the unigram model's league
    assert(ng >= uni - 0.10, f"hashed model collapsed: $ng%.4f vs $uni%.4f")
    assert(ng > 0.5 && uni > 0.5)
  }

  test("t_quality_clf_eval: confusion cells are internally consistent and match the pred gates") {
    val rows = graft.queries.LlmOps.qualityClfEval(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("dir_unigram", "hashed_ngram"))
    val preds = Map(
      "dir_unigram" -> graft.queries.LlmOps.qualityClfPred(spark, sf0001).collect(),
      "hashed_ngram" -> graft.queries.LlmOps.qualityClfNgPred(spark, sf0001).collect())
    rows.foreach { r =>
      val (model, tp, fp, fn, tn) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val (nCorrect, nTotal) = (r.getLong(5), r.getLong(6))
      assert(tp + fp + fn + tn == nTotal, s"$model cells do not tile the holdout")
      assert(nCorrect == tp + tn, s"$model accuracy numerator != tp + tn")
      // the eval row must be EXACTLY the pred gate's scoring, re-binned
      val p = preds(model)
      assert(nTotal == p.length.toLong)
      assert(nCorrect == p.count(x => x.getInt(3) == x.getInt(1)).toLong,
        s"$model eval row diverges from the pred gate")
    }
  }
}
