package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over token counts — the classic learned
  * document classifier for corpus curation (language / domain / quality
  * routing), as two declarative plans: [[nbTrain]] produces the model
  * TABLES (class priors + per-class token counts), [[nbScore]] joins
  * them onto test-document tokens and arg-maxes the posterior.
  *
  * Cross-engine determinism (the repo's quantized-exact convention):
  * every log-likelihood is quantized to a 1e-9 grid as a BIGINT at the
  * leaf — `round(ln((cnt+1)/(tot_c+V)) * 1e9)` — so the per-document
  * score is an EXACT INTEGER SUM (partition/merge order cannot perturb
  * it), the argmax compares integers, and the reported score is one
  * IEEE division off the integer. Laplace (+1) smoothing handles
  * test tokens unseen in a class (or unseen entirely).
  *
  * Scale shape: training is one shuffle on (class, token) with map-side
  * combine; the model is vocab×classes rows — broadcast when it fits,
  * shuffle-join on token otherwise (token skew on stopword-like heavy
  * tokens follows the same salting rule as the dedup banding paths).
  * Scoring is join → one aggregation by (doc, class); the class
  * dimension is a broadcast. */
object Classify {

  private val Grid = 1e9

  /** Quantized-log model tables from labeled training docs:
    * (class, token, llq) token log-likelihoods — including one
    * `token = NULL` row per class carrying the unseen-token likelihood
    * — plus (class, priorq) log-priors. Both long-quantized. */
  def nbTrain(train: DataFrame, classCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val toks = train.select(col(classCol).as("cls"),
      explode(tokens(col(textCol))).as("t"))
    // ONE corpus-scale aggregation; class totals and the vocabulary size
    // derive from this vocab×classes-sized frame rather than re-scanning
    // the token stream (persisted: three consumers in the model plan —
    // released by the harness via IntermediateCaches)
    val cnt = graft.util.IntermediateCaches.track(
      toks.groupBy(col("cls"), col("t")).agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // tot (classes rows) and vocab (1 row) each feed BOTH the seen and
    // unseen branches — cached so neither branch replays the aggregate
    // over the token counts (round-12 exchange diet; each replay was a
    // full extra shuffle pair in the executed plan)
    val tot = graft.util.IntermediateCaches.track(
      cnt.groupBy(col("cls")).agg(sum(col("c")).as("tc"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val vocab = graft.util.IntermediateCaches.track(
      cnt.agg(countDistinct(col("t")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def llq(c: Column) = round(
      log((c + lit(1)).cast("double") / (col("tc") + col("v")).cast("double"))
        * Grid).cast("long")
    val seen = cnt.join(tot, "cls").crossJoin(broadcast(vocab))
      .select(col("cls"), col("t"), llq(col("c")).as("llq"))
    val unseen = tot.crossJoin(broadcast(vocab))
      .select(col("cls"), lit(null).cast("string").as("t"),
        llq(lit(0L)).as("llq"))
    val nDocs = train.agg(count(lit(1)).as("n"))
    // priors are classes-sized but their SUBPLAN is two corpus scans
    // (class counts + total) — and nbScore broadcasts priors at three
    // places, each of which would replay both scans. Caching the tiny
    // frame is the t_token_budget trunk discipline: the round-10/11
    // plan audits attributed nb_classify's exchange bloat to exactly
    // this replayed subplan.
    val priors = graft.util.IntermediateCaches.track(
      train.groupBy(col(classCol).as("cls"))
        .agg(count(lit(1)).as("nc"))
        .crossJoin(broadcast(nDocs))
        .select(col("cls"),
          round(log(col("nc").cast("double") / col("n").cast("double")) * Grid)
            .cast("long").as("priorq"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // the MODEL is the cached trunk (vocab×classes rows — small):
    // nbScore filters it twice (seen/unseen split) and each branch
    // would otherwise replay the tot/vocab aggregates over the token
    // counts — the round-10 plan audit counted those duplicated
    // exchanges as nb_classify's main plan bloat
    val model = graft.util.IntermediateCaches.track(
      seen.unionByName(unseen)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    (model, priors)
  }

  /** Score test docs against an [[nbTrain]] model: one row per doc with
    * the argmax class, its quantized integer score, and the score as a
    * double (one division off the integer, rounded for hashing).
    * Tie-break on equal integer scores: class name ascending. */
  def nbScore(test: DataFrame, likelihoods: DataFrame, priors: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val unseenLl = likelihoods.filter(col("t").isNull)
      .select(col("cls"), col("llq").as("unseenq"))
    val seenLl = likelihoods.filter(col("t").isNotNull)
    // ONE doc-keyed partitioning for the whole scoring chain: the
    // token-count aggregate shuffles on (doc, t) with map-side combine,
    // then ONE narrow repartition on doc — after which the per-(doc,
    // class) aggregate AND the argmax window are both satisfied by the
    // existing HashPartitioning(doc) and add no further exchange
    // (round-12 diet: previously each stage re-shuffled). Scale shape:
    // what moves in the extra shuffle is the counted (doc, token, m)
    // frame — never raw text — and per-doc grouping has no hot key.
    val toks = test.select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("m"))
      .repartition(col(idCol))
    val perClass = toks
      .crossJoin(broadcast(priors.select(col("cls"))))
      .join(seenLl, Seq("cls", "t"), "left")
      .join(broadcast(unseenLl), Seq("cls"))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("m") * coalesce(col("llq"), col("unseenq"))).as("tokq"))
      .join(broadcast(priors), Seq("cls"))
      .select(col(idCol), col("cls"), (col("priorq") + col("tokq")).as("scoreq"))
    val best = row_number().over(
      Window.partitionBy(col(idCol)).orderBy(col("scoreq").desc, col("cls")))
    perClass.withColumn("rk", best).filter(col("rk") === 1)
      .select(col(idCol), col("cls").as("pred"), col("scoreq"),
        round(col("scoreq").cast("double") / Grid, 6).as("score"))
  }

  /** Train-on-most, score-held-out in one plan (the gate shape): docs
    * whose id md5 starts with '0' (a deterministic ~1/16 split, same
    * hex-bucket convention as Sampling) are held out and scored by a
    * model trained on the rest. Output: doc_id, actual class, predicted
    * class, quantized + readable score. */
  def nbClassifyHoldout(s: SparkSession, docs: DataFrame,
      classCol: String, idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val bucket = substring(md5(col(idCol).cast("string").cast("binary")), 1, 1)
    val train = docs.filter(bucket =!= "0")
    val test = docs.filter(bucket === "0")
    val (ll, priors) = nbTrain(train, classCol, textCol)
    nbScore(test, ll, priors, idCol, textCol)
      .join(docs.select(col(idCol), col(classCol).as("actual")), Seq(idCol))
      .select(col(idCol), col("actual"), col("pred"), col("scoreq"), col("score"))
  }

  // --------------------------------------------------- linear classifier

  /** The trained feature space of [[perceptronTrain]]: token → feature
    * index (1-based; index 0 is the bias), chosen as the train corpus's
    * top `nFeatures - 1` tokens by (freq DESC, token ASC) — the same
    * deterministic top-k discipline as the OOV vocabulary. */
  final case class LinearModel(features: Seq[(Int, String)],
      weightsByEpoch: Seq[Array[Long]])

  /** Batch ("pocket-less") PERCEPTRON over token-count features — the
    * trained linear quality classifier of the GPT-3/LLaMA curation
    * lineage (a fastText-class filter: linear weights over n-gram
    * features), reduced to its exactly-replayable core. Each epoch is
    * one full gradient pass: every doc with margin y·(w·x) ≤ 0
    * contributes y·x to the weight update — EVERY quantity an integer
    * (counts × ±1 labels × integer weights), so the DuckDB oracle
    * replays all epochs bit-for-bit; no learning rate, no float ever.
    * Per-sample SGD would impose a serial doc order — the batch update
    * is the distributed formulation of the same learning rule.
    *
    * Scale shape: feature selection is one map-side-combined token
    * count + a driver-sized top-k collect; the (doc, feature, count)
    * design matrix is built ONCE, hard-severed ([[graft.util.Lineage
    * .sever]]) and re-read per epoch; each epoch is one doc-keyed
    * window pass + one 64-group aggregate whose result (the weight
    * delta) is dimension-sized by contract — the BPE argmax-collect
    * pattern, extended from one row to F rows. Weights ride back in as
    * a literal map, so no epoch ever shuffles the corpus. */
  def perceptronTrain(train: DataFrame, labelCol: Column,
      nFeatures: Int, epochs: Int,
      idCol: String = "doc_id", textCol: String = "text"): LinearModel = {
    require(nFeatures >= 2 && epochs >= 1, s"bad dims: $nFeatures/$epochs")
    val feats = train
      .select(explode(tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("t")).limit(nFeatures - 1)
      .collect().map(_.getString(0))
      .zipWithIndex.map { case (t, i) => (i + 1, t) }.toSeq
    // the matrix is doc-PARTITIONED before the sever: localCheckpoint
    // preserves outputPartitioning, so every epoch's doc-keyed window
    // reads the checkpoint blocks in place — ZERO per-epoch exchanges
    // for the margin pass (only the nWeights-row delta aggregate
    // shuffles). Measured at sf0.1: the 8-epoch hashed training
    // dropped ~2x once the per-epoch window shuffle disappeared.
    val (x, releaseX) = graft.util.Lineage.sever(designMatrix(
      train.select(col(idCol).as("doc"), labelCol.cast("int").as("y"),
        col(textCol).as("txt")), feats)
      .repartition(col("doc")))
    // sized to the REALIZED feature count (a small corpus can have
    // fewer distinct tokens than requested features) + the bias slot
    try LinearModel(feats, epochLoop(x, feats.length + 1, epochs))
    finally releaseX(false)
  }

  /** The shared per-epoch gradient pass over a severed (doc, y, fidx,
    * cnt) design matrix: margins under w{e-1} via one doc-keyed window,
    * misclassified-set deltas via one nWeights-row aggregate, weights
    * back as a literal map — no epoch shuffles the corpus. */
  private def epochLoop(x: DataFrame, nWeights: Int,
      epochs: Int): Seq[Array[Long]] = {
    val w = new Array[Long](nWeights)
    val byEpoch = Seq.newBuilder[Array[Long]]
    var e = 0
    while (e < epochs) {
      // weights as an ARRAY literal, indexed at fidx+1: element_at on a
      // literal map is a LINEAR scan of the (nWeights)-entry map per
      // row (round-19 optimization — at 64 buckets × matrix rows ×
      // epochs that scan dominated the margin pass); array indexing is
      // O(1) and value-identical (fidx ∈ [0, nWeights) by construction)
      val wArr = array(w.map(lit(_)).toIndexedSeq: _*)
      val s = sum(col("cnt") * element_at(wArr, col("fidx") + 1))
        .over(Window.partitionBy(col("doc")))
      val deltas = x
        .withColumn("s", s)
        .filter(col("y") * col("s") <= 0)
        .groupBy(col("fidx"))
        .agg(sum(col("y") * col("cnt")).as("d"))
        .collect()
      deltas.foreach(r => w(r.getInt(0)) += r.getLong(1))
      byEpoch += w.clone()
      e += 1
    }
    byEpoch.result()
  }

  /** HASHED-n-gram perceptron — fastText's actual feature space:
    * (unigram + bigram) grams hash into `buckets` md5 slots
    * ([[graft.sketch.Sketch.hash60]] mod buckets, 1-based; fidx 0
    * stays the bias), no feature directory, no vocabulary collect —
    * the feature space is CLOSED under new tokens, the property that
    * lets the trained filter run on a 100 TB crawl whose tail
    * vocabulary the training corpus never saw. Same exact-integer
    * epochs as [[perceptronTrain]] over the same severed-matrix
    * machinery; the DuckDB oracle replays the bucketing arithmetic
    * verbatim. Returns the per-epoch weight arrays (buckets + 1). */
  def perceptronTrainHashed(train: DataFrame, labelCol: Column,
      buckets: Int, epochs: Int,
      idCol: String = "doc_id", textCol: String = "text"): Seq[Array[Long]] = {
    require(buckets >= 2 && epochs >= 1, s"bad dims: $buckets/$epochs")
    val (x, releaseX) = graft.util.Lineage.sever(designMatrixHashed(
      train.select(col(idCol).as("doc"), labelCol.cast("int").as("y"),
        col(textCol).as("txt")), buckets)
      .repartition(col("doc"))) // see perceptronTrain: epoch windows shuffle-free
    try epochLoop(x, buckets + 1, epochs)
    finally releaseX(false)
  }

  /** Score docs under final hashed weights — the map-only applied
    * filter ([[perceptronScore]]'s twin for the hashed space). */
  def perceptronScoreHashed(docs: DataFrame, weights: Array[Long],
      buckets: Int, labelCol: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val x = designMatrixHashed(docs.select(col(idCol).as("doc"),
      labelCol.cast("int").as("y"), col(textCol).as("txt")), buckets)
    // array-literal weights, O(1) per-row lookup (see epochLoop)
    val wArr = array(weights.map(lit(_)).toIndexedSeq: _*)
    x.groupBy(col("doc"), col("y"))
      .agg(sum(col("cnt") * element_at(wArr, col("fidx") + 1)).as("score"))
      .select(col("doc").as(idCol), col("y"), col("score"),
        when(col("score") > 0, 1).otherwise(-1).as("pred"))
  }

  /** (doc, y, fidx, cnt) under hashed (unigram + bigram) features:
    * fidx(g) = 1 + hash60(g) % buckets; bigrams join adjacent tokens
    * with one space (so the gram string is replayable as
    * `t[i] || ' ' || t[i+1]`). The empty-word sequence trap
    * (sequence(1, 0) is a descending ramp) is guarded like
    * Bpe.byteSyms. */
  private def designMatrixHashed(docs: DataFrame, buckets: Int): DataFrame =
    // One-pass codegen'd per-doc feature counts (round-19 optimization;
    // HashedGramCountsSpec pins value equality with the explode →
    // hash60 → groupBy(doc, fidx) chain this replaces): with
    // buckets-bounded features the per-doc aggregation completes inside
    // the expression, so the matrix build is MAP-ONLY — the former
    // corpus-scale (doc, fidx) shuffle aggregate (the gate's largest
    // exchange) disappears, along with the interpreted bigram-concat
    // lambda and the gram-string explode.
    docs.select(col("doc"), col("y"),
        explode(org.apache.spark.sql.graft.HashedGramCounts
          .hashed_gram_counts(tokens(col("txt")), buckets)).as("fc"))
      .select(col("doc"), col("y"),
        col("fc.fidx").as("fidx"), col("fc.cnt").as("cnt"))
      .unionByName(docs.select(col("doc"), col("y"),
        lit(0).as("fidx"), lit(1L).as("cnt")))

  /** (doc, y, fidx, cnt) integer design matrix under a feature list —
    * token-count features plus the constant bias row (fidx 0, cnt 1).
    * Tokens outside the feature space drop out (truncated vocabulary,
    * the standard linear-filter feature hashing stand-in). */
  private def designMatrix(docs: DataFrame, feats: Seq[(Int, String)]): DataFrame = {
    // O(1) hash lookup instead of element_at over a literal map (a
    // linear scan of the feature directory per corpus token —
    // round-19 optimization; value-identical, LookupSpec)
    val featEntries = feats.map { case (i, t) => (t, i) }
    docs.select(col("doc"), col("y"),
        explode(tokens(col("txt"))).as("t"))
      .select(col("doc"), col("y"),
        org.apache.spark.sql.graft.StringToIntLookup
          .lookup(col("t"), featEntries).as("fidx"))
      .filter(col("fidx").isNotNull)
      .groupBy(col("doc"), col("y"), col("fidx"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .unionByName(docs.select(col("doc"), col("y"),
        lit(0).as("fidx"), lit(1L).as("cnt")))
  }

  /** Score docs under a trained [[LinearModel]]'s FINAL weights:
    * (idCol, y, score, pred) with pred = +1 iff w·x > 0 — the applied
    * quality filter. Map-only: the model rides as two literal maps.
    *
    * FINAL weights here vs AVERAGED in [[perceptronScoreHashed]]'s
    * caller is deliberate, not drift: the directory feature space is
    * low-collision (each fidx is one literal token), so the batch
    * perceptron's final epoch sits in a stable phase and final ==
    * averaged up to scale on this corpus family — whereas the hashed
    * space's collision-CORRELATED features make the final epoch
    * oscillate between separating phases (measured: a raw final epoch
    * landed at 0.14 holdout accuracy), so the hashed model ships the
    * Freund–Schapire averaged weights. Both configurations are
    * hash-pinned side by side by the t_quality_clf_eval gate. */
  def perceptronScore(docs: DataFrame, model: LinearModel, labelCol: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = model.weightsByEpoch.last
    val x = designMatrix(docs.select(col(idCol).as("doc"),
      labelCol.cast("int").as("y"), col(textCol).as("txt")), model.features)
    // array-literal weights, O(1) per-row lookup (see epochLoop)
    val wArr = array(w.map(lit(_)).toIndexedSeq: _*)
    x.groupBy(col("doc"), col("y"))
      .agg(sum(col("cnt") * element_at(wArr, col("fidx") + 1)).as("score"))
      .select(col("doc").as(idCol), col("y"), col("score"),
        when(col("score") > 0, 1).otherwise(-1).as("pred"))
  }
}
