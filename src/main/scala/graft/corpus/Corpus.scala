package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the stages that turn a cleaned document
  * set into training-ready data: deterministic global shuffle, packing
  * documents into fixed-token-budget sequences, and benchmark
  * decontamination.
  *
  * The first two need a GLOBAL order (a total shuffle rank, a running
  * token offset), and the naive formulation — one window function over
  * the whole corpus — collapses onto a single partition, the classic
  * scale-killer. Both instead use a two-pass bucketed prefix: rows get
  * a coarse deterministic bucket key; pass 1 aggregates one row per
  * bucket (count or token sum — map-side combined, dimension-sized
  * output); the exclusive prefix over THAT tiny frame is a window over
  * #buckets rows; pass 2 joins the broadcast offsets back and runs the
  * per-bucket window, which parallelizes across buckets. Global value =
  * bucket offset + intra-bucket running value. At 100 TB the only
  * single-partition work is the prefix over the bucket summary
  * (millions of rows of two longs, not the corpus). */
object Corpus {

  /** Exclusive prefix offsets over a per-bucket summary: input one row
    * per bucket with an additive `weight`, output (bucket, offset)
    * where offset = Σ weight of all LOWER buckets. The window here runs
    * over the bucket summary only — dimension-sized by construction —
    * and the result is broadcast back to the corpus-sized side. */
  private def bucketOffsets(perBucket: DataFrame, bucketCol: String,
      weightCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(bucketCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perBucket.select(col(bucketCol),
      coalesce(sum(col(weightCol)).over(w), lit(0L)).as("bucket_offset"))
  }

  /** Deterministic global shuffle rank — every training pipeline's
    * "shuffle the corpus, reproducibly" step. Order is (md5(id), id):
    * uniform, seedable by salting the id, and identical on any cluster
    * size. Returns (idCol, rank) with rank ∈ [1, N] dense over the
    * corpus.
    *
    * Buckets are the first two hex chars of the hash key (256 buckets,
    * each ~N/256 rows); because the bucket is a PREFIX of the ordering
    * key, (bucket, key, id) order equals global (key, id) order, so
    * bucket_offset + intra-bucket row_number IS the global rank. */
  def shuffleRank(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val keyed = docs.select(col(idCol),
      md5(col(idCol).cast("string").cast("binary")).as("hk"))
      .withColumn("bkt", substring(col("hk"), 1, 2))
    val offsets = bucketOffsets(
      keyed.groupBy(col("bkt")).agg(count(lit(1)).as("n")), "bkt", "n")
    val perBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col("hk"), col(idCol))
    keyed.join(broadcast(offsets), "bkt")
      .select(col(idCol),
        (col("bucket_offset") + row_number().over(perBucket)).as("rank"))
  }

  /** Pack documents into fixed-token-budget training sequences:
    * documents are laid out contiguously in `idCol` order (the order is
    * the contract — run [[shuffleRank]] first and pack by rank for a
    * shuffled layout) and a document belongs to the sequence its START
    * offset falls in: seq_id = floor(exclusive_token_cumsum / budget).
    * This is the "concatenate the corpus, chop every `budget` tokens,
    * never split a document" packing: each sequence holds ≥⌊budget /
    * max_doc_tokens⌋ docs and overflows by at most one document past
    * the budget boundary (the straddler starts inside the sequence).
    *
    * Output: one row per sequence — (seq_id, n_docs, n_tokens,
    * first_doc, last_doc).
    *
    * `tokensOf` maps the document row to its token count (a Column so
    * callers can plug a real tokenizer's count column); `bucketSize`
    * sets the coarse id-range bucket for the two-pass prefix (see the
    * object scaladoc) — any value ≫ 1 works, smaller = more parallel
    * buckets, larger = smaller bucket summary.
    *
    * BUCKET-KEY CHOICE RULE (skew): per-bucket rows are bounded by
    * `bucketSize` by construction (ids are unique), so no id
    * distribution can make one bucket hot beyond the parameter — but a
    * SPARSE id space (hashed 64-bit ids, tombstoned ranges) degrades
    * the OTHER side: the bucket summary approaches one row per doc and
    * the "dimension-sized" offsets window becomes corpus-sized. Rule:
    * keep idRange / bucketSize ≪ corpus (summary stays tiny), or —
    * the robust default — pre-rank with [[shuffleRank]] and pack on
    * the dense 1..N rank, which also gives the shuffled layout
    * training wants anyway. ([[shuffleRank]] itself is immune: its
    * buckets are an md5 PREFIX, uniform for any id space.) Spec'd in
    * CorpusSpec "skew stress". */
  def packSequences(docs: DataFrame, tokensOf: Column, budget: Int,
      idCol: String = "doc_id", bucketSize: Int = 4096): DataFrame =
    packOffsets(docs, tokensOf, budget, idCol, bucketSize)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))

  /** The per-document PLACEMENT behind [[packSequences]] — one row per
    * doc: (idCol, ntok, seq_id, offset_in_seq). This is the pack
    * MANIFEST a trainer actually consumes (which sequence each document
    * lands in and at which token offset — the attention-boundary /
    * position-id input of sequence-packed training), where
    * [[packSequences]] is its per-sequence summary. Same bucketed
    * two-pass prefix, no extra shuffle — the manifest is the pre-
    * aggregation frame. */
  def packManifest(docs: DataFrame, tokensOf: Column, budget: Int,
      idCol: String = "doc_id", bucketSize: Int = 4096): DataFrame =
    packOffsets(docs, tokensOf, budget, idCol, bucketSize)
      .select(col(idCol), col("ntok"), col("seq_id"),
        (col("start_offset") - col("seq_id") * budget).as("offset_in_seq"))

  private def packOffsets(docs: DataFrame, tokensOf: Column, budget: Int,
      idCol: String, bucketSize: Int): DataFrame = {
    require(budget > 0 && bucketSize > 1)
    val toks = docs.select(col(idCol), tokensOf.cast("long").as("ntok"))
      .withColumn("bkt", (col(idCol) / lit(bucketSize)).cast("long"))
    val offsets = bucketOffsets(
      toks.groupBy(col("bkt")).agg(sum(col("ntok")).as("t")), "bkt", "t")
    val perBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    toks.join(broadcast(offsets), "bkt")
      .select(col(idCol), col("ntok"),
        (col("bucket_offset") + sum(col("ntok")).over(perBucket) - col("ntok"))
          .as("start_offset"))
      .select(col(idCol), col("ntok"), col("start_offset"),
        floor(col("start_offset") / lit(budget.toDouble)).cast("long").as("seq_id"))
  }

  /** STRICT-budget packing — the no-straddle discipline: a document that
    * does not fit in the open sequence CLOSES it and starts the next one
    * (next-fit bin packing in `idCol` order), so every sequence's token
    * total is ≤ `budget` — no straddler overflow — except a single
    * oversized document (ntok > budget), which sits ALONE in its own
    * over-budget sequence. Real trainers run both disciplines:
    * [[packSequences]]' chop-at-boundary layout wastes zero tokens but
    * lets the last document overflow (the trainer truncates or wraps);
    * strict packing never overflows but leaves tail slack in each
    * sequence. Use the one the trainer's attention layout expects.
    *
    * A GLOBAL next-fit is inherently sequential (each boundary depends
    * on the residual fill of everything before it), which no two-pass
    * prefix can reproduce — so the discipline here is BUCKET-ALIGNED
    * next-fit: documents are packed within their `bucketSize`-wide id
    * bucket (each bucket starts a fresh sequence) and sequence ids are
    * stitched globally by the same dimension-sized prefix pass as
    * [[packSequences]] (offset = Σ sequences of lower buckets). Sequences
    * never span a bucket boundary — the per-shard packing every sharded
    * training layout uses anyway, and the property that makes the
    * operator embarrassingly parallel: each bucket's fold touches only
    * its own ≤ `bucketSize` documents.
    *
    * Per-bucket work is a `collect_list` + sorted `aggregate` fold —
    * O(b²) element copies per bucket (the fold appends to an array),
    * so keep `bucketSize` in the hundreds-to-low-thousands; buckets
    * process independently across the cluster, and the only global
    * coordination is the per-bucket sequence-count prefix (two longs per
    * bucket). Output: one row per document — (idCol, ntok, seq_id,
    * offset_in_seq), the same manifest shape as [[packManifest]]. */
  def packStrictManifest(docs: DataFrame, tokensOf: Column, budget: Int,
      idCol: String = "doc_id", bucketSize: Int = 1024): DataFrame = {
    require(budget > 0 && bucketSize > 1)
    val outType = "array<struct<id:bigint,ntok:bigint,seq:bigint,off:bigint>>"
    val toks = docs.select(col(idCol), tokensOf.cast("long").as("ntok"))
      .withColumn("bkt", (col(idCol) / lit(bucketSize)).cast("long"))
    // per-bucket doc list in id order: collect_list order is partition-
    // dependent, so array_sort on (id, ntok) structs (id is the leading
    // field) restores the deterministic fold order
    val folded = toks
      .groupBy(col("bkt"))
      .agg(array_sort(collect_list(struct(col(idCol).as("id"), col("ntok")))).as("ds"))
      .select(col("bkt"), aggregate(
        col("ds"),
        struct(lit(0L).as("fill"), lit(-1L).as("seq"),
          array().cast(outType).as("out")),
        (acc, d) => {
          // seq = -1 is the "no open sequence" sentinel: the first doc
          // always opens sequence 0, even when it alone exceeds budget
          val newSeq = (acc.getField("fill") + d.getField("ntok") > budget) ||
            (acc.getField("seq") < 0)
          val seq2 = when(newSeq, acc.getField("seq") + 1)
            .otherwise(acc.getField("seq"))
          val off = when(newSeq, lit(0L)).otherwise(acc.getField("fill"))
          val fill2 = when(newSeq, d.getField("ntok"))
            .otherwise(acc.getField("fill") + d.getField("ntok"))
          struct(fill2.as("fill"), seq2.as("seq"),
            concat(acc.getField("out"), array(struct(
              d.getField("id").as("id"), d.getField("ntok").as("ntok"),
              seq2.as("seq"), off.as("off")))).as("out"))
        },
        acc => struct(acc.getField("out").as("out"),
          (acc.getField("seq") + 1).as("nseq"))).as("r"))
    val offsets = bucketOffsets(
      folded.select(col("bkt"), col("r.nseq").as("nseq")), "bkt", "nseq")
    folded.join(broadcast(offsets), "bkt")
      .select(col("bucket_offset"), explode(col("r.out")).as("d"))
      .select(col("d.id").as(idCol), col("d.ntok").as("ntok"),
        (col("bucket_offset") + col("d.seq")).as("seq_id"),
        col("d.off").as("offset_in_seq"))
  }

  /** Per-sequence summary of [[packStrictManifest]] — same output shape
    * as [[packSequences]] (seq_id, n_docs, n_tokens, first_doc,
    * last_doc), under the strict discipline: n_tokens ≤ budget for every
    * sequence except a singleton holding one oversized document. */
  def packStrict(docs: DataFrame, tokensOf: Column, budget: Int,
      idCol: String = "doc_id", bucketSize: Int = 1024): DataFrame =
    packStrictManifest(docs, tokensOf, budget, idCol, bucketSize)
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))

  /** Benchmark decontamination: flag corpus documents sharing ≥ 1 word
    * `n`-gram with a benchmark/eval set — the n-gram-overlap
    * contamination check of the published LLM training pipelines
    * (typically n ≈ 8–13; the gate uses a smaller n scaled to its
    * synthetic short documents). Returns (idCol, n_shared) with
    * n_shared = count of DISTINCT contaminated n-grams per document,
    * only for contaminated documents.
    *
    * Scale shape: a benchmark is fixed-size (it does not grow with the
    * corpus), so its distinct n-gram set is always dimension-sized —
    * build it once, broadcast it, and the corpus-side pass is
    * explode → broadcast-hash semi join → per-doc count: one shuffle of
    * (doc, count) pairs, never an n-gram self-join. Shingling is the
    * one-pass codegen'd
    * [[org.apache.spark.sql.graft.DistinctShingles]] expression on both
    * sides. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = org.apache.spark.sql.graft.DistinctShingles
      .distinct_shingles(col(textCol), n)
    val benchGrams = benchmark.select(explode(grams).as("g")).distinct()
    corpus.select(col(idCol), explode(grams).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[decontaminate]] with the benchmark gram set held as a BLOOM
    * FILTER instead of an exact broadcast set — the shape for
    * benchmark suites too large to ship as verbatim grams (or kept
    * private: a Bloom leaks no gram text). m = 8·|grams|, k hash rows:
    * constant ~2.3% gram-level false-positive rate, NO false negatives
    * (n_bloom ≥ n_exact per doc by construction — spec-asserted), so
    * the filter is a SAFE prefilter: everything truly contaminated is
    * flagged, and the (cheap, bounded) false positives are what a
    * second exact pass would winnow. Output per corpus doc with ≥ 1
    * flagged gram: (idCol, n_grams, n_bloom, n_exact, has_fp). */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame, n: Int,
      k: Int = 4, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.sketch.Sketch
    val gramsExpr = org.apache.spark.sql.graft.DistinctShingles
      .distinct_shingles(col(textCol), n)
    val benchGrams = benchmark.select(explode(gramsExpr).as("g")).distinct()
    val nGrams = math.max(benchGrams.count(), 1L)
    val m = 8L * nGrams
    val bits = Sketch.bloomBits(benchGrams, "g", k, m)
    // String grams are far wider than the 8-byte bit positions
    // BloomBroadcastMaxBits was calibrated for — gate this broadcast on
    // the string-row bound instead (round-12 advice).
    val benchSide =
      if (nGrams <= Sketch.StringBroadcastMaxRows)
        broadcast(benchGrams.withColumn("_e", lit(true)))
      else benchGrams.withColumn("_e", lit(true))
    // Per-gram membership verdict. Fast path (round-19 optimization):
    // benchmarks are dimension-sized, so the whole filter densifies
    // into a broadcast bitmap and `hit` is ONE map-side codegen probe
    // per gram (BloomHitExpr — k in-expression digests against the
    // bitmap, no k-way posexplode, no bit-table join, no (doc, gram)
    // re-aggregation; those multiplied the corpus gram stream k× and
    // were this gate's dominant cost). Identical verdicts by
    // construction: the bitmap IS the set-bit table in dense form and
    // the positions are the same bloomPos values. Past the bitmap cap
    // the probe keeps the position-keyed join (broadcast-hinted under
    // BloomBroadcastMaxBits, sharded shuffle join past it — the
    // 10⁹-member deployment shape, round-11 advice).
    val gramHit =
      if (m <= Sketch.BloomBitmapMaxBits) {
        val bc = corpus.sparkSession.sparkContext
          .broadcast(Sketch.bloomBitmap(bits, m))
        corpus.select(col(idCol), explode(gramsExpr).as("g"))
          .select(col(idCol), col("g"),
            org.apache.spark.sql.graft.BloomHitExpr
              .bloom_hit(col("g"), bc, m, k).as("hit"))
      } else {
        val pos = corpus.select(col(idCol), explode(gramsExpr).as("g"))
          .select(col(idCol), col("g"),
            posexplode(array((0 until k).map(i =>
              Sketch.bloomPos(col("g"), i, m)): _*)).as(Seq("_i", "b")))
        pos
          .join(Sketch.bloomHint(bits.withColumn("_set", lit(1)),
              math.min(k.toLong * nGrams, m)), Seq("b"), "left")
          .groupBy(col(idCol), col("g"))
          .agg((count(col("_set")) === k).as("hit"))
      }
    gramHit
      .join(benchSide, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_bloom"),
        sum(when(coalesce(col("_e"), lit(false)), 1L).otherwise(0L)).as("n_exact"))
      .filter(col("n_bloom") > 0)
      .select(col(idCol), col("n_grams"), col("n_bloom"), col("n_exact"),
        (col("n_bloom") > col("n_exact")).as("has_fp"))
  }

  /** [[decontaminate]] from PRECOMPUTED corpus-side gram hashes — the
    * cache-narrowing path (LlmOps.pipelineE2e stage 3): `corpusGrams`
    * carries (idCol, gramsCol: array<long> =
    * [[org.apache.spark.sql.graft.DistinctShingleHashes]] of each doc's
    * text at the same `n`), so a pipeline that staged the hashes can
    * run the contamination join off packed longs without re-shingling
    * persisted text. The benchmark side (dimension-sized, external
    * input) hashes its own text with the SAME expression, so equality
    * matches string equality absent 64-bit collisions (cross-set
    * false-match odds |corpus grams|·|bench grams|/2⁶⁴ — a handful of
    * spuriously flagged docs corpus-WIDE even at 100 TB, negligible for
    * a filter whose purpose is over-approximate containment). */
  def decontaminateOn(corpusGrams: DataFrame, benchmark: DataFrame, n: Int,
      idCol: String = "doc_id", gramsCol: String = "grams",
      textCol: String = "text"): DataFrame = {
    val benchGrams = benchmark.select(explode(
      org.apache.spark.sql.graft.DistinctShingleHashes
        .distinct_shingle_hashes(col(textCol), n)).as("g")).distinct()
    corpusGrams.select(col(idCol), explode(col(gramsCol)).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** FUZZY benchmark decontamination: corpus documents whose whole-text
    * n-gram Jaccard against ANY benchmark document reaches `threshold`
    * — the near-duplicate complement to [[decontaminate]] (which flags
    * any single verbatim n-gram, but misses a lightly-paraphrased eval
    * document that shares no exact long gram while being 70% the same
    * text). The published decontamination stacks run both.
    *
    * Scale shape — BIPARTITE MinHash-LSH banding, not a self-join: the
    * benchmark is dimension-sized by definition, so its banded
    * signature table broadcasts; the corpus side computes signatures in
    * one codegen pass ([[org.apache.spark.sql.graft.MinHashSignature]])
    * and the candidate step is a broadcast-hash join on (band, bkey) —
    * no shuffle of the corpus at all. Exact-Jaccard verification then
    * touches candidates only: corpus shingle sets are semi-join-pruned
    * to candidate docs, benchmark sets broadcast. Recall follows the
    * banding curve (1 − (1 − s^r)^b; near-certain at the near-dup
    * similarities decontamination targets — same argument as the
    * d_minhash_lsh oracle).
    *
    * Returns (idCol, bench_id, jaccard) — one row per contaminated
    * (corpus doc, benchmark doc) pair that verifies. */
  def decontaminateFuzzy(corpus: DataFrame, benchmark: DataFrame, n: Int,
      threshold: Double, numHashes: Int = 64, bands: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    def banded(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol).as(out),
        org.apache.spark.sql.graft.MinHashSignature
          .minhash_signature(col(textCol), n, numHashes).as("sig"))
        .select(col(out), posexplode(
          org.apache.spark.sql.graft.BandKeys
            .band_keys(col("sig"), bands, rows)).as(Seq("band", "bkey")))
    val cands = banded(corpus, "corpus_id")
      .join(broadcast(banded(benchmark, "bench_id")), Seq("band", "bkey"))
      .select(col("corpus_id"), col("bench_id")).distinct()
    val shingles = org.apache.spark.sql.graft.DistinctShingles
      .distinct_shingles(col(textCol), n)
    val cSets = corpus.select(col(idCol).as("corpus_id"), shingles.as("sh_c"))
      .join(cands.select(col("corpus_id")).distinct(), Seq("corpus_id"), "left_semi")
    val bSets = benchmark.select(col(idCol).as("bench_id"), shingles.as("sh_b"))
    cands.join(cSets, "corpus_id")
      .join(broadcast(bSets), "bench_id")
      .select(col("corpus_id"), col("bench_id"),
        size(array_intersect(col("sh_c"), col("sh_b"))).as("n_common"),
        size(col("sh_c")).as("n_a"), size(col("sh_b")).as("n_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_id").as(idCol), col("bench_id"), col("jaccard"))
  }

  /** MERGE/apply — the write side of data versioning (the lakehouse
    * MERGE INTO shape): apply a change set (`op` ∈ insert | update |
    * delete, with the new payload for insert/update) to a base corpus
    * and produce the next version. Deletes drop the keyed row, updates
    * replace its payload, inserts append; an id that is absent from
    * the change set passes through untouched.
    *
    * The round-trip LAW this exists to satisfy (spec-asserted and the
    * gate's oracle): `mergeApply(base, changesTo(B)) == B` — applying
    * the diff between two versions reconstructs the target version
    * exactly.
    *
    * Scale shape: ONE left join of the base on the change-set key
    * (change sets are change-sized — broadcast when small, shuffle on
    * the key when not) plus a union of the inserts; payloads never
    * join against each other, only the key does. */
  def mergeApply(base: DataFrame, changes: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "text"): DataFrame = {
    val ch = changes.select(col(idCol), col("op"),
      col(payloadCol).as("_new_payload"))
    base.join(ch.filter(col("op") =!= "insert"), Seq(idCol), "left")
      .filter(col("op").isNull || col("op") === "update")
      .select(col(idCol),
        when(col("op") === "update", col("_new_payload"))
          .otherwise(col(payloadCol)).as(payloadCol))
      .unionByName(ch.filter(col("op") === "insert")
        .select(col(idCol), col("_new_payload").as(payloadCol)))
  }
}
