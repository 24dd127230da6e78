package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text._

/** Deduplication operators for document corpora. All are expressed as
  * declarative plans (groupBy / explode / join) so Catalyst parallelizes
  * them; none collects to the driver.
  *
  * Scale notes (100 TB): exact dedup is one shuffle on the fingerprint;
  * n-gram Jaccard is bounded by the inverted shingle index (explode →
  * shuffle on shingle → pair counts) — at large corpora run it AFTER
  * MinHash-LSH banding has cut candidates, which is exactly
  * `minhashLshCandidates` → `verify with exact Jaccard`. SimHash is a
  * single map pass + one shuffle on the band key.
  */
object Dedup {

  /** Exact duplicate groups by md5 fingerprint of normalized text:
    * (fingerprint, keeper = min doc_id, n_docs). */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), fingerprint_md5(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Small corpora arrive as one parquet file = one partition, which
    * serializes the CPU-heavy shingle/minhash transforms; explicit
    * repartition (which AQE does not coalesce) spreads them. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Distinct (doc, shingle-hash) inverted index, built from the
    * codegen'd one-pass [[DistinctShingles]] expression (the HOF chain
    * would be re-evaluated once per downstream reference). The join key
    * is the 64-bit xxhash of the shingle, not the string — half the
    * shuffle width and cheaper equality; with ~2^14 distinct shingles
    * the collision probability (~2^-36) is far below any other error
    * source, and the jaccard VALUES are unchanged so the string-based
    * SQL oracle still matches. */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    spread(docs).select(col(idCol).as("doc"),
      explode(org.apache.spark.sql.graft.DistinctShingles
        .distinct_shingles(col(textCol), n)).as("s"))
      .select(col("doc"), xxhash64(col("s")).as("s"))

  /** Near-duplicate pairs by exact word-n-gram Jaccard ≥ threshold.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val idx = shingleIndex(docs, idCol, textCol, n)
    val counts = idx.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val a = idx.select(col("doc").as("doc_a"), col("s"))
    val b = idx.select(col("doc").as("doc_b"), col("s"))
    val inter = a.join(b, "s")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(counts.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signature column: `numHashes` minima of seeded xxhash64
    * shingle hashes, computed in ONE aggregate fold over the shingle
    * array (evaluating the shingle expression once per element — k
    * separate array_min(transform(...)) columns would re-evaluate the
    * input k times). Builtin higher-order functions only, no UDF. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    aggregate(
      shinglesCol,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(acc,
        transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(i, s)),
        (a, b) => least(a, b)))

  /** LSH candidate pairs: signatures split into `bands`; docs sharing
    * any full band land in a bucket; bucket join yields candidates.
    * Probabilistic recall — verify candidates with exact Jaccard. */
  def minhashLshCandidates(docs: DataFrame, n: Int, numHashes: Int,
      bands: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    // codegen'd one-pass signature expression (lowercase + tokenize +
    // shingle + k minima in one tight loop, no separate normalization
    // pass); the HOF-based minhashSignature stays available for ad-hoc
    // array inputs
    val sig = spread(docs)
      .select(col(idCol).as("doc"), org.apache.spark.sql.graft.MinHashSignature
        .minhash_signature(col(textCol), n, numHashes).as("sig"))
    // band key = (band index, hash of the band's slice)
    val banded = sig.select(col("doc"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b))).as(Seq("band", "bkey")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification of the
    * candidates — the 100 TB-shaped pipeline. */
  def minhashLshPairs(docs: DataFrame, n: Int, threshold: Double,
      numHashes: Int = 64, bands: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cands = minhashLshCandidates(docs, n, numHashes, bands, idCol, textCol)
    // verify ONLY the candidate pairs: bring both docs' distinct-shingle
    // sets to the pair and intersect as arrays — O(|cands|·|sh|), never
    // the full inverted-index pair blowup; sets come from the codegen'd
    // one-pass expression (same values as array_distinct∘shingles)
    val shSets = spread(docs).select(col(idCol).as("doc"),
      org.apache.spark.sql.graft.DistinctShingles
        .distinct_shingles(col(textCol), n).as("sh"))
    cands
      .join(shSets.select(col("doc").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shSets.select(col("doc").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_common"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: one 64-bit fingerprint per doc, banded into
    * 8×8-bit chunks — by pigeonhole any pair within Hamming distance 7
    * shares at least one identical chunk, so the bucket join has
    * GUARANTEED recall for maxHamming ≤ 7; verification filters with
    * bit_count(xor) ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = spread(docs).select(col(idCol).as("doc"),
      simhash64(norm_text(col(textCol))).as("sh"))
    val banded = sh.select(col("doc"), col("sh"), posexplode(array(
      (0 until 8).map(i => shiftright(col("sh"), i * 8).bitwiseAND(lit(0xffL))): _*
    )).as(Seq("band", "chunk")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
