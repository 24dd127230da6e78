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

  /** Distinct (doc, shingle) inverted index. */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("doc"),
      explode(shingles(col(textCol), n)).as("s")).distinct()

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

  /** MinHash signature column: array of `numHashes` minima of seeded
    * FNV-style shingle hashes — built from builtin higher-order
    * functions (transform + array_min), fully codegen'd, no UDF. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column = {
    val sigs = (0 until numHashes).map { seed =>
      array_min(transform(shinglesCol,
        s => xxhash64(lit(seed), s)))
    }
    array(sigs: _*)
  }

  /** LSH candidate pairs: signatures split into `bands`; docs sharing
    * any full band land in a bucket; bucket join yields candidates.
    * Probabilistic recall — verify candidates with exact Jaccard. */
  def minhashLshCandidates(docs: DataFrame, n: Int, numHashes: Int,
      bands: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val sig = docs.select(col(idCol).as("doc"),
      minhashSignature(shingles(col(textCol), n), numHashes).as("sig"))
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
    val idx = shingleIndex(docs, idCol, textCol, n)
    val counts = idx.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val inter = cands
      .join(idx.select(col("doc").as("doc_a"), col("s")), "doc_a")
      .join(idx.select(col("doc").as("doc_b"), col("s").as("s2")), "doc_b")
      .filter(col("s") === col("s2"))
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

  /** SimHash near-dup pairs: one 64-bit fingerprint per doc, banded into
    * 8×8-bit chunks — by pigeonhole any pair within Hamming distance 7
    * shares at least one identical chunk, so the bucket join has
    * GUARANTEED recall for maxHamming ≤ 7; verification filters with
    * bit_count(xor) ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"),
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
