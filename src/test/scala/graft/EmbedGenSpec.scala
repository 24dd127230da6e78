package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.HashedEmbed

/** In-pipe embedding generation ([[org.apache.spark.sql.graft
  * .HashedEmbed]]): driver-side md5 reference parity, linearity in the
  * token bag, null/empty conventions, and the end-to-end gate's
  * retrieval quality against brute force over the same generated
  * vectors. */
class EmbedGenSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val D = 8

  /** Independent reference: the same md5("d:tok") high-bit signs,
    * computed with java.security directly. */
  private def refEmbed(toks: Seq[String]): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Long](D)
    toks.foreach { t =>
      (0 until D).foreach { d =>
        md.reset()
        val b = md.digest(s"$d:$t".getBytes("UTF-8"))
        acc(d) += (if ((b(0) & 0x80) == 0) 1 else -1)
      }
    }
    acc.toSeq
  }

  test("hashed_embed == independent md5 reference; empty and null conventions") {
    val df = Seq(
      (1L, Seq("the", "cat", "sat", "the")),
      (2L, Seq.empty[String]),
      (3L, Seq("cat", null, "cat"))
    ).toDF("id", "toks")
    val got = df.select(col("id"),
      HashedEmbed.hashed_embed(col("toks"), D).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == refEmbed(Seq("the", "cat", "sat", "the")))
    // empty token array -> the zero vector, not null
    assert(got(2L) == Seq.fill(D)(0L))
    // a null ELEMENT contributes zero (the bpe_count convention)
    assert(got(3L) == refEmbed(Seq("cat", "cat")))
    // null ARRAY -> null
    val n = Seq((4L, null.asInstanceOf[Seq[String]])).toDF("id", "toks")
      .select(HashedEmbed.hashed_embed(col("toks"), D)).head()
    assert(n.isNullAt(0))
  }

  test("the featurizer is linear in the token bag") {
    // embed(a ++ b) == embed(a) + embed(b) — the property that makes
    // per-dim sums an aggregatable signed projection of token counts
    val a = Seq("fast", "scan", "scan")
    val b = Seq("slow", "fast")
    val Seq(ea, eb, eab) = Seq(a, b, a ++ b).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
      .select(col("id"), HashedEmbed.hashed_embed(col("toks"), D).as("e"))
      .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
    assert(eab == ea.zip(eb).map { case (x, y) => x + y })
  }

  test("t_embed_gen retrieval: probed-IVF hits are a subset-quality match of brute force") {
    val emb = Tables.documents(spark, sf0001)
      .select(col("doc_id").as("vec_id"),
        HashedEmbed.hashed_embed(graft.text.tokens(col("text")), 16)
          .cast("array<double>").as("embedding"))
    val qids = Seq(0L, 100L, 200L, 300L, 400L)
    val corpus = emb.filter(!col("vec_id").isin(qids: _*))
    val queries = emb.filter(col("vec_id").isin(qids: _*))
    val ivf = graft.similarity.Ann.batchTopKIvf(corpus, queries, k = 3,
        nCells = 8, probes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = graft.similarity.Ann.batchTopK(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size == 15 && ivf.size == 15)
    // 3-of-8-cell probing must keep a solid share of the exact top-3;
    // the gate's oracle pins the EXACT probed answer — this pins the
    // QUALITY floor so a broken featurizer (constant vectors, all-one
    // cells) cannot hide behind a matching replay
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall over generated embeddings: $recall")
    graft.util.IntermediateCaches.releaseAll(blocking = true)
  }

  test("zero-norm generated embeddings are dropped at the featurizer boundary") {
    // the motive, MEASURED: under Spark 4's default ANSI mode cosine
    // against the zero vector THROWS divide-by-zero mid-job (and with
    // ANSI off it would be NaN, which sorts FIRST under DESC while
    // DuckDB's NULL sorts last) — either way the guard must fire
    // before any ranking
    // (SparkArithmeticException itself is private[spark]; its public
    // supertype is java.lang.ArithmeticException)
    val e = intercept[Throwable] {
      spark.range(1)
        .select(graft.similarity.Ann.cosine(
          array(lit(0.0), lit(0.0)), array(lit(1.0), lit(0.0))))
        .head()
    }
    assert(String.valueOf(e.getMessage).contains("DIVIDE_BY_ZERO") ||
      String.valueOf(e.getCause).contains("DIVIDE_BY_ZERO"),
      s"expected a divide-by-zero failure, got $e")
    // an empty token bag IS the zero vector (pinned above), the
    // realistic way a generated embedding cancels; the guard drops it
    val docs = Seq((1L, Seq.empty[String]), (2L, Seq("cat")))
      .toDF("id", "toks")
      .select(col("id"),
        HashedEmbed.hashed_embed(col("toks"), D).cast("array<double>").as("e"))
    val kept = docs.filter(graft.similarity.Ann.nonzeroNorm(col("e")))
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L))
  }
}
