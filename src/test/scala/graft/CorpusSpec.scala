package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.text.{pii_count, pii_scrub}

/** Corpus-assembly operators: deterministic shuffle rank and sequence
  * packing (both via the bucketed two-pass global prefix — checked
  * against single-threaded references), benchmark decontamination, and
  * PII redaction. */
class CorpusSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  // ------------------------------------------------------ shuffle rank

  test("shuffleRank is the global (md5(id), id) total order, dense 1..N") {
    val docs = Tables.documents(spark, sf0001)
    val got = Corpus.shuffleRank(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(got.size == n)
    assert(got.values.toSeq.sorted == (1L to n).toSeq)
    // reference: single-threaded sort by the same key
    val ref = got.keys.toSeq
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got == ref)
  }

  test("shuffleRank plan: offsets broadcast, no single-partition corpus window") {
    val plan = Corpus.shuffleRank(Tables.documents(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"bucket offsets should broadcast:\n$plan")
    // the CORPUS-side rank window must be partitioned by the bucket —
    // only the dimension-sized offsets window may run single-partition
    assert(plan.contains("windowspecdefinition(bkt"),
      s"corpus window not bucket-partitioned:\n$plan")
  }

  // --------------------------------------------------- sequence packing

  test("packSequences matches the sequential reference and never splits a doc") {
    val budget = 25
    // uneven token counts incl. one doc bigger than the whole budget
    val docs = Seq(
      (0L, "a b c d e"), (1L, Seq.fill(30)("w").mkString(" ")), (2L, "x y"),
      (3L, Seq.fill(10)("q").mkString(" ")), (4L, "one two three"),
      (5L, Seq.fill(24)("z").mkString(" ")), (6L, "t"), (7L, "u v w x")
    ).toDF("doc_id", "text")
    val got = Corpus.packSequences(docs, text.n_tokens(col("text")),
        budget, bucketSize = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // sequential reference: running start offset, seq = sof / budget
    val toks = Seq(0L -> 5, 1L -> 30, 2L -> 2, 3L -> 10, 4L -> 3, 5L -> 24, 6L -> 1, 7L -> 4)
    var sof = 0L
    val ref = toks.map { case (id, nt) =>
      val seq = sof / budget; sof += nt; (id, nt.toLong, seq)
    }
    val refAgg = ref.groupBy(_._3).map { case (seq, ds) =>
      seq -> (ds.size.toLong, ds.map(_._2).sum, ds.map(_._1).min, ds.map(_._1).max)
    }
    assert(got == refAgg)
    // every doc packed exactly once
    assert(got.values.map(_._1).sum == toks.size)
    assert(got.values.map(_._2).sum == toks.map(_._2).sum)
    // contiguity: doc ranges of consecutive sequences do not interleave
    val ordered = got.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach {
      case Seq((_, _, _, lastA), (_, _, firstB, _)) => assert(lastA < firstB)
      case _ =>
    }
  }

  test("packManifest placement: offsets sequential per sequence, aggregates to packSequences") {
    val budget = 25
    val docs = Seq(
      (0L, "a b c d e"), (1L, Seq.fill(30)("w").mkString(" ")), (2L, "x y"),
      (3L, Seq.fill(10)("q").mkString(" ")), (4L, "one two three"),
      (5L, Seq.fill(24)("z").mkString(" ")), (6L, "t"), (7L, "u v w x")
    ).toDF("doc_id", "text")
    val manifest = Corpus.packManifest(docs, text.n_tokens(col("text")),
        budget, bucketSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // sequential reference placement
    var sof = 0L
    val ref = Seq(0L -> 5, 1L -> 30, 2L -> 2, 3L -> 10, 4L -> 3, 5L -> 24, 6L -> 1, 7L -> 4)
      .map { case (id, nt) =>
        val row = (id, nt.toLong, sof / budget, sof % budget); sof += nt; row }
    assert(manifest.toSeq == ref)
    // every offset_in_seq is a valid in-sequence position: the doc
    // STARTS inside its sequence's budget window
    assert(manifest.forall { case (_, _, _, off) => off >= 0 && off < budget })
    // the manifest aggregates to exactly the packSequences summary
    val fromManifest = manifest.groupBy(_._3).map { case (seq, ds) =>
      seq -> (ds.size.toLong, ds.map(_._2).sum, ds.map(_._1).min, ds.map(_._1).max) }
    val summary = Corpus.packSequences(docs, text.n_tokens(col("text")),
        budget, bucketSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(fromManifest == summary)
  }

  test("packStrict: next-fit reference, budget never exceeded except oversized singletons") {
    val budget = 25
    val bucketSize = 4
    val docs = Seq(
      (0L, "a b c d e"), (1L, Seq.fill(30)("w").mkString(" ")), (2L, "x y"),
      (3L, Seq.fill(10)("q").mkString(" ")), (4L, "one two three"),
      (5L, Seq.fill(24)("z").mkString(" ")), (6L, "t"), (7L, "u v w x"),
      (8L, Seq.fill(13)("m").mkString(" ")), (9L, "a"), (10L, "b c")
    ).toDF("doc_id", "text")
    val manifest = Corpus.packStrictManifest(docs, text.n_tokens(col("text")),
        budget, bucketSize = bucketSize)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // sequential reference: bucket-aligned next-fit with stitched seq ids
    val ntoks = Seq(0L -> 5L, 1L -> 30L, 2L -> 2L, 3L -> 10L, 4L -> 3L,
      5L -> 24L, 6L -> 1L, 7L -> 4L, 8L -> 13L, 9L -> 1L, 10L -> 2L)
    var gseq = 0L
    val ref = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    ntoks.groupBy(_._1 / bucketSize).toSeq.sortBy(_._1).foreach { case (_, ds) =>
      var fill = 0L; var seq = -1L
      ds.sortBy(_._1).foreach { case (id, t) =>
        if (seq < 0 || fill + t > budget) { seq += 1; ref(id) = (t, gseq + seq, 0L); fill = t }
        else { ref(id) = (t, gseq + seq, fill); fill += t }
      }
      gseq += seq + 1
    }
    assert(manifest == ref.toMap, s"got $manifest")
    // strict discipline: every multi-doc sequence fits the budget;
    // an over-budget sequence can only be a single oversized doc
    val summary = Corpus.packStrict(docs, text.n_tokens(col("text")),
        budget, bucketSize = bucketSize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    summary.foreach { case (seqId, nDocs, nTok) =>
      assert(nTok <= budget || nDocs == 1,
        s"seq $seqId: $nDocs docs, $nTok tokens > $budget")
    }
    // the summary is exactly the manifest's per-sequence aggregation
    val fromManifest = ref.toSeq.groupBy(_._2._2)
      .map { case (s, ds) => (s, ds.size.toLong, ds.map(_._2._1).sum) }.toSet
    assert(summary.toSet == fromManifest)
    // offsets within each sequence are the running token prefix
    ref.toSeq.groupBy(_._2._2).values.foreach { ds =>
      val sorted = ds.sortBy(_._1)
      sorted.foldLeft(0L) { case (expOff, (id, (t, _, off))) =>
        assert(off == expOff, s"doc $id offset $off != $expOff"); expOff + t
      }
    }
  }

  test("packSequences is bucketSize-invariant (the prefix decomposition is exact)") {
    val docs = Tables.documents(spark, sf0001)
    val base = Corpus.packSequences(docs, text.n_tokens(col("text")), 256,
        bucketSize = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (bs <- Seq(2, 7, 100000)) {
      val alt = Corpus.packSequences(docs, text.n_tokens(col("text")), 256,
          bucketSize = bs)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(alt == base, s"bucketSize=$bs diverged")
    }
  }

  test("skew stress: md5 buckets defuse a pathological id space; id-range buckets stay bounded") {
    // 4096 ids engineered hot: one dense 100x cluster (0..3999 — all in
    // the SAME id-range granule at bucketSize 4096) plus a sparse tail
    // of 96 ids strewn across a 2^50 space. Range-bucketing would see a
    // 4000-row hot bucket; the md5 prefix must not care.
    val ids = ((0L until 4000L) ++
      (1L to 96L).map(i => (1L << 50) + i * (1L << 40))).toSeq
    val docs = ids.toDF("doc_id")
    // (1) shuffleRank's hash-prefix buckets stay balanced under the skew
    val bucketSizes = docs
      .select(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2).as("bkt"))
      .groupBy(col("bkt")).count().collect().map(_.getLong(1))
    assert(bucketSizes.max <= 4 * (ids.size / 256),
      s"md5 bucket skew: max ${bucketSizes.max} of ${ids.size} over 256 buckets")
    // and the rank is STILL the exact global order — skew never changes values
    val got = Corpus.shuffleRank(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = ids.sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got == ref)
    // (2) packSequences' id-range buckets: per-bucket rows are bounded
    // by bucketSize BY CONSTRUCTION (ids are unique), so the planted
    // hot cluster cannot exceed the granule — the skew ceiling is the
    // parameter itself, not the data
    val perBucket = docs
      .select((col("doc_id") / lit(512)).cast("long").as("bkt"))
      .groupBy(col("bkt")).count().collect().map(_.getLong(1))
    assert(perBucket.max <= 512)
    // and the pack output is invariant to how the skewed space is
    // bucketed (the prefix decomposition is exact, whatever the spread)
    def pack(bs: Int) = Corpus.packSequences(docs, lit(3), 64, bucketSize = bs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(pack(512) == pack(4096) && pack(512) == pack(1 << 20))
    // (3) the SPARSE-id degenerate case and its documented fix: on a
    // hashed id space the range-bucket summary approaches one row per
    // doc (here: every sparse id its own bucket) — pre-ranking with
    // shuffleRank densifies ids to 1..N, restoring a dimension-sized
    // summary of ~N / bucketSize buckets (ranks are 1-based, so
    // floor(rank/512) spans 0..N/512 inclusive)
    val ranked = Corpus.shuffleRank(docs).select(col("rank").as("doc_id"))
    val denseBuckets = ranked
      .select((col("doc_id") / lit(512)).cast("long").as("bkt"))
      .select(countDistinct(col("bkt"))).head().getLong(0)
    assert(denseBuckets == ids.size / 512 + 1)
  }

  // --------------------------------------------------- decontamination

  test("decontamClean survivors + flagged == corpus (flag and removal reconcile)") {
    val summary = graft.queries.LlmOps.decontamClean(spark, sf0001).collect()(0)
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val flagged = graft.queries.LlmOps.decontam(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(summary.getLong(0) == corpus.count() - flagged.size)
    val keptIds = corpus.select("doc_id").collect().map(_.getLong(0))
      .filterNot(flagged).sorted
    assert(summary.getLong(1) == keptIds.sum)
    assert(flagged.nonEmpty, "gate eval slice should contaminate something")
  }

  test("decontaminate counts distinct shared n-grams per corpus doc") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // shares "quick brown" and "brown fox" (and "the quick")
      (1L, "see the quick brown fox run"),
      // repeated shared gram counts ONCE (distinct shingles)
      (2L, "lazy dog lazy dog lazy dog"),
      // no 2-gram overlap
      (3L, "completely different words entirely"),
      // fewer tokens than n
      (4L, "dog")
    ).toDF("doc_id", "text")
    val got = Corpus.decontaminate(corpus, bench, n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }

  test("decontaminateFuzzy: bipartite LSH == brute force; catches paraphrase the exact-gram check misses") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val got = Corpus.decontaminateFuzzy(corpus, bench, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force bipartite reference: every (corpus, bench) pair by
    // exact distinct-shingle Jaccard
    val sh = org.apache.spark.sql.graft.DistinctShingles
      .distinct_shingles(col("text"), 3)
    val c = corpus.select(col("doc_id").as("cid"), sh.as("sc"))
    val b = bench.select(col("doc_id").as("bid"), sh.as("sb"))
    val brute = c.crossJoin(b)
      .select(col("cid"), col("bid"),
        (size(array_intersect(col("sc"), col("sb"))).cast("double") /
          (size(col("sc")) + size(col("sb")) -
            size(array_intersect(col("sc"), col("sb"))))).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(got.nonEmpty, "sf0.001 should contain cross-slice near-dups")
    // FIXTURE CONTRACT (keeps the t_decontam_fuzzy gate deterministic,
    // not flaky): LSH == brute-force equality above holds because every
    // true pair sits FAR above the 0.5 threshold, where 16-band/4-row
    // recall is ~certain — a pair at 0.5 exactly has only ~64% band
    // recall, so a fixture that planted borderline pairs would make the
    // gate's oracle comparison a coin flip. Assert the margin so a
    // testdata regeneration that violates it fails HERE with a clear
    // message, not downstream as an unexplained gate flake.
    val margins = c.crossJoin(b)
      .select(col("cid"), col("bid"),
        (size(array_intersect(col("sc"), col("sb"))).cast("double") /
          (size(col("sc")) + size(col("sb")) -
            size(array_intersect(col("sc"), col("sb"))))).as("j"))
      .filter(col("j") >= 0.5).select(col("j"))
      .collect().map(_.getDouble(0))
    assert(margins.forall(_ >= 0.9),
      s"fuzzy-decontam fixture contract violated: a true pair's jaccard " +
        s"(min ${margins.min}) is within banding-recall range of the 0.5 " +
        "threshold — regenerate fixtures or raise band count")
    // the case the exact-gram check is blind to: every 8th word of a
    // 40-token eval doc paraphrased — no 8 consecutive original tokens
    // survive (zero shared 8-grams), but whole-text 3-gram Jaccard
    // stays high
    val toks = (1 to 40).map(i => s"w$i")
    val para = toks.zipWithIndex.map { case (w, i) =>
      if ((i + 1) % 8 == 0) s"x${i + 1}" else w }
    val benchDoc = Seq((100L, toks.mkString(" "))).toDF("doc_id", "text")
    val paraDoc = Seq((200L, para.mkString(" "))).toDF("doc_id", "text")
    assert(Corpus.decontaminate(paraDoc, benchDoc, n = 8).count() == 0,
      "exact 8-gram check should miss the paraphrase")
    val fuzzy = Corpus.decontaminateFuzzy(paraDoc, benchDoc, n = 3,
      threshold = 0.4).collect()
    assert(fuzzy.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((200L, 100L)),
      "fuzzy check should flag the paraphrase")
  }

  test("decontaminate plan broadcasts the benchmark gram set") {
    val docs = Tables.documents(spark, sf0001)
    val plan = Corpus.decontaminate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark grams must broadcast (corpus-side never shuffles its grams):\n$plan")
  }

  // ------------------------------------------------------ PII scrubbing

  test("pii_scrub redacts all four classes; pii_count counts them") {
    val rows = Seq(
      ("reach me at john.doe+spam@foo-bar.co.uk or jane@x.io thanks",
        "reach me at [EMAIL] or [EMAIL] thanks", 2, 0, 0, 0),
      ("ssn 123-45-6789 phone 555-123-4567 and 555.123.4567",
        "ssn [SSN] phone [PHONE] and [PHONE]", 0, 1, 2, 0),
      ("server 10.0.3.1 and 192.168.255.254 up", "server [IP] and [IP] up", 0, 0, 0, 2),
      ("no pii here, just text 12345", "no pii here, just text 12345", 0, 0, 0, 0)
    ).toDF("text", "want", "ne", "ns", "np", "ni")
    val got = rows.select(
      pii_scrub(col("text")).as("clean"), col("want"),
      pii_count(col("text"), "email").as("ge"), col("ne"),
      pii_count(col("text"), "ssn").as("gs"), col("ns"),
      pii_count(col("text"), "phone").as("gp"), col("np"),
      pii_count(col("text"), "ip").as("gi"), col("ni")).collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"scrub mismatch: ${r.getString(0)}")
      assert(r.getInt(2) == r.getInt(3) && r.getInt(4) == r.getInt(5) &&
        r.getInt(6) == r.getInt(7) && r.getInt(8) == r.getInt(9),
        s"count mismatch on: $r")
    }
  }

  test("pii_count rejects an unknown class") {
    intercept[IllegalArgumentException] { pii_count(col("x"), "iban") }
  }
}
