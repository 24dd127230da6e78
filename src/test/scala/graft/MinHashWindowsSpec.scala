package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text._

/** The split MinHashWindowSigs / WindowShingleSets expressions
  * (round-19 optimization) must reproduce the slice → concat_ws →
  * MinHashSignature / DistinctShingleHashes chain they replaced in
  * Dedup.fuzzySpans — window boundaries, signatures and shingle sets
  * all bit-equal (d_dup_spans_fuzzy's banded == exact equality rests
  * on the signature family staying fixed). */
class MinHashWindowsSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val (window, stride, n, k) = (16, 8, 3, 64)

  private val docs = Seq(
    // long doc: several full windows + a short tail window
    (1L, (1 to 45).map(i => s"tok$i").mkString(" ")),
    // exactly one window
    (2L, (1 to 16).map(i => s"w$i").mkString(" ")),
    // shorter than one window but >= n
    (3L, "alpha beta gamma delta"),
    // shorter than n (no shingles)
    (4L, "just two"),
    // repeated tokens (dedup inside a window)
    (5L, Seq.fill(30)("rep").mkString(" ")),
    // mixed case + punctuation tokens survive norm_text
    (6L, "The QUICK brown-fox jumps over the lazy dog again and again " +
      "then once more for good measure and luck"))

  test("split window expressions == slice/concat_ws reference chain") {
    val base = docs.toDF("doc_id", "text")
      .select(col("doc_id"), tokens(col("text")).as("t"))
    val ref = base
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0),
            (greatest(size(col("t")) - window, lit(0)) / stride).cast("int")),
          i => slice(col("t"), i * stride + 1, lit(window)))).as(Seq("wi", "wt")))
      .filter(size(col("wt")) >= n)
      .select(col("doc_id"), col("wi"),
        (col("wi").cast("long") * stride).as("start"),
        (col("wi").cast("long") * stride + size(col("wt"))).as("end"),
        org.apache.spark.sql.graft.MinHashSignature
          .minhash_signature(concat_ws(" ", col("wt")), n, k).as("sig"),
        org.apache.spark.sql.graft.DistinctShingleHashes
          .distinct_shingle_hashes(concat_ws(" ", col("wt")), n).as("sh"))
    val sigs = base
      .select(col("doc_id"), posexplode(
        org.apache.spark.sql.graft.MinHashWindowSigs
          .minhash_window_sigs(col("t"), window, stride, n, k)).as(Seq("wi", "wd")))
      .filter(col("wd.nt") >= n)
      .select(col("doc_id"), col("wi"), col("wd.nt").as("nt"),
        col("wd.sig").as("sig"))
    val shs = base
      .select(col("doc_id"), posexplode(
        org.apache.spark.sql.graft.WindowShingleSets
          .window_shingle_sets(col("t"), window, stride, n)).as(Seq("wi", "wd")))
      .filter(col("wd.nt") >= n)
      .select(col("doc_id"), col("wi"), col("wd.nt").as("nt"),
        col("wd.sh").as("sh"))
    val refRows = ref.collect().map(r => (r.getLong(0), r.getInt(1)) ->
      (r.getLong(2), r.getLong(3), r.getSeq[Long](4), r.getSeq[Long](5))).toMap
    val sigRows = sigs.collect().map(r => (r.getLong(0), r.getInt(1)) ->
      (r.getInt(2), r.getSeq[Long](3))).toMap
    val shRows = shs.collect().map(r => (r.getLong(0), r.getInt(1)) ->
      (r.getInt(2), r.getSeq[Long](3))).toMap
    assert(sigRows.keySet == refRows.keySet && shRows.keySet == refRows.keySet)
    refRows.foreach { case (key @ (_, wi), (start, end, sig, sh)) =>
      // geometry: nt == end − start under the arithmetic both gates use
      assert(start == wi.toLong * stride)
      assert(sigRows(key)._1.toLong == end - start, s"nt at $key")
      assert(sigRows(key)._2 == sig, s"sig at $key")
      assert(shRows(key)._2 == sh, s"sh at $key")
    }
    // sanity: the fixture actually exercises multi-window + tail cases
    assert(refRows.keys.count(_._1 == 1L) >= 4)
  }

  test("whitespace-edge docs follow the STAGED-token (oracle) semantics") {
    // round-19 advice: tab/newline edges make NormTokens emit EMPTY
    // tokens, and the OLD slice/concat_ws/re-tokenize chain dropped
    // them — the contract is the staged-token form (what the
    // d_dup_spans_fuzzy oracle replays: string_split(norm, ' ') sliced
    // positionally, empties included). Pin WindowShingleSets against
    // an empties-preserving builtin reference: positional slice of the
    // staged array, AllShingles (keeps empties), xxhash64, dedup.
    val edge = Seq(
      (1L, "\tleading tab edge " + (1 to 20).map(i => s"e$i").mkString(" ")),
      (2L, (1 to 12).map(i => s"m$i").mkString(" ") + " trailing newline\n"),
      (3L, "inner nbsp stays one-token " +
        (1 to 16).map(i => s"u$i").mkString(" ")))
    val base = edge.toDF("doc_id", "text")
      .select(col("doc_id"), tokens(col("text")).as("t"))
    val ref = base
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0),
            (greatest(size(col("t")) - window, lit(0)) / stride).cast("int")),
          i => slice(col("t"), i * stride + 1, lit(window)))).as(Seq("wi", "wt")))
      .filter(size(col("wt")) >= n)
      .select(col("doc_id"), col("wi"),
        array_distinct(transform(
          graft.text.shingles_from(col("wt"), n), s => xxhash64(s))).as("sh"))
    val fast = base
      .select(col("doc_id"), posexplode(
        org.apache.spark.sql.graft.WindowShingleSets
          .window_shingle_sets(col("t"), window, stride, n)).as(Seq("wi", "wd")))
      .filter(col("wd.nt") >= n)
      .select(col("doc_id"), col("wi"), col("wd.sh").as("sh"))
    val refRows = ref.collect().map(r =>
      (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2)).toMap
    val fastRows = fast.collect().map(r =>
      (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2)).toMap
    assert(refRows.nonEmpty && fastRows == refRows)
    // and the edge docs really do carry empty tokens into the windows
    val hasEmpty = base.select(array_contains(col("t"), "").as("e"))
      .collect().map(_.getBoolean(0))
    assert(hasEmpty.count(identity) >= 2)
  }

  test("fuzzySpans output unchanged on a planted near-dup fixture") {
    // two docs sharing a drifted 20-token passage + one unrelated doc
    val shared = (1 to 20).map(i => s"common$i").mkString(" ")
    val drifted = ((1 to 20).map(i => s"common$i").updated(7, "DRIFT")).mkString(" ")
    val df = Seq(
      (10L, s"prefix one two three $shared suffix alpha beta gamma delta"),
      (20L, s"other lead in tokens $drifted tail omega psi chi phi"),
      (30L, (1 to 40).map(i => s"uniq$i").mkString(" "))).toDF("doc_id", "text")
    val spans = graft.dedup.Dedup.fuzzySpans(df).collect()
    // both sharers report a merged span; the unrelated doc reports none
    val byDoc = spans.groupBy(_.getLong(0))
    assert(byDoc.contains(10L) && byDoc.contains(20L) && !byDoc.contains(30L))
    graft.util.IntermediateCaches.releaseAll()
  }

  test("window expressions generate compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = docs.toDF("doc_id", "text")
        .select(
          org.apache.spark.sql.graft.MinHashWindowSigs
            .minhash_window_sigs(tokens(col("text")), window, stride, n, k).as("ws"),
          org.apache.spark.sql.graft.WindowShingleSets
            .window_shingle_sets(tokens(col("text")), window, stride, n).as("sh"))
        .collect()
      assert(r.length == docs.length && r.forall(x => !x.isNullAt(0) && !x.isNullAt(1)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
