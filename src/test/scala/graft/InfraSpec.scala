package graft

import java.net.{BindException, ServerSocket}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.util.PortUtils

class InfraSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  // ------------------------------------------------------- streaming

  test("streaming hourly window equals batch aggregation") {
    val streamed = graft.streaming.Streaming.hourlyWindowed(spark, sf0001, "infra_stream")
      .collect()
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .orderBy(col("hour"), col("event_type"))
      .collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming decontamination equals the batch operator") {
    val streamed = graft.streaming.Streaming
      .decontamStream(spark, sf0001, "infra_decontam")
      .orderBy(col("doc_id")).collect()
    val batch = graft.queries.LlmOps.decontam(spark, sf0001)
      .orderBy(col("doc_id")).collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
    // the eval slice itself never reaches the stream side
    assert(streamed.forall(_.getLong(0) % 20 != 0))
  }

  test("streaming SEMANTIC decontamination equals the batch operator (+ RocksDB, multi-trigger, state bound)") {
    val batch = graft.queries.LlmOps.decontamEmbed(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(batch.nonEmpty)
    def run(name: String, opts: Map[String, String]):
        (Seq[(Long, Long, Double)], Int, Seq[Long]) = {
      val agg = graft.streaming.Streaming
        .decontamEmbedStream(spark, sf0001, name, opts)
      // the gate helper already replayed to completion; read the table
      val rows = agg.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      (rows, 0, Seq.empty)
    }
    val (got, _, _) = run("infra_dec_embed", Map.empty)
    assert(got == batch,
      s"stream=${got.size} batch=${batch.size} " +
        s"onlyS=${(got.toSet -- batch.toSet).take(3)} onlyB=${(batch.toSet -- got.toSet).take(3)}")
    // planted verbatim leaks (ids past plantBase) must be flagged
    val pb = graft.queries.LlmOps.plantBase(
      Tables.embeddings(spark, sf0001), "vec_id")
    assert(got.exists(_._1 >= pb), "planted re-ingests not flagged")
    assert(got.filter(_._1 >= pb).forall(_._3 == 1.0),
      "a verbatim re-ingest must hit its own benchmark vector at cos 1")
    // multi-trigger replay: one file at a time — per-vector counts are
    // order-invariant sums, so the complete-mode answer is identical
    val (multi, _, _) = run(s"infra_dec_embed_mt_${System.nanoTime}",
      Map("maxFilesPerTrigger" -> "1"))
    assert(multi == got, "multi-trigger replay drifted from single-trigger")
    // RocksDB state-store provider equivalence
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (rocks, _, _) = run(s"infra_dec_embed_rocks_${System.nanoTime}", Map.empty)
      assert(rocks == got, s"RocksDB drifted: ${rocks.size} vs ${got.size}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // state bound: the aggregation keeps one row per CONTAMINATED
    // vector only — the memory-sink table equals the hit set, and the
    // hit set is far smaller than the corpus
    val corpusN = Tables.embeddings(spark, sf0001).count()
    assert(got.size < corpusN, s"state ${got.size} not < corpus $corpusN")
  }

  test("streaming quality filter: stateless map equals the batch perceptron scorer") {
    val batch = graft.queries.LlmOps.qualityClfPred(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(batch.nonEmpty)
    def run(name: String, opts: Map[String, String]) =
      graft.streaming.Streaming.qualityClfStream(spark, sf0001, name, opts)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    val got = run("infra_qclf", Map.empty)
    // the literal-map fold must equal the design-matrix dot product
    // exactly (score = bias + sum of per-token weights, integers)
    assert(got == batch, s"stream=${got.take(3)} batch=${batch.take(3)}")
    // multi-trigger replay: stateless map — trivially order-invariant
    val multi = run(s"infra_qclf_mt_${System.nanoTime}",
      Map("maxFilesPerTrigger" -> "1"))
    assert(multi == got)
  }

  test("streaming HASHED quality filter: stateless gram fold equals the batch averaged scorer") {
    val batch = graft.queries.LlmOps.qualityClfNgPred(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(batch.nonEmpty)
    def run(name: String, opts: Map[String, String]) =
      graft.streaming.Streaming.qualityClfNgStream(spark, sf0001, name, opts)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    // the per-doc aggregate fold over (unigram + bigram) instances must
    // equal the design-matrix cnt-weighted dot product exactly —
    // integer weights, integer counts
    val got = run("infra_qclf_ng", Map.empty)
    assert(got == batch, s"stream=${got.take(3)} batch=${batch.take(3)}")
    val multi = run(s"infra_qclf_ng_mt_${System.nanoTime}",
      Map("maxFilesPerTrigger" -> "1"))
    assert(multi == got)
  }

  test("streaming IVF assignment: ingest-time cell routing equals the batch index") {
    import graft.similarity.Ann
    val emb = Tables.embeddings(spark, sf0001)
    val qIds = graft.queries.LlmOps.BatchQueryIds
    val corpus = emb.filter(!col("vec_id").isin(qIds: _*))
    val (cells, cents) = Ann.collectSeeds(
      Ann.ivfSeeds(corpus, 8, 0, "vec_id", "embedding"))
    val batch = corpus.select(col("vec_id"),
        org.apache.spark.sql.graft.NearestCentroid
          .nearest_centroid(col("embedding"), cells, cents).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    def run(name: String, opts: Map[String, String]) =
      graft.streaming.Streaming.annAssignStream(spark, sf0001, name, opts)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val got = run("infra_ann_assign", Map.empty)
    assert(got == batch, "ingest assignment diverges from the batch index")
    // stateless map: multi-trigger replay is trivially order-invariant
    val multi = run(s"infra_ann_assign_mt_${System.nanoTime}",
      Map("maxFilesPerTrigger" -> "1"))
    assert(multi == got)
  }

  test("streaming session windows equal batch session windows for closed sessions") {
    val streamedQ = graft.streaming.Streaming.eventsStream(spark, sf0001)
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"))
      .writeStream.outputMode("append").format("memory").queryName("infra_sess").start()
    try streamedQ.processAllAvailable() finally streamedQ.stop()
    val streamed = spark.table("infra_sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    // append mode emits exactly the sessions closed by the final
    // watermark = max event time (ms floor) - 10 min
    val batchAll = graft.queries.Events.sessionWindows(spark, sf0001)
    val maxTsMs = Tables.events(spark, sf0001)
      .agg(max(unix_millis(col("ts")))).collect().head.getLong(0)
    val wm = new java.sql.Timestamp(maxTsMs - 10L * 60 * 1000)
    val expected = batchAll.filter(col("sess_end") <= lit(wm)).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(streamed == expected,
      s"streamed=${streamed.size} expected=${expected.size} " +
        s"onlyStreamed=${(streamed -- expected).take(3)} onlyBatch=${(expected -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join equals the batch join") {
    def side(tpe: String, u: String, t: String) =
      graft.streaming.Streaming.eventsStream(spark, sf0001)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(u), col("ts").as(t))
        .withWatermark(t, "1 hour")
    // purchases within 1h after a click by the same user; inner
    // stream-stream joins emit matches as found (the watermark only
    // bounds state), so on static input streamed == batch exactly
    val joined = side("click", "cu", "cts").join(side("purchase", "pu", "pts"),
      col("cu") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("infra_ssj").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("infra_ssj").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getTimestamp(3))).toSet
    val ev = Tables.events(spark, sf0001)
    def bside(tpe: String, u: String, t: String) =
      ev.filter(col("event_type") === tpe).select(col("user_id").as(u), col("ts").as(t))
    val batch = bside("click", "cu", "cts").join(bside("purchase", "pu", "pts"),
      col("cu") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getTimestamp(3))).toSet
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
    assert(streamed.nonEmpty)
  }

  /** Write `df` as ONE parquet file at `dest` (the single-file layout
    * the streaming gates' file source globs expect), with an explicit
    * mtime so multi-file splits replay in a deterministic order. */
  private def writeOneParquet(df: org.apache.spark.sql.DataFrame,
      dest: java.io.File, mtime: Long): Unit = {
    val staging = new java.io.File(dest.getParentFile, dest.getName + ".staging")
    df.coalesce(1).write.parquet(staging.getPath)
    val part = staging.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, dest.toPath)
    staging.listFiles().foreach(_.delete()); staging.delete()
    assert(dest.setLastModified(mtime))
  }

  test("multi-batch incremental replay (maxFilesPerTrigger=1) == batch oracle") {
    // Every gate replays the file source in ONE micro-batch; this spec
    // certifies the INCREMENTAL path beyond that: a time-ordered
    // 3-file split of events, one file per trigger, must reproduce the
    // same batch answer. Watermark-safe input by construction — each
    // later file's earliest event is newer than the earlier files' max,
    // so no row ever arrives at/below an advanced watermark (the
    // ingestion discipline the gate docstrings assume, now a tested
    // property instead of an assumption).
    val dir = java.nio.file.Files.createTempDirectory("graft_multibatch").toFile
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // raw keeps whatever physical ts layout the generator shipped; the
    // split files reuse it and eventsStreamFrom adapts (normalizeEventTs)
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
    val n = raw.count()
    val parts = 3
    val ranked = raw.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    for (i <- 0 until parts) {
      val lo = i * n / parts; val hi = (i + 1) * n / parts
      writeOneParquet(ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn"),
        new java.io.File(dir, f"events_$i%02d.parquet"), 1000000L + i * 60000L)
    }
    val agg = graft.streaming.Streaming.hourlyAgg(
      graft.streaming.Streaming.eventsStreamFrom(spark, dir.getPath,
        glob = "events_*.parquet", extraOptions = Map("maxFilesPerTrigger" -> "1")))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("infra_multibatch").start()
    try q.processAllAvailable() finally q.stop()
    // genuinely incremental: one batch per file
    assert(q.recentProgress.count(_.numInputRows > 0) >= parts,
      s"expected >= $parts data batches, got " +
        q.recentProgress.map(_.numInputRows).mkString(","))
    val streamed = spark.table("infra_multibatch")
      .orderBy(col("hour"), col("event_type")).collect()
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .orderBy(col("hour"), col("event_type"))
      .collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("TTL'd dedup twin: horizon re-opens keys in the data path, watermark evicts state") {
    import graft.streaming.Streaming
    val t0 = 1700000000000L // fixed epoch base; ONLY relative gaps matter
    def ts(offsetSec: Long) = new java.sql.Timestamp(t0 + offsetSec * 1000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl").toFile
    // one file per trigger, id-ordered mod times: A dup within horizon,
    // a late tick advancing the watermark, then A re-arriving PAST the
    // 300s horizon — must be a fresh original, and B must be evicted
    val files = Seq(
      Seq((1L, "A", ts(0)), (2L, "B", ts(60))),
      Seq((3L, "A", ts(120))),
      Seq((10L, "C", ts(1200))),
      Seq((11L, "A", ts(1260))))
    for ((rows, i) <- files.zipWithIndex) {
      rows.toDF("doc_id", "fp", "ts")
        .coalesce(1).write.parquet(s"$dir/f$i")
      Thread.sleep(20) // distinct mod times => deterministic file order
    }
    val out = Streaming.incrementalDedupTtlTransform(spark, s"$dir/*/",
      horizonMs = 300000L, delay = "60 seconds",
      extraOptions = Map("maxFilesPerTrigger" -> "1"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("infra_ttl").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("infra_ttl").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "kept", 2L -> "kept", 3L -> "dup",
      10L -> "kept", 11L -> "kept"), got.toString)
    // eviction proof: 3 distinct fingerprints ever, but B idled past
    // lastSeen + horizon and the final store holds only A and C
    val finalRows = q.recentProgress.last.stateOperators.map(_.numRowsTotal).sum
    assert(finalRows == 2L, s"expected B evicted, state rows = $finalRows")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("st_dedup_ttl gate == batch LAG recomputation; both plant branches fire") {
    // state-bound/eviction mechanics are pinned by the transform test
    // above; this drives the ORACLED gate over the planted corpus
    // replay and recomputes its lag-window semantics in batch
    val got = graft.streaming.Streaming
      .dedupTtlStream(spark, sf0001, queryName = "infra_ttl_gate")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val docs = Tables.documents(spark, sf0001)
    val pb = graft.queries.LlmOps.plantBase(docs)
    val horizon = graft.queries.LlmOps.DedupTtlHorizonS
    val base = lit(1000000000L)
    def leg(from: org.apache.spark.sql.DataFrame,
        ids: org.apache.spark.sql.Column, tsS: org.apache.spark.sql.Column) =
      from.select(ids.as("doc_id"),
        graft.text.fingerprint_md5(col("text")).as("fp"), tsS.as("ts_s"))
    val src = leg(docs, col("doc_id"), base + col("doc_id"))
      .unionByName(leg(docs.filter(col("doc_id") % 7 === 0),
        col("doc_id") + pb, base + col("doc_id") + 10L))
      .unionByName(leg(docs.filter(col("doc_id") % 11 === 0),
        col("doc_id") + 2 * pb, base + col("doc_id") + horizon + 3600L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("ts_s"), col("doc_id"))
    val expected = src.withColumn("prev", lag(col("ts_s"), 1).over(w))
      .select(col("doc_id"), col("fp"),
        when(col("prev").isNull || col("ts_s") - col("prev") > horizon,
          "kept").otherwise("dup").as("status"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq)
    // both planted branches must actually fire: a within-horizon
    // re-arrival marked dup, and a lapsed re-arrival re-opened as kept
    val statusOf = got.map(t => t._1 -> t._3).toMap
    assert(got.exists(t => t._1 >= pb && t._1 < 2 * pb && t._3 == "dup"),
      "no within-horizon plant was marked dup")
    assert(got.exists(t => t._1 >= 2 * pb && t._3 == "kept"),
      "no lapsed plant was re-opened as kept")
    assert(statusOf.size == got.length, "planted ids collide")
    // RocksDB provider equivalence (the off-heap state backend a 100 TB
    // deployment runs this fold on)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = graft.streaming.Streaming
        .dedupTtlStream(spark, sf0001, queryName = s"infra_ttl_rocks_${System.nanoTime}")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(rocks.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq,
        s"RocksDB drifted: ${rocks.length} vs ${got.length}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("incremental dedup stream: state fp-bounded, RocksDB == default, multi-batch == batch") {
    import graft.streaming.Streaming
    // batch truth: the d_incremental operator on the same composition
    val batchAnswer = graft.queries.LlmOps.dedupIncremental(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    def run(dir: String, glob: String, opts: Map[String, String],
        name: String): (Set[(Long, String, String)], Long, Int) = {
      val out = Streaming.incrementalDedupTransform(spark, dir,
        histDir = sf0001, glob = glob, extraOptions = opts)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val maxStateRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      val batches = q.recentProgress.count(_.numInputRows > 0)
      (rows, maxStateRows, batches)
    }
    val (got, stateRows, _) = run(sf0001, "documents.parquet", Map.empty, "infra_incr")
    assert(got == batchAnswer,
      s"stream=${got.size} batch=${batchAnswer.size} " +
        s"onlyStream=${(got -- batchAnswer).take(3)} onlyBatch=${(batchAnswer -- got).take(3)}")
    assert(got.nonEmpty && got.exists(_._3 == "dup_hist") &&
      got.exists(_._3 == "kept") && got.exists(_._3 == "dup_batch"))
    // state bound: one O(1) record per distinct fingerprint (history ∪
    // batch), NEVER per document — the fingerprint-index shape
    val docs = Tables.documents(spark, sf0001)
    val histFps = docs.filter(col("doc_id") % 5 =!= 0)
      .select(graft.text.fingerprint_md5(col("text")).as("fp"))
    val batchFps = docs.filter(col("doc_id") % 5 === 0)
      .select(graft.text.fingerprint_md5(col("text")).as("fp"))
    val nFps = histFps.union(batchFps).distinct().count()
    assert(stateRows <= nFps,
      s"state rows $stateRows exceed distinct fingerprint count $nFps")
    // RocksDB provider equivalence (the off-heap state backend a 100 TB
    // fingerprint index actually runs on)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (rocks, _, _) = run(sf0001, "documents.parquet", Map.empty,
        s"infra_incr_rocks_${System.nanoTime}")
      assert(rocks == got, s"RocksDB drifted: ${rocks.size} vs ${got.size}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // multi-batch continuous-ingest replay: id-ordered 3-file split,
    // one file per trigger — first-arrival == min-id under ordered
    // ingestion, so the stream still equals the batch oracle while the
    // fp index state carries over BETWEEN micro-batches
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_split").toFile
    val n = docs.count()
    val parts = 3
    val ranked = docs.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    for (i <- 0 until parts) {
      val lo = i * n / parts; val hi = (i + 1) * n / parts
      writeOneParquet(ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn"),
        new java.io.File(dir, f"documents_$i%02d.parquet"), 2000000L + i * 60000L)
    }
    val (multi, _, batches) = run(dir.getPath, "documents_*.parquet",
      Map("maxFilesPerTrigger" -> "1"), "infra_incr_multi")
    assert(batches >= parts,
      s"expected >= $parts data batches, got $batches")
    assert(multi == batchAnswer,
      s"multi-batch drifted: ${multi.size} vs ${batchAnswer.size} " +
        s"diff=${((multi -- batchAnswer) ++ (batchAnswer -- multi)).take(5)}")
  }

  test("incremental NEAR dedup stream: == batch, band-key state bound, RocksDB ==, multi-batch ==") {
    import graft.streaming.Streaming
    // batch truth: the d_incremental_near operator on the same composition
    val batchAnswer = graft.queries.LlmOps.dedupIncrementalNear(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    def reduceHits(name: String): Set[(Long, Long, Long, String)] = {
      val t = spark.table(name).collect()
      val pairs = t.filter(_.getString(2) != "self")
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val docs = t.filter(_.getString(2) == "self").map(_.getLong(0)).toSet
      docs.map { d =>
        val nh = pairs.count(p => p._1 == d && p._3 == "h").toLong
        val np = pairs.count(p => p._1 == d && p._3 == "b").toLong
        (d, nh, np,
          if (nh > 0) "dup_hist" else if (np > 0) "dup_batch" else "kept")
      }
    }
    def run(dir: String, glob: String, opts: Map[String, String],
        name: String): (Set[(Long, Long, Long, String)], Long, Int, Seq[Long]) = {
      val out = Streaming.incrementalNearTransform(spark, dir,
        histDir = sf0001, glob = glob, extraOptions = opts)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val maxStateRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      // final per-operator state row counts (last progress entry wins)
      val finalRows = q.recentProgress.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).toSeq).getOrElse(Seq.empty)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      (reduceHits(name), maxStateRows, batches, finalRows)
    }
    val (got, stateRows, _, finalOpRows) =
      run(sf0001, "documents.parquet", Map.empty, "infra_near")
    assert(got == batchAnswer,
      s"stream=${got.size} batch=${batchAnswer.size} " +
        s"onlyStream=${(got -- batchAnswer).take(3)} onlyBatch=${(batchAnswer -- got).take(3)}")
    assert(got.exists(_._4 == "dup_hist") && got.exists(_._4 == "kept") &&
      got.exists(_._4 == "dup_batch"))
    // state bounds, one per stage:
    //  - band store: one record per OCCUPIED (band, band-key) — at most
    //    bands × indexed docs, and each entry is (doc id, side) ONLY
    //  - attach store: stateless co-group — exactly 0 rows forever
    //  - verify store: the single doc → shingle-set map — exactly one
    //    row per indexed doc (history ∪ arrivals), never ×16
    val docs = Tables.documents(spark, sf0001)
    val nIndexed = docs.filter(col("doc_id") % 5 =!= 0).count() + // history
      docs.filter(col("doc_id") % 5 === 0).count() +              // fresh
      docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 0).count() +
      docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % 9 === 0).count()
    assert(stateRows > 0 && stateRows <= 16 * nIndexed,
      s"state rows $stateRows exceed the 16-band index bound ${16 * nIndexed}")
    assert(finalOpRows.length == 3, s"expected 3 stateful stages: $finalOpRows")
    // pinned BY OPERATOR POSITION (progress lists operators sink-first:
    // 0 = verify, 1 = attach, 2 = band index — probed empirically), so a
    // regression moving shingle state into another store cannot hide
    // behind a coincidental count match (round-13 advice)
    assert(finalOpRows(1) == 0L,
      s"attach stage (op 1) must hold no state: $finalOpRows")
    assert(finalOpRows(0) == nIndexed,
      s"verify store (op 0) must hold exactly one row per indexed doc " +
        s"($nIndexed): $finalOpRows")
    assert(finalOpRows(2) > 0L && finalOpRows(2) <= 16 * nIndexed,
      s"band store (op 2) must hold (band,key) ids only, " +
        s"<= ${16 * nIndexed}: $finalOpRows")
    // the band state entry type structurally CANNOT carry a shingle
    // array — the ×16 shingle replication the old single-stage design
    // had is gone at the type level
    assert(!classOf[graft.streaming.NearIdEntry].getDeclaredFields.exists(
        f => classOf[scala.collection.Seq[_]].isAssignableFrom(f.getType) ||
          f.getType.isArray),
      "band state entries must not carry shingle arrays")
    // RocksDB provider equivalence (the off-heap backend the shingle-
    // bearing band index actually needs at corpus scale)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (rocks, _, _, _) = run(sf0001, "documents.parquet", Map.empty,
        s"infra_near_rocks_${System.nanoTime}")
      assert(rocks == got, s"RocksDB drifted: ${rocks.size} vs ${got.size}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // multi-batch continuous-ingest replay: id-ordered 3-file split, one
    // file per trigger — within-batch "prior" stays the lower doc_id
    // under ordered ingestion, so the stream still equals the batch
    // oracle while the band index state carries over BETWEEN triggers
    val dir = java.nio.file.Files.createTempDirectory("graft_near_split").toFile
    val n = docs.count()
    val parts = 3
    val ranked = docs.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    for (i <- 0 until parts) {
      val lo = i * n / parts; val hi = (i + 1) * n / parts
      writeOneParquet(ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn"),
        new java.io.File(dir, f"documents_$i%02d.parquet"), 3000000L + i * 60000L)
    }
    val (multi, _, batches, _) = run(dir.getPath, "documents_*.parquet",
      Map("maxFilesPerTrigger" -> "1"), "infra_near_multi")
    assert(batches >= parts, s"expected >= $parts data batches, got $batches")
    // Across triggers the invariants weaken EXACTLY where continuous
    // ingest semantics differ from a batch: "prior batch" is
    // arrival-order, and planted ids (recrawls at +pb) arrive in their
    // SOURCE doc's trigger — so a batch-batch pair's prior-direction
    // can flip vs the id-ordered batch oracle. What must hold:
    //  - the doc universe is identical,
    //  - history attribution is identical (state-resident before any
    //    trigger, direction-free),
    //  - the VERIFIED batch-batch pair set is identical UNDIRECTED
    //    (detection never depends on arrival order, only attribution).
    def pairsOf(name: String): (Set[(Long, Long)], Set[(Long, Long)]) = {
      val t = spark.table(name).collect()
        .filter(_.getString(2) != "self")
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      (t.filter(_._3 == "h").map(p => (p._1, p._2)),
        t.filter(_._3 == "b").map(p =>
          (math.min(p._1, p._2), math.max(p._1, p._2))))
    }
    val (singleH, singleB) = pairsOf("infra_near")
    val (multiH, multiB) = pairsOf("infra_near_multi")
    assert(multi.map(_._1) == batchAnswer.map(_._1), "doc universe drifted")
    assert(multiH == singleH,
      s"history attribution drifted: ${((multiH -- singleH) ++ (singleH -- multiH)).take(5)}")
    assert(multiB == singleB,
      s"undirected batch-pair set drifted: ${((multiB -- singleB) ++ (singleB -- multiB)).take(5)}")
    // and the collapsed answer must still agree wherever no direction
    // flip occurred — i.e. everywhere except docs in a flipped pair
    val flipped = (multi -- batchAnswer).map(_._1)
    assert((batchAnswer -- multi).map(_._1) == flipped)
    flipped.foreach { d =>
      assert(multiB.exists(p => p._1 == d || p._2 == d),
        s"doc $d drifted without being in any batch-batch pair")
    }
  }

  test("incremental SEM dedup stream: == batch, cell-bounded state, RocksDB ==, multi-batch ==") {
    import graft.streaming.Streaming
    // batch truth: the d_incremental_sem operator on the same composition
    val batchAnswer = graft.queries.LlmOps.dedupIncrementalSem(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    graft.util.IntermediateCaches.releaseAll(blocking = true)
    def reduceHits(name: String): Set[(Long, Long, Long, String)] = {
      val t = spark.table(name).collect()
      val pairs = t.filter(_.getString(2) != "self")
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val vecs = t.filter(_.getString(2) == "self").map(_.getLong(0)).toSet
      vecs.map { v =>
        val nh = pairs.count(p => p._1 == v && p._3 == "h").toLong
        val np = pairs.count(p => p._1 == v && p._3 == "b").toLong
        (v, nh, np,
          if (nh > 0) "dup_hist" else if (np > 0) "dup_batch" else "kept")
      }
    }
    def run(dir: String, glob: String, opts: Map[String, String],
        name: String): (Set[(Long, Long, Long, String)], Int, Seq[Long]) = {
      val out = Streaming.semDedupTransform(spark, dir,
        histDir = sf0001, glob = glob, extraOptions = opts)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val finalRows = q.recentProgress.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).toSeq).getOrElse(Seq.empty)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      (reduceHits(name), batches, finalRows)
    }
    val (got, _, finalOpRows) =
      run(sf0001, "embeddings.parquet", Map.empty, "infra_sem")
    assert(got == batchAnswer,
      s"stream=${got.size} batch=${batchAnswer.size} " +
        s"onlyStream=${(got -- batchAnswer).take(3)} onlyBatch=${(batchAnswer -- got).take(3)}")
    // the identical-embedding plants guarantee every status at any SF
    assert(got.exists(_._4 == "dup_hist") && got.exists(_._4 == "kept") &&
      got.exists(_._4 == "dup_batch"))
    // state bound: ONE stateful stage, keyed by the coarse cell — at
    // most nCells=16 state ROWS however large the corpus (the index
    // grows inside the per-cell entry list, one entry per indexed
    // vector, norms precomputed — never a second copy of a vector)
    assert(finalOpRows.length == 1, s"expected 1 stateful stage: $finalOpRows")
    assert(finalOpRows.head > 0L && finalOpRows.head <= 16L,
      s"cell store must hold <= 16 rows (occupied cells): $finalOpRows")
    // RocksDB provider equivalence (the off-heap backend the
    // vector-bearing cell index actually needs at corpus scale)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (rocks, _, _) = run(sf0001, "embeddings.parquet", Map.empty,
        s"infra_sem_rocks_${System.nanoTime}")
      assert(rocks == got, s"RocksDB drifted: ${rocks.size} vs ${got.size}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // multi-batch continuous-ingest replay: id-ordered 3-file split, one
    // file per trigger — the cell index carries over BETWEEN triggers,
    // and under ordered ingestion within-batch "prior" stays the lower
    // vec_id, so the invariants mirror the NEAR stream's exactly
    val emb = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_split").toFile
    val n = emb.count()
    val parts = 3
    val ranked = emb.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))))
    for (i <- 0 until parts) {
      val lo = i * n / parts; val hi = (i + 1) * n / parts
      writeOneParquet(ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn"),
        new java.io.File(dir, f"embeddings_$i%02d.parquet"), 4000000L + i * 60000L)
    }
    val (multi, batches, _) = run(dir.getPath, "embeddings_*.parquet",
      Map("maxFilesPerTrigger" -> "1"), "infra_sem_multi")
    assert(batches >= parts, s"expected >= $parts data batches, got $batches")
    def pairsOf(name: String): (Set[(Long, Long)], Set[(Long, Long)]) = {
      val t = spark.table(name).collect()
        .filter(_.getString(2) != "self")
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      (t.filter(_._3 == "h").map(p => (p._1, p._2)),
        t.filter(_._3 == "b").map(p =>
          (math.min(p._1, p._2), math.max(p._1, p._2))))
    }
    val (singleH, singleB) = pairsOf("infra_sem")
    val (multiH, multiB) = pairsOf("infra_sem_multi")
    assert(multi.map(_._1) == batchAnswer.map(_._1), "vector universe drifted")
    assert(multiH == singleH,
      s"history attribution drifted: ${((multiH -- singleH) ++ (singleH -- multiH)).take(5)}")
    assert(multiB == singleB,
      s"undirected batch-pair set drifted: ${((multiB -- singleB) ++ (singleB -- multiB)).take(5)}")
    val flipped = (multi -- batchAnswer).map(_._1)
    assert((batchAnswer -- multi).map(_._1) == flipped)
    flipped.foreach { v =>
      assert(multiB.exists(p => p._1 == v || p._2 == v),
        s"vector $v drifted without being in any batch-batch pair")
    }
  }

  test("crawl scheduler stream: plan == batch, blocked never ticked, domain-bounded state, multi-batch rank carry-over") {
    import graft.streaming.Streaming
    // batch truth: the composed t_pipeline_schedule capstone
    val batchCard = graft.queries.LlmOps.pipelineSchedule(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    def run(dir: String, glob: String, opts: Map[String, String],
        name: String): (Int, Seq[Long]) = {
      val out = Streaming.scheduleTransform(spark, dir,
        histDir = sf0001, glob = glob, extraOptions = opts)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val finalRows = q.recentProgress.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).toSeq).getOrElse(Seq.empty)
      (q.recentProgress.count(_.numInputRows > 0), finalRows)
    }
    def cardOf(name: String) = spark.table(name)
      .filter(col("status") === "fetch")
      .groupBy(col("tick"))
      .agg(count(lit(1)).as("n_fetches"), sum(col("doc_id")).as("id_sum"),
        sum(when(col("tier") === 1, 1L).otherwise(0L)).as("n_tier1"),
        md5(concat_ws("|", array_sort(collect_list(col("domain"))))
          .cast("binary")).as("domains_md5"))
      .orderBy(col("tick")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    val (_, finalRows) = run(sf0001, "documents.parquet", Map.empty, "infra_sched")
    assert(cardOf("infra_sched") == batchCard,
      s"stream card drifted from the batch plan")
    // the robots verdicts BITE inside the stream: blocked rows exist,
    // carry tick −1 only, and no blocked doc appears in any fetch row
    val rows = spark.table("infra_sched").collect()
    val blocked = rows.filter(_.getString(4) == "blocked")
    val fetched = rows.filter(_.getString(4) == "fetch")
    assert(blocked.nonEmpty && blocked.forall(_.getLong(3) == -1L))
    val blockedIds = blocked.map(_.getLong(0)).toSet
    assert(!fetched.exists(r => blockedIds.contains(r.getLong(0))),
      "a robots-blocked page took a fetch slot")
    // cross-check the blocked set against the standalone robots gate
    val nBlocked = graft.queries.LlmOps.robotsFilter(spark, sf0001)
      .agg(sum(col("n_blocked"))).head.getLong(0)
    assert(blockedIds.size.toLong == nBlocked,
      s"${blockedIds.size} blocked in-stream vs $nBlocked in t_robots")
    // state is the DOMAIN card, one row per catalog domain — no page
    // is ever retained
    val nDomains = graft.queries.LlmOps.robotsFilter(spark, sf0001).count()
    assert(finalRows == Seq(nDomains),
      s"state must be one row per domain ($nDomains): $finalRows")
    // multi-batch: id-ordered 3-file split, one file per trigger — the
    // rank counter carries over, so waves of frontier still produce
    // the IDENTICAL plan (FIFO by id == arrival order here)
    val docs = Tables.documents(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_sched_split").toFile
    val n = docs.count()
    val parts = 3
    val ranked = docs.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    for (i <- 0 until parts) {
      val lo = i * n / parts; val hi = (i + 1) * n / parts
      writeOneParquet(ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn"),
        new java.io.File(dir, f"documents_$i%02d.parquet"), 5000000L + i * 60000L)
    }
    val (batches, _) = run(dir.getPath, "documents_*.parquet",
      Map("maxFilesPerTrigger" -> "1"), "infra_sched_multi")
    assert(batches >= parts, s"expected >= $parts data batches, got $batches")
    assert(cardOf("infra_sched_multi") == batchCard,
      "rank carry-over broke the multi-trigger plan")
  }

  test("asset dedup stream: == batch mm_dedup, key-bounded state, multi-batch ==") {
    import graft.streaming.Streaming
    val batchAnswer = graft.queries.LlmOps.mmDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSet
    def run(dir: String, glob: String, opts: Map[String, String],
        name: String): (Set[(Long, String, String, Long, String)], Int, Seq[Long]) = {
      val out = Streaming.mmDedupTransform(spark, dir,
        histDir = sf0001, glob = glob, extraOptions = opts)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val finalRows = q.recentProgress.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).toSeq).getOrElse(Seq.empty)
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getString(4))).toSet
      (got, q.recentProgress.count(_.numInputRows > 0), finalRows)
    }
    val (got, _, finalRows) = run(sf0001, "documents.parquet", Map.empty, "infra_mm")
    assert(got == batchAnswer,
      s"stream=${got.size} batch=${batchAnswer.size} " +
        s"diff=${((got -- batchAnswer) ++ (batchAnswer -- got)).take(3)}")
    // every re-upload plant is caught, originals stay kept
    assert(got.count(_._5 == "dup") >= got.size / 6 && got.exists(_._5 == "kept"))
    // state = ONE row per distinct content address — never per asset,
    // never the payload
    val nKeys = got.map(g => (g._2, g._3, g._4)).size
    assert(finalRows == Seq(nKeys.toLong),
      s"state must be one row per content key ($nKeys): $finalRows")
    // multi-batch ordered ingest: keeper (min id) arrives first, so the
    // verdict table is identical while the key index carries over
    val docs = Tables.documents(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_mm_split").toFile
    val n = docs.count()
    val parts = 3
    val ranked = docs.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    for (i <- 0 until parts) {
      val lo = i * n / parts; val hi = (i + 1) * n / parts
      writeOneParquet(ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn"),
        new java.io.File(dir, f"documents_$i%02d.parquet"), 7000000L + i * 60000L)
    }
    val (multi, batches, _) = run(dir.getPath, "documents_*.parquet",
      Map("maxFilesPerTrigger" -> "1"), "infra_mm_multi")
    assert(batches >= parts, s"expected >= $parts data batches, got $batches")
    assert(multi == batchAnswer, "multi-trigger asset verdicts drifted")
  }

  test("ingest quota stream: admission bites, O(sources) state, multi-batch counter carry-over") {
    import graft.streaming.Streaming
    def run(dir: String, glob: String, opts: Map[String, String],
        name: String): (Int, Seq[Long]) = {
      val out = Streaming.budgetTransform(spark, dir,
        histDir = sf0001, glob = glob, extraOptions = opts)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val finalRows = q.recentProgress.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).toSeq).getOrElse(Seq.empty)
      (q.recentProgress.count(_.numInputRows > 0), finalRows)
    }
    val (_, finalRows) = run(sf0001, "documents.parquet", Map.empty, "infra_budget")
    val rows = spark.table("infra_budget").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val docs = Tables.documents(spark, sf0001)
    assert(rows.length == docs.count(), "every offered doc gets a verdict")
    // the 2/5 quota BITES in every source: both admitted and rejected
    val bySrc = rows.groupBy(_._2)
    bySrc.foreach { case (src, rs) =>
      assert(rs.exists(_._5) && rs.exists(!_._5), s"quota toothless in $src")
      // prefix-close: admitted ids are exactly the ids below the first
      // rejection (monotone cum makes the admitted set a prefix)
      val firstRej = rs.filter(!_._5).map(_._1).min
      assert(rs.filter(_._5).forall(_._1 < firstRej), s"non-prefix admission in $src")
      // the counter is offered volume: cum of the max-id row == Σ ntok
      assert(rs.maxBy(_._1)._4 == rs.map(_._3).sum, s"cum drifted in $src")
    }
    // O(sources) state — one counter per source, never a doc list
    assert(finalRows == Seq(bySrc.size.toLong),
      s"state must be one row per source (${bySrc.size}): $finalRows")
    // multi-batch: the counter carries over, verdicts identical
    val dir = java.nio.file.Files.createTempDirectory("graft_budget_split").toFile
    val n = docs.count()
    val parts = 3
    val ranked = docs.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    for (i <- 0 until parts) {
      val lo = i * n / parts; val hi = (i + 1) * n / parts
      writeOneParquet(ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn"),
        new java.io.File(dir, f"documents_$i%02d.parquet"), 6000000L + i * 60000L)
    }
    val (batches, _) = run(dir.getPath, "documents_*.parquet",
      Map("maxFilesPerTrigger" -> "1"), "infra_budget_multi")
    assert(batches >= parts, s"expected >= $parts data batches, got $batches")
    val multi = spark.table("infra_budget_multi").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(multi == rows.toSet, "multi-trigger quota verdicts drifted")
  }

  test("CDC apply stream: transition log == batch, state key-bounded, RocksDB ==, multi-batch ==") {
    import graft.streaming.Streaming
    // batch truth: the oracle's one-join transition log, computed as a
    // DataFrame (base fingerprints LEFT JOIN the planted change set)
    val docs = Tables.documents(spark, sf0001)
    val pb = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val base = docs.select(col("doc_id"),
      graft.text.fingerprint_md5(col("text")).as("fp"))
    val chraw = docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), lit("delete").as("op"), lit(null).cast("string").as("new_fp"))
      .unionByName(docs.filter(col("doc_id") % 11 =!= 0 && col("doc_id") % 17 === 0)
        .select(col("doc_id"), lit("update").as("op"),
          graft.text.fingerprint_md5(concat(col("text"), lit(" rev2"))).as("new_fp")))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + pb).as("doc_id"), lit("insert").as("op"),
          graft.text.fingerprint_md5(col("text")).as("new_fp")))
      .unionByName(docs.filter(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 2 * pb).as("doc_id"), lit("update").as("op"),
          graft.text.fingerprint_md5(concat(col("text"), lit(" rev3"))).as("new_fp")))
      .unionByName(docs.filter(col("doc_id") % 23 === 0 &&
          col("doc_id") % 11 =!= 0 && col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), lit("insert").as("op"),
          graft.text.fingerprint_md5(col("text")).as("new_fp")))
    val batchAnswer = chraw.join(base, Seq("doc_id"), "left")
      .select(col("doc_id"), col("op"),
        when(col("op") =!= "insert" && col("fp").isNull, lit(null))
          .otherwise(col("fp")).as("prev_fp"),
        when(col("op") === "delete", lit(null))
          .when(col("op") === "update" && col("fp").isNull, lit(null))
          .when(col("op") === "insert" && col("fp").isNotNull, lit(null))
          .otherwise(col("new_fp")).as("new_fp"),
        when(col("op") === "insert" && col("fp").isNotNull, "conflict")
          .when(col("op") =!= "insert" && col("fp").isNull, "orphan")
          .otherwise("applied").as("status"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    def run(dir: String, glob: String, opts: Map[String, String],
        name: String): (Set[(Long, String, String, String, String)], Long, Int) = {
      val out = Streaming.cdcApplyTransform(spark, dir,
        baseDir = sf0001, glob = glob, extraOptions = opts)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4))).toSet
      val maxStateRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      val batches = q.recentProgress.count(_.numInputRows > 0)
      (rows, maxStateRows, batches)
    }
    val (got, stateRows, _) = run(sf0001, "documents.parquet", Map.empty, "infra_cdc")
    assert(got == batchAnswer,
      s"stream=${got.size} batch=${batchAnswer.size} " +
        s"onlyStream=${(got -- batchAnswer).take(3)} onlyBatch=${(batchAnswer -- got).take(3)}")
    // every validation class actually fired
    assert(got.exists(_._5 == "applied") && got.exists(_._5 == "orphan") &&
      got.exists(_._5 == "conflict"))
    // state bound: one O(1) record per LIVE key — base docs plus
    // applied inserts, never per change or per op
    val nLive = docs.count() + got.count(t => t._2 == "insert" && t._5 == "applied")
    assert(stateRows <= nLive,
      s"state rows $stateRows exceed live-key bound $nLive")
    // RocksDB provider equivalence
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (rocks, _, _) = run(sf0001, "documents.parquet", Map.empty,
        s"infra_cdc_rocks_${System.nanoTime}")
      assert(rocks == got, s"RocksDB drifted: ${rocks.size} vs ${got.size}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // multi-batch: ops arrive over 3 id-ordered files, one per trigger;
    // one op per key makes the log arrival-order-proof, and the merged
    // state must carry BETWEEN micro-batches
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_split").toFile
    val n = docs.count()
    val parts = 3
    val ranked = docs.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    for (i <- 0 until parts) {
      val lo = i * n / parts; val hi = (i + 1) * n / parts
      writeOneParquet(ranked.filter(col("rn") > lo && col("rn") <= hi).drop("rn"),
        new java.io.File(dir, f"documents_$i%02d.parquet"), 3000000L + i * 60000L)
    }
    val (multi, _, batches) = run(dir.getPath, "documents_*.parquet",
      Map("maxFilesPerTrigger" -> "1"), "infra_cdc_multi")
    assert(batches >= parts, s"expected >= $parts data batches, got $batches")
    assert(multi == batchAnswer,
      s"multi-batch drifted: ${multi.size} vs ${batchAnswer.size}")
  }

  test("plant id-spaces stay disjoint on a corpus whose ids cross the old fixed offsets") {
    // Round-10 advice: fixed +40000/+60000 plant offsets alias natural
    // ids once the corpus outgrows them (sf1 reaches 49999). The
    // max(doc_id)-derived scheme must keep every planted key unique on
    // a corpus with ids PAST all the old boundaries — so this corpus
    // plants ids up to ~68k, exactly the range where the old scheme
    // provably collided (e.g. natural 40299 vs insert-plant 299+40000).
    import graft.streaming.Streaming
    val dir = java.nio.file.Files.createTempDirectory("graft_bigid").toFile
    val docs = (0 until 400).map { i =>
      val id = i.toLong * 171L // 0 .. 68229: crosses 20000/30000/40000/50000/60000
      (id, s"unique token$i payload$i for document number $i", "en",
        "synth", 40L)
    }
    writeOneParquet(
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"),
      new java.io.File(dir, "documents.parquet"), 5000000L)
    // CDC: the one-op-per-key invariant IS the correctness precondition
    val out = Streaming.cdcApplyTransform(spark, dir.getPath, baseDir = dir.getPath)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("infra_bigid_cdc").start()
    try q.processAllAvailable() finally q.stop()
    val cdc = spark.table("infra_bigid_cdc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(4)))
    assert(cdc.nonEmpty)
    val dupKeys = cdc.groupBy(_._1).filter(_._2.length > 1)
    assert(dupKeys.isEmpty,
      s"colliding change-log keys: ${dupKeys.keys.take(5).toSeq.sorted}")
    // plants landed where designed: inserts above max id, orphans above 2*pb
    val pb = docs.map(_._1).max + 1
    assert(cdc.filter(_._2 == "insert").exists(_._1 >= pb))
    assert(cdc.filter(t => t._2 == "update" && t._3 == "orphan")
      .forall(_._1 >= 2 * pb))
    // incremental exact + near: output ids unique (an aliased plant
    // would merge two texts under one id)
    Seq(graft.queries.LlmOps.dedupIncremental(spark, dir.getPath),
        graft.queries.LlmOps.dedupIncrementalNear(spark, dir.getPath))
      .foreach { df =>
        val ids = df.collect().map(_.getLong(0))
        assert(ids.length == ids.distinct.length,
          s"duplicate output doc_ids: ${ids.diff(ids.distinct).take(5).toSeq}")
      }
    graft.util.IntermediateCaches.releaseAll(blocking = true)
  }

  test("sessionization state stays key-bounded under a planted hot user (50% of events)") {
    import graft.streaming.{SessEvent, SessionOut, SessionState, Streaming}
    // The realistic skew failure for streaming state: ONE user owns
    // every other event. State must stay O(keys · open sessions per
    // key) — the sessionizer compacts each pending session to a
    // (start, last, n) triple — never O(events of the hot key).
    val nEv = 4000
    val base = 1600000000000000L // micros; clear of the epoch-0 watermark
    val rows = (0 until nEv).map { i =>
      val user = if (i % 2 == 0) 7L else 100L + ((i / 2) % 50)
      // global clock: 1 min per event, a 2 h jump every 400th event →
      // the hot user's stream merges into long sessions split at jumps;
      // cold users (100 min apart) split every time
      val us = base + i.toLong * 60000000L + (i / 400).toLong * 7200000000L
      (i.toLong, us * 1000L, user, "view", 1.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toFile
    writeOneParquet(rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      new java.io.File(dir, "events.parquet"), 2000000L)
    // custom-state sessionizer, inlined so the query handle (and its
    // state-store metrics) is observable
    val ev = Streaming.eventsStreamFrom(spark, dir.getPath)
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .as[SessEvent]
    val out = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        Streaming.sessionize(30L * 60L * 1000000L))
    val q = out.toDF().writeStream.outputMode("append")
      .format("memory").queryName("infra_skew_custom").start()
    try q.processAllAvailable() finally q.stop()
    val maxStateRows = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsTotal)).max
    val nKeys = 51L // hot user + 50 cold users
    assert(maxStateRows <= nKeys,
      s"state rows $maxStateRows exceed key count $nKeys — state is " +
        "scaling with the hot key's events, not with open sessions")
    // and the skewed output is still CORRECT: it must equal the native
    // session_window append path on the same input (same 30 min gap /
    // 10 min watermark closure)
    val custom = spark.table("infra_skew_custom")
      .select(col("user_id"), timestamp_micros(col("start_us")).as("s"),
        timestamp_micros(col("end_us")).as("e"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val native = Streaming.sessionsWindowed(spark, dir.getPath, "infra_skew_native")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(custom == native,
      s"custom=${custom.size} native=${native.size} " +
        s"onlyCustom=${(custom -- native).take(3)} onlyNative=${(native -- custom).take(3)}")
    // the hot user genuinely sessionized (long merged runs, split at jumps)
    val hotSessions = custom.filter(_._1 == 7L)
    assert(hotSessions.nonEmpty && hotSessions.exists(_._4 > 100L),
      s"hot user sessions: ${hotSessions.map(_._4).toSeq.sorted}")
  }

  test("RocksDB state store == default provider for native AND custom sessionization") {
    // The production streaming state backend: HDFS-backed in-memory maps
    // hold every key's state on-heap, which is exactly what a 100 TB
    // key space overflows; RocksDBStateStoreProvider (bundled with
    // Spark 4) spills state off-heap/on-disk per partition. The gates
    // run the default provider; this spec certifies both sessionization
    // paths are provider-agnostic — same closed-session output on
    // RocksDB, so flipping the conf at scale is a no-op semantically.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    def sessionSets(): (Set[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)],
        Set[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]) = {
      val nat = graft.streaming.Streaming
        .sessionsWindowed(spark, sf0001, s"infra_rocks_nat_${System.nanoTime}")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
      val cus = graft.streaming.Streaming
        .sessionsCustomState(spark, sf0001, s"infra_rocks_cus_${System.nanoTime}")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
      (nat, cus)
    }
    val (natDefault, cusDefault) = sessionSets()
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (natRocks, cusRocks) = sessionSets()
      assert(natRocks == natDefault,
        s"native session_window drifted on RocksDB: ${natRocks.size} vs ${natDefault.size}")
      assert(cusRocks == cusDefault,
        s"custom-state sessionizer drifted on RocksDB: ${cusRocks.size} vs ${cusDefault.size}")
      assert(natRocks.nonEmpty && cusRocks == natRocks)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("RocksDB state store == default provider for join, dedup, and watermarked dedup") {
    // Completes the provider certification beyond sessionization: the
    // remaining stateful gate paths — stream-stream interval join
    // (symmetric hash join state), complete-mode dedup aggregation, and
    // dropDuplicatesWithinWatermark — must be provider-agnostic too.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    def results(): (Seq[(Long, Long, Long)], Set[(String, Long, Long)], Set[Long]) = {
      val join = graft.streaming.Streaming
        .clickViewJoinStream(spark, sf0001, s"infra_rocks_join_${System.nanoTime}")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val dedup = graft.streaming.Streaming
        .exactDedupStream(spark, sf0001, s"infra_rocks_dd_${System.nanoTime}")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val wm = graft.streaming.Streaming
        .exactDedupStreamWatermarked(spark, sf0001,
          queryName = s"infra_rocks_wm_${System.nanoTime}")
        .collect().map(_.getLong(0)).toSet
      (join, dedup, wm)
    }
    val (joinD, dedupD, wmD) = results()
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (joinR, dedupR, wmR) = results()
      assert(joinR == joinD,
        s"stream-stream join drifted on RocksDB: ${joinR.size} vs ${joinD.size}")
      assert(dedupR == dedupD,
        s"dedup aggregation drifted on RocksDB: ${dedupR.size} vs ${dedupD.size}")
      assert(wmR == wmD,
        s"watermarked dedup drifted on RocksDB: ${wmR.size} vs ${wmD.size}")
      assert(joinR.nonEmpty && dedupR.nonEmpty && wmR.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-stream join state is watermark-horizon-bounded under a planted hot user, both providers") {
    // The join-side twin of the sessionization skew test: one user owns
    // half of ALL events, and the interval join's state must still be
    // bounded by (arrival rate × horizon + one in-flight file), never
    // by the stream so far — the eviction the 6 h range + 10 min delay
    // promise. A single-file replay cannot observe eviction (everything
    // arrives in one micro-batch), so this drives a time-ordered 6-file
    // split with maxFilesPerTrigger = 1.
    val nEv = 3000
    val perFile = 500
    val base = 1600000000000000L // micros
    val rows = (0 until nEv).map { i =>
      // 1 min apart → the 6 h + 10 min horizon holds ≤ 370 events;
      // hot user 7 on even i, 50 cold users share the rest; view/click
      // alternate in pairs so the hot user gets both sides
      val user = if (i % 2 == 0) 7L else 100L + ((i / 2) % 50)
      val typ = if (i % 4 < 2) "view" else "click"
      val us = base + i.toLong * 60000000L
      (i.toLong, us * 1000L, user, typ, 1.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_joinskew").toFile
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    for (i <- 0 until nEv / perFile) {
      writeOneParquet(
        df.filter(col("event_id") >= i * perFile && col("event_id") < (i + 1) * perFile),
        new java.io.File(dir, f"events_$i%02d.parquet"), 3000000L + i * 60000L)
    }
    // batch oracle: same interval join over the whole event set
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = spark.read.schema(df.schema).parquet(dir.getPath)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val c = all.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val v = all.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vu"), col("ts").as("vts"))
    val oracle = c.join(v, col("user_id") === col("vu") &&
        col("vts") >= col("cts") - expr("INTERVAL 6 HOURS") && col("vts") <= col("cts"))
      .select(col("click_id"), col("view_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(oracle.nonEmpty)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    def run(tag: String): (Set[(Long, Long, Long)], Long, Int) = {
      val joined = graft.streaming.Streaming.clickViewJoinTransformFrom(
        spark, dir.getPath, glob = "events_*.parquet",
        extraOptions = Map("maxFilesPerTrigger" -> "1"))
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(s"infra_joinskew_$tag").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(s"infra_joinskew_$tag")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val maxState = q.recentProgress
        .map(p => p.stateOperators.map(_.numRowsTotal).sum).max
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      (got, maxState, dataBatches)
    }
    // horizon rows: 6 h + 10 min at 1 event/min = 370, plus the newest
    // file still entirely in state (eviction uses the PREVIOUS batch's
    // watermark, so the in-flight 500 have not aged yet), plus slack
    // for the boundary batch. Unbounded buffering would reach ~3000.
    val bound = 370L + perFile + 330L
    val (gotDefault, stateDefault, batchesDefault) = run("default")
    assert(batchesDefault >= nEv / perFile,
      s"expected >= ${nEv / perFile} data batches, got $batchesDefault")
    assert(gotDefault == oracle,
      s"join drifted from batch oracle: ${gotDefault.size} vs ${oracle.size}")
    assert(stateDefault <= bound,
      s"state rows $stateDefault exceed horizon bound $bound — join state " +
        "is scaling with the stream, not the watermark horizon")
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (gotRocks, stateRocks, _) = run("rocksdb")
      assert(gotRocks == oracle, "RocksDB output drifted from the batch oracle")
      assert(stateRocks <= bound,
        s"RocksDB state rows $stateRocks exceed horizon bound $bound")
    } finally prev match {
      case Some(v2) => spark.conf.set(key, v2)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming KMV sketch: group-bounded state under high-cardinality keys, update mode, both providers") {
    import graft.sketch.Sketch
    // The bounded-state claim made adversarial: 10 000 distinct users
    // stream through a per-event-type KMV DISTINCT sketch, and streaming
    // state must stay O(groups) — one sketch row (64 longs) per event
    // type — NEVER O(distinct users), which is exactly the unbounded
    // state that makes exact streaming COUNT(DISTINCT) unsupported.
    // Update mode (the production sink shape for a continuously-read
    // estimate: emit only changed groups per batch) via foreachBatch, a
    // time-ordered 3-file replay so the sketch state actually carries
    // across micro-batches, certified on the default AND RocksDB
    // providers.
    val nEv = 30000; val nUsers = 10000
    val types = Seq("view", "click", "buy")
    val base = 1600000000000000L // micros
    val all = (0 until nEv).map { i =>
      val us = base + i.toLong * 1000000L
      (i.toLong, us * 1000L, 1000L + (i % nUsers).toLong, types(i % 3), 1.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_kmvstream").toFile
    val df = all.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val perFile = nEv / 3
    for (i <- 0 until 3) {
      writeOneParquet(
        df.filter(col("event_id") >= i * perFile && col("event_id") < (i + 1) * perFile),
        new java.io.File(dir, f"events_$i%02d.parquet"), 4000000L + i * 60000L)
    }
    val k = 64
    // batch oracle over the full set: (type -> (n_kept, est))
    val batch = df
      .groupBy(col("event_type"))
      .agg(Sketch.kmv_sketch(Sketch.hash60(col("user_id").cast("string")), k).as("kmv"))
      .select(col("event_type"), size(col("kmv")).cast("long").as("n_kept"),
        Sketch.kmvEstimate(col("kmv"), k).as("est"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(batch.size == 3 && batch.values.forall(_._1 == k.toLong))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    def run(tag: String): (Map[String, (Long, Double)], Long, Int) = {
      val agg = graft.streaming.Streaming
        .eventsStreamFrom(spark, dir.getPath, glob = "events_*.parquet",
          extraOptions = Map("maxFilesPerTrigger" -> "1"))
        .groupBy(col("event_type"))
        .agg(Sketch.kmv_sketch(Sketch.hash60(col("user_id").cast("string")), k).as("kmv"))
        .select(col("event_type"), size(col("kmv")).cast("long").as("n_kept"),
          Sketch.kmvEstimate(col("kmv"), k).as("est"))
      // per-key latest emission across update-mode batches
      val latest = scala.collection.mutable.Map.empty[String, (Long, Double)]
      var batches = 0
      val q = agg.writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = b.collect()
          latest.synchronized {
            if (rows.nonEmpty) batches += 1
            rows.foreach(r =>
              latest(r.getString(0)) = (r.getLong(1), r.getDouble(2)))
          }
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val maxState = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      (latest.toMap, maxState, batches)
    }
    val (gotDefault, stateDefault, batchesDefault) = run("default")
    assert(batchesDefault >= 3, s"expected >= 3 data batches, got $batchesDefault")
    assert(gotDefault == batch,
      s"update-mode KMV drifted from batch: $gotDefault vs $batch")
    assert(stateDefault <= types.size.toLong,
      s"state rows $stateDefault exceed group count ${types.size} — sketch state " +
        s"is scaling with the $nUsers distinct users, not with groups")
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (gotRocks, stateRocks, _) = run("rocksdb")
      assert(gotRocks == batch, "RocksDB KMV drifted from the batch oracle")
      assert(stateRocks <= types.size.toLong,
        s"RocksDB state rows $stateRocks exceed group count ${types.size}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stateful streaming: running count per user via flatMapGroupsWithState") {
    val input = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id")).as[(Long, Long)]
    // batch Dataset drives the same state function shape used in streams
    val counted = input.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
        val prev = state.getOption.getOrElse(0L)
        val n = prev + rows.size
        state.update(n)
        Iterator((user, n))
    }.collect().toMap
    val expected = Tables.events(spark, sf0001)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(counted == expected)
  }

  test("streaming dedup: dropDuplicates within watermark removes replays") {
    // duplicate the stream by unioning it with itself; event_id dedup
    // must restore the original count
    val base = graft.streaming.Streaming.eventsStream(spark, sf0001)
    val doubled = base.union(base)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy().count()
    val q = doubled.writeStream.outputMode("complete")
      .format("memory").queryName("dedup_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_stream").collect().head.getLong(0)
    assert(got == Tables.events(spark, sf0001).count())
  }

  test("watermarked streaming dedup == batch one-per-fingerprint within the horizon") {
    // the bounded-state production variant of st_dedup_stream: append
    // mode + dropDuplicatesWithinWatermark emits exactly one row per
    // fingerprint (the replay fits inside one watermark horizon, so the
    // weakened contract coincides with exact dedup here)
    val out = graft.streaming.Streaming
      .exactDedupStreamWatermarked(spark, sf0001, queryName = "infra_dedup_wm")
      .collect()
    val batch = graft.dedup.Dedup
      .exactGroups(Tables.documents(spark, sf0001)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap // fp -> group size
    // exactly one surviving row per distinct fingerprint
    assert(out.map(_.getAs[String]("fp")).toSet == batch.keySet)
    assert(out.length == batch.size)
    // every kept doc genuinely carries the fingerprint it represents
    val fpOf = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.text.fingerprint_md5(org.apache.spark.sql.functions.col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(fpOf(r.getAs[Long]("doc_id")) == r.getAs[String]("fp"))
    }
  }

  test("clickViewJoinStream == batch interval join") {
    val streamed = graft.streaming.Streaming
      .clickViewJoinStream(spark, sf0001, queryName = "infra_cvj")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sf0001)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vu"), col("ts").as("vts"))
    val batch = c.join(v, col("user_id") === col("vu") &&
        col("vts") >= col("cts") - expr("INTERVAL 6 HOURS") && col("vts") <= col("cts"))
      .select(col("click_id"), col("view_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("clickViewJoinTransform is sink-agnostic: parquet file sink == memory sink") {
    // the production shape: the SAME streaming frame the gate replays
    // into its memory-sink oracle, driven into a file sink (append-mode
    // parquet + checkpoint) — nothing driver-side in the output path
    val out = java.nio.file.Files.createTempDirectory("cvj_file_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cvj_ckpt").toString
    val q = graft.streaming.Streaming.clickViewJoinTransform(spark, sf0001)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val fromFiles = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromMemory = graft.streaming.Streaming
      .clickViewJoinStream(spark, sf0001, queryName = "infra_cvj_file_ref")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromFiles == fromMemory,
      s"file=${fromFiles.size} memory=${fromMemory.size}")
    assert(fromFiles.nonEmpty)
  }

  test("flatMapGroupsWithState sessionizer == native session_window append output") {
    val custom = graft.streaming.Streaming
      .sessionsCustomState(spark, sf0001, queryName = "infra_sess_fmgs")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val native = graft.streaming.Streaming
      .sessionsWindowed(spark, sf0001, queryName = "infra_sess_native")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(custom == native,
      s"custom=${custom.size} native=${native.size} " +
        s"onlyCustom=${(custom -- native).take(3)} onlyNative=${(native -- custom).take(3)}")
    assert(custom.nonEmpty)
  }

  // ------------------------------------------------------- port utils

  test("PortUtils retries past occupied ports") {
    val blocker = new ServerSocket(0)
    val busy = blocker.getLocalPort
    try {
      val bound = PortUtils.startOnPort({ p =>
        val ss = new ServerSocket(p)
        val actual = ss.getLocalPort
        ss.close()
        actual
      }, "test-server", busy, maxRetries = 5)
      assert(bound != busy && bound > busy && bound <= busy + 5)
    } finally blocker.close()
  }

  test("PortUtils propagates non-bind failures and detects collision chains") {
    intercept[IllegalArgumentException] {
      PortUtils.startOnPort(_ => throw new IllegalArgumentException("boom"),
        "t", 1500, 2)
    }
    assert(PortUtils.isBindCollision(
      new RuntimeException(new BindException("Address already in use"))))
    assert(!PortUtils.isBindCollision(new RuntimeException("other")))
  }

  // ---------------------------------------------------- commit protocol

  test("PathOutputCommitProtocol commits a parquet write end-to-end") {
    val out = java.nio.file.Files.createTempDirectory("graft_commit_").toString + "/t"
    val prev = spark.conf.getOption("spark.sql.sources.commitProtocolClass")
    spark.conf.set("spark.sql.sources.commitProtocolClass",
      "org.apache.spark.sql.graft.cloud.PathOutputCommitProtocol")
    try {
      Seq((1, "a"), (2, "b")).toDF("id", "s").repartition(2)
        .write.mode("overwrite").parquet(out)
      val back = spark.read.parquet(out).collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(back == Set((1, "a"), (2, "b")))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.commitProtocolClass", v)
        case None => spark.conf.unset("spark.sql.sources.commitProtocolClass")
      }
    }
  }

  test("PathOutputCommitProtocol rejects rename-based committer when flagged") {
    // on file:// the default factory yields the rename-based
    // FileOutputCommitter — exactly what the reject flag must refuse
    val out = java.nio.file.Files.createTempDirectory("graft_reject_").toString + "/t"
    val prev = spark.conf.getOption("spark.sql.sources.commitProtocolClass")
    val hc = spark.sparkContext.hadoopConfiguration
    spark.conf.set("spark.sql.sources.commitProtocolClass",
      "org.apache.spark.sql.graft.cloud.PathOutputCommitProtocol")
    hc.setBoolean(
      org.apache.spark.sql.graft.cloud.PathOutputCommitProtocol.RejectFileOutput, true)
    try {
      val e = intercept[Throwable] {
        Seq((1, "a")).toDF("id", "s").write.mode("overwrite").parquet(out)
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c =>
        c.isInstanceOf[java.io.IOException] &&
          c.getMessage != null && c.getMessage.contains("reject.fileoutput")),
        s"expected reject IOException in cause chain, got: $e")
    } finally {
      hc.unset(
        org.apache.spark.sql.graft.cloud.PathOutputCommitProtocol.RejectFileOutput)
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.commitProtocolClass", v)
        case None => spark.conf.unset("spark.sql.sources.commitProtocolClass")
      }
    }
  }

  // -------------------------------------------------------- python

  test("PythonHelper executes python that calls back into this SparkSession") {
    val marker = java.nio.file.Files.createTempFile("graft_py_out_", ".txt")
    val code =
      s"""import os
         |from py4j.java_gateway import JavaGateway, GatewayParameters
         |gw = JavaGateway(gateway_parameters=GatewayParameters(
         |    port=int(os.environ["GRAFT_GATEWAY_PORT"]),
         |    auth_token=os.environ["GRAFT_GATEWAY_SECRET"],
         |    auto_convert=True))
         |entry = gw.entry_point
         |jdf = entry.sql("SELECT CAST(40 + 2 AS BIGINT) AS answer")
         |rows = jdf.collectAsList()
         |with open("${marker.toString}", "w") as f:
         |    f.write(str(rows.get(0).getLong(0)) + "," + entry.version())
         |gw.shutdown()
         |""".stripMargin
    org.apache.spark.sql.graft.python.PythonHelper.exec(spark, code)
    val content = new String(java.nio.file.Files.readAllBytes(marker))
    assert(content.startsWith("42,"))
    assert(content.contains(spark.version))
  }

  test("PythonHelper surfaces non-zero exit as failure") {
    intercept[Exception] {
      org.apache.spark.sql.graft.python.PythonHelper.exec(spark, "import sys; sys.exit(3)")
    }
  }

  test("PythonHelper ships helper modules to the subprocess via pyFiles") {
    val helperDir = java.nio.file.Files.createTempDirectory("graft_pyhelper_")
    val helper = helperDir.resolve("graft_helper.py")
    java.nio.file.Files.write(helper,
      "def triple(x):\n    return 3 * x\n".getBytes("UTF-8"))
    val marker = java.nio.file.Files.createTempFile("graft_py_out_", ".txt")
    val code =
      s"""import graft_helper
         |with open("${marker.toString}", "w") as f:
         |    f.write(str(graft_helper.triple(14)))
         |""".stripMargin
    org.apache.spark.sql.graft.python.PythonHelper.exec(spark, code,
      pyFiles = Seq(helper.toString))
    assert(new String(java.nio.file.Files.readAllBytes(marker)) == "42")
    // a directory py-file entry goes on PYTHONPATH as-is
    val marker2 = java.nio.file.Files.createTempFile("graft_py_out_", ".txt")
    val code2 =
      s"""import graft_helper
         |with open("${marker2.toString}", "w") as f:
         |    f.write(str(graft_helper.triple(1)))
         |""".stripMargin
    org.apache.spark.sql.graft.python.PythonHelper.exec(spark, code2,
      pyFiles = Seq(helperDir.toString))
    assert(new String(java.nio.file.Files.readAllBytes(marker2)) == "3")
  }
}
