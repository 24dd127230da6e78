package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sketch.Sketch
import graft.text.Classify
import org.apache.spark.sql.graft.KmvAggregator

class SketchSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  // ---------------------------------------------- histogram quantiles

  test("histogram bucketing rejects configurations that cannot be cross-engine exact") {
    // The exactness contract: lo must be 0 and range/buckets powers of
    // two so the embedded scale constant involves no rounding of its
    // own — a non-conforming future gate must fail HERE, loudly, not
    // hash-diverge in the driver's compare (round-9/10 advice).
    intercept[IllegalArgumentException] {
      Sketch.histBucket(col("v"), 100, 0.0, 1.0) // buckets not 2^k
    }
    intercept[IllegalArgumentException] {
      Sketch.histBucketSql("v", 256, 0.5, 1.5) // lo != 0
    }
    intercept[IllegalArgumentException] {
      Sketch.histMidpointSql("b", 256, 0.0, 3.0) // range not 2^k
    }
    // conforming non-unit ranges stay allowed
    Sketch.histBucket(col("v"), 256, 0.0, 2.0)
    Sketch.histBucketSql("v", 1024, 0.0, 0.5)
  }

  test("histogram quantile sketch: half-bucket error bound, monotone, known distribution") {
    import graft.sketch.Sketch
    // known distribution: values i/1000 for i in 0..999, one group —
    // P25/P50/P75 exact order statistics are 0.249/0.499/0.749 (rank
    // ceil(p·n/100) in 0-based value terms), every estimate must land
    // within half a bucket width (1/512) of them
    val df = (0 until 1000).map(i => ("g", i.toLong, i / 1000.0)).toDF("grp", "id", "v")
    val est = Sketch.histQuantiles(
        Sketch.histSketch(df, "v", Seq("grp"), 256, 0.0, 1.0),
        Seq("grp"), Seq(25, 50, 75), 256, 0.0, 1.0)
      .orderBy(col("p")).collect()
    val bound = 0.5 / 256 + 1e-9
    val exactByP = Map(25L -> 0.249, 50L -> 0.499, 75L -> 0.749)
    est.foreach { r =>
      val (p, n, e) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(n == 1000L)
      assert(math.abs(e - exactByP(p)) <= bound,
        s"p$p estimate $e off exact ${exactByP(p)} beyond half-bucket $bound")
    }
    assert(est.map(_.getDouble(4)).sliding(2).forall(w => w(0) <= w(1)),
      "quantile estimates not monotone in p")
    // the gate itself: measured error column obeys the bound on the
    // driver corpus, per source and percentile
    val gate = graft.queries.LlmOps.quantileSketch(spark, sf001).collect()
    assert(gate.length >= 3)
    gate.foreach { r =>
      assert(r.getDouble(6) <= bound,
        s"gate abs_err ${r.getDouble(6)} exceeds half-bucket bound: $r")
    }
  }

  test("streaming histogram quantile == batch estimates (order-invariant sketch)") {
    // the streaming twin holds (source × bucket) integer counters as
    // its only state; arrival order cannot perturb integer counts, so
    // the final-stream estimates must equal the batch gate's estimate
    // columns exactly
    val stream = graft.streaming.Streaming
      .quantileSketchStream(spark, sf001, "sketch_stq_spec")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    val batch = graft.queries.LlmOps.quantileSketch(spark, sf001)
      .select(col("source"), col("p"), col("n_docs"), col("bucket"), col("est_q"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(stream.nonEmpty && stream == batch,
      s"stream drifted from batch: ${stream.take(3)} vs ${batch.take(3)}")
  }

  test("streaming CMS + anomaly moments: measured state rows obey the declared bounds") {
    // the bounded-state CLAIMS, measured: CMS state ≤ depth×width
    // occupied counters; anomaly-moment state ≤ one row per event type
    import org.apache.spark.sql.functions.col
    val cmsAgg = graft.sketch.Sketch.cmsSketch(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lang",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType))))
        .option("pathGlobFilter", "documents.parquet").parquet(sf001)
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.graft.DistinctShingles
            .distinct_shingles(col("text"), 3)).as("s")),
      "s", 3, 1024)
    val q1 = cmsAgg.writeStream.outputMode("complete")
      .format("memory").queryName("sketch_cms_state_probe").start()
    try q1.processAllAvailable() finally q1.stop()
    val cmsRows = q1.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).max
    assert(cmsRows <= 3L * 1024L,
      s"CMS state $cmsRows exceeds the depth×width bound ${3 * 1024}")
    val types = Tables.events(spark, sf001)
      .select(col("event_type")).distinct().count()
    // drive the moments aggregation alone (the flag pass is batch-side)
    val dec2 = org.apache.spark.sql.types.DecimalType(12, 2)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val agg = graft.streaming.Streaming.eventsStream(spark, sf001)
      .select(col("event_type"),
        (col("value").cast(dec2) * org.apache.spark.sql.functions.lit(100))
          .cast("long").as("v"))
      .groupBy(col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).cast(d38).as("n"),
        org.apache.spark.sql.functions.sum(col("v")).cast(d38).as("s"),
        org.apache.spark.sql.functions.sum(
          col("v").cast(d38) * col("v").cast(d38)).as("ss"))
    val q2 = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sketch_anom_state_probe").start()
    try q2.processAllAvailable() finally q2.stop()
    val momRows = q2.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).max
    assert(momRows <= types,
      s"moment state $momRows exceeds one row per event type ($types)")
  }

  test("streaming CMS heavy hitters == batch gate (order-invariant integer counters)") {
    // the stream's only state is the 3×1024 counter grid; integer adds
    // commute, so the final sketch — and every estimate derived from
    // it — must equal the batch gate bit-for-bit
    val stream = graft.streaming.Streaming
      .cmsHeavyStream(spark, sf001, "sketch_stcms_spec")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val batch = graft.queries.LlmOps.cmsHeavy(spark, sf001)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(stream.nonEmpty && stream == batch,
      s"stream drifted from batch: ${stream.take(3)} vs ${batch.take(3)}")
    // CountMin guarantee survives streaming: est >= exact on every row
    assert(stream.forall { case (_, exact, est, over) =>
      est >= exact && over == est - exact })
  }

  // ------------------------------------------------------------- KMV

  test("KmvAggregator keeps the k smallest distinct values, any order, any split") {
    val agg = KmvAggregator(4)
    val values = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 2L)
    // sequential reduce
    val seq = values.foldLeft(agg.zero)(agg.reduce)
    assert(seq.toSeq == Seq(1L, 2L, 3L, 5L))
    // every 2-way split merges to the same sketch
    for (cut <- values.indices) {
      val (a, b) = values.splitAt(cut)
      val m = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(m.toSeq == Seq(1L, 2L, 3L, 5L), s"split at $cut")
    }
    // fewer distinct than k: sketch IS the distinct set
    val small = Seq(5L, 5L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(small.toSeq == Seq(2L, 5L))
  }

  test("kmv_sketch is partition-layout-invariant and the estimate is measured-accurate") {
    val k = 64
    val n = 5000
    val df1 = spark.range(n).select(Sketch.hash60(col("id").cast("string")).as("h"))
    val df32 = spark.range(n).repartition(32)
      .select(Sketch.hash60(col("id").cast("string")).as("h"))
    val s1 = df1.agg(Sketch.kmv_sketch(col("h"), k)).as[Array[Long]].head()
    val s32 = df32.agg(Sketch.kmv_sketch(col("h"), k)).as[Array[Long]].head()
    assert(s1.toSeq == s32.toSeq, "sketch drifted under repartitioning")
    assert(s1.length == k && s1.toSeq == s1.sorted.toSeq)
    val est = df1.agg(Sketch.kmv_sketch(col("h"), k).as("s"))
      .select(Sketch.kmvEstimate(col("s"), k)).as[Double].head()
    // KMV standard error is ~1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.5, s"estimate $est for true $n")
  }

  // ------------------------------------------------------------- CMS

  test("CountMin estimates dominate true counts and are exact without collisions") {
    // 20 values, width 1024: collisions are possible but the MIN over 3
    // rows must never under-count — the CountMin guarantee is one-sided.
    val freq = (1 to 20).map(i => (s"v$i", i.toLong))
    val values = freq.flatMap { case (v, c) => Seq.fill(c.toInt)(v) }
      .toDF("s")
    val sketch = Sketch.cmsSketch(values, "s", depth = 3, width = 1024)
    assert(sketch.agg(sum(col("cnt"))).as[Long].head() == 3L * freq.map(_._2).sum)
    val cand = freq.toDF("s", "exact")
    val est = Sketch.cmsEstimate(sketch, cand, "s", depth = 3, width = 1024)
      .select(col("s"), col("exact"), col("est"))
      .as[(String, Long, Long)].collect()
    assert(est.length == 20)
    est.foreach { case (v, exact, e) =>
      assert(e >= exact, s"CMS under-counted $v: $e < $exact")
    }
    // with 20 distinct values in 1024 buckets, collisions are unlikely
    // enough that at least half the estimates are exact
    assert(est.count { case (_, exact, e) => e == exact } >= 10)
  }

  test("cmsSketch output is bounded by depth x width regardless of input size") {
    val big = spark.range(20000).select(col("id").cast("string").as("s"))
    val sketch = Sketch.cmsSketch(big, "s", depth = 3, width = 64)
    assert(sketch.count() <= 3L * 64)
  }

  test("HLL: estimate within the published envelope, partition-layout-invariant, known cardinalities") {
    import spark.implicits._
    // known cardinalities across the small-range (linear counting) and
    // raw-estimate regimes; duplicates must not move the estimate
    // (insert-idempotent max registers)
    val data = Seq(10, 200, 5000).flatMap { n =>
      (0 until n).map(i => (s"g$n", s"v$i")) ++
        (0 until n / 2).map(i => (s"g$n", s"v$i")) // duplicates
    }.toDF("g", "v")
    val out = Sketch.hllEstimate(data, Seq("g"), "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def est(g: String) = out(g)._3
    // sigma = 1.04/sqrt(256) = 6.5%; assert 3.5 sigma ~ 23%
    Seq(10, 200, 5000).foreach { n =>
      val e = est(s"g$n")
      assert(math.abs(e - n) <= math.max(3.0, 0.23 * n),
        s"HLL for n=$n estimated $e")
    }
    // partition-layout invariance: max per register is order-free
    val shuffled = Sketch.hllEstimate(data.repartition(13), Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(shuffled == out)
    // register table is bounded: harmonic_s of an EMPTY register set
    // would be 256 * 2^50; every group's S is below that and positive
    out.values.foreach { case (z, s, _) =>
      assert(s > 0 && s <= 256L * (1L << 50) && z >= 0 && z <= 256)
    }
    // the gate itself at corpus scale: measured error recorded per type
    val gate = graft.queries.LlmOps.hllDistinct(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    assert(gate.nonEmpty)
    gate.foreach { case (t, exact, e) =>
      assert(math.abs(e - exact) <= math.max(3.0, 0.23 * exact),
        s"type $t: est $e vs exact $exact outside envelope")
    }
  }

  test("bitmap bloom probe (BloomHitExpr) == set-bit-table probe, verdict for verdict") {
    import spark.implicits._
    // member set + probes: all members (must ALL hit — no false
    // negatives) plus non-members (hit only on full k-collision)
    val members = (1 to 200).map(i => s"member$i")
    val probes = members ++ (1 to 300).map(i => s"other$i")
    val (k, m) = (4, 8L * members.size)
    val bits = Sketch.bloomBits(members.toDF("v"), "v", k, m)
    val bc = spark.sparkContext.broadcast(Sketch.bloomBitmap(bits, m))
    val fast = probes.toDF("v")
      .select(col("v"), org.apache.spark.sql.graft.BloomHitExpr
        .bloom_hit(col("v"), bc, m, k).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val ref = Sketch.bloomProbe(probes.zipWithIndex.map { case (v, i) =>
        (i.toLong, v) }.toDF("doc_id", "v"), "doc_id", "v", bits, k, m)
      .join(probes.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("doc_id", "v"), "doc_id")
      .collect().map(r => r.getAs[String]("v") -> r.getAs[Boolean]("bloom_hit")).toMap
    assert(fast.keySet == ref.keySet)
    ref.foreach { case (v, hit) => assert(fast(v) == hit, s"probe '$v'") }
    members.foreach(v => assert(fast(v), s"false negative on member '$v'"))
  }

  test("BloomHitExpr generates compiling Java (codegen-only)") {
    import spark.implicits._
    val bits = Sketch.bloomBits(Seq("a", "b").toDF("v"), "v", 4, 16L)
    val bc = spark.sparkContext.broadcast(Sketch.bloomBitmap(bits, 16L))
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Seq("a", "zzz").toDF("v")
        .select(org.apache.spark.sql.graft.BloomHitExpr
          .bloom_hit(col("v"), bc, 16L, 4).as("h")).collect()
      assert(r.length == 2 && r(0).getBoolean(0))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("bloom broadcast hint is gated on bit-table size: big filters go unhinted") {
    import spark.implicits._
    def hasHint(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    val bits = Seq(1L, 2L, 3L).toDF("b")
    assert(hasHint(Sketch.bloomHint(bits, 1000L)),
      "small bit table must keep the broadcast hint")
    assert(!hasHint(Sketch.bloomHint(bits, Sketch.BloomBroadcastMaxBits + 1)),
      "past-threshold bit table must NOT be forced into a driver broadcast " +
        "(round-11 advice: the probe degrades to a position-keyed shuffle join)")
    // and the probe wires the member bound through: a claimed 10⁹-member
    // filter probes without a hint even when m alone would also gate it
    val probe = Seq((1L, "x")).toDF("doc_id", "v")
    val big = Sketch.bloomProbe(probe, "doc_id", "v", bits, 4, 8L * 2000000000L,
      expectedMembers = 2000000000L)
    assert(!hasHint(big))
    val small = Sketch.bloomProbe(probe, "doc_id", "v", bits, 4, 8L * 100L,
      expectedMembers = 100L)
    assert(hasHint(small))
  }

  test("sketch merge laws: Bloom = bit union, HLL = register max — shard-and-combine equals whole") {
    import spark.implicits._
    // the property that lets both sketches shard across a cluster (or
    // across DAYS of ingest): build per-shard, combine cheaply, get
    // exactly the whole-corpus sketch
    val a = (0 until 300).map(i => s"av$i").toDF("v")
    val b = (0 until 300).map(i => s"bv$i").toDF("v")
    val whole = a.unionByName(b)
    val (k, m) = (4, 8L * 600)
    // Bloom: bits(A ∪ B) == bits(A) ∪ bits(B)
    val merged = Sketch.bloomBits(a, "v", k, m)
      .unionByName(Sketch.bloomBits(b, "v", k, m)).distinct()
      .collect().map(_.getLong(0)).toSet
    val direct = Sketch.bloomBits(whole, "v", k, m)
      .collect().map(_.getLong(0)).toSet
    assert(merged == direct)
    // HLL: max-merging per-shard registers == whole-corpus registers,
    // hence identical estimate
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(Sketch.hllRegister(col("v")).as("r"))
      .agg(max(Sketch.hllRank(col("v"))).as("rank"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val (ra, rb) = (regs(a), regs(b))
    val mergedRegs = (ra.keySet ++ rb.keySet).map(r =>
      r -> math.max(ra.getOrElse(r, 0), rb.getOrElse(r, 0))).toMap
    assert(mergedRegs == regs(whole))
    val estWhole = Sketch.hllEstimate(whole.withColumn("g", lit("x")),
      Seq("g"), "v").collect().head.getDouble(3)
    assert(math.abs(estWhole - 600) <= 0.23 * 600)
    // CMS merges by counter ADDITION (and the histogram quantile
    // sketch is the same integer-counter shape): per-shard sketches
    // summed cell-wise == the whole-corpus sketch
    def cms(df: org.apache.spark.sql.DataFrame) =
      Sketch.cmsSketch(df, "v", depth = 3, width = 64).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (ca, cb) = (cms(a), cms(b))
    val mergedCms = (ca.keySet ++ cb.keySet).map(kk =>
      kk -> (ca.getOrElse(kk, 0L) + cb.getOrElse(kk, 0L))).toMap
    assert(mergedCms == cms(whole))
  }

  test("streaming HLL == batch HLL gate, register state bounded by m per type") {
    val name = s"sketch_hll_${System.nanoTime}"
    val stream = graft.streaming.Streaming.hllDistinctStream(spark, sf001, name)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val batch = graft.queries.LlmOps.hllDistinct(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(stream == batch, s"stream=${stream.size} batch=${batch.size}")
    // the streamed register table obeys the m-per-type bound
    val nTypes = stream.size
    assert(spark.table(name).count() <= nTypes.toLong * Sketch.HllM)
  }

  test("bloom dedup: no false negatives, planted re-crawls all tp, FPR inside the sizing envelope") {
    val rows = graft.queries.LlmOps.dedupBloom(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getString(4)))
    graft.util.IntermediateCaches.releaseAll(blocking = true)
    assert(rows.nonEmpty)
    // the Bloom law: a member is NEVER missed
    rows.foreach { case (id, _, bloom, exact, v) =>
      assert(!(exact && !bloom), s"false negative on doc $id")
      val want = if (bloom && exact) "tp" else if (bloom) "fp" else "tn"
      assert(v == want, s"doc $id verdict $v != $want")
    }
    // every planted re-crawl (id >= plantBase) is a true member
    val docs = Tables.documents(spark, sf001)
    val pb = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val planted = rows.filter(_._1 >= pb)
    assert(planted.nonEmpty && planted.forall(_._5 == "tp"))
    // measured FPR over the non-members: sizing gives fill ~0.39,
    // FPR ~ fill^4 ~ 2.3%; assert a generous envelope (binomial noise
    // over ~100 non-members at sf0.001-0.01 scale)
    val nonMembers = rows.filter(!_._4)
    val fpr = nonMembers.count(_._3).toDouble / nonMembers.length
    assert(fpr <= 0.15, s"FPR $fpr way outside the m=8n sizing envelope")
  }

  test("streaming bloom seen-set == batch bloom gate, state bounded by min(k*n, m)") {
    val name = s"sketch_bloom_${System.nanoTime}"
    val stream = graft.streaming.Streaming.bloomDedupStream(spark, sf001, name)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getString(4))).toSeq
    graft.util.IntermediateCaches.releaseAll(blocking = true)
    val batch = graft.queries.LlmOps.dedupBloom(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        r.getBoolean(3), r.getString(4))).toSeq
    graft.util.IntermediateCaches.releaseAll(blocking = true)
    assert(stream == batch, s"stream=${stream.size} batch=${batch.size}")
    // the streamed bit table (the state's at-rest form) obeys the bound
    val docs = Tables.documents(spark, sf001)
    val n = graft.queries.LlmOps.bloomHist(docs).count()
    val m = graft.queries.LlmOps.bloomM(n)
    val bitRows = spark.table(name).count()
    assert(bitRows <= math.min(graft.queries.LlmOps.BloomK * n, m),
      s"bit table $bitRows exceeds min(k*n, m)")
  }

  test("streaming KMV sketch == batch sketch (bounded state in the stream)") {
    // the sketch is a pure function of the SET of hashes, so micro-batch
    // arrival order cannot perturb it: stream output must equal the
    // batch aggregation bit-for-bit, including the estimate
    // h_k is null when a group has fewer than k distinct users (the
    // sf0.001 case — the estimate is then the exact sketch size)
    def read(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2), r.getDouble(3))
    val stream = graft.streaming.Streaming
      .kmvDistinctStream(spark, sf0001, s"sketch_kmv_${System.nanoTime}")
      .collect().map(read).toSeq
    val k = 64
    val batch = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(Sketch.kmv_sketch(
        Sketch.hash60(col("user_id").cast("string")), k).as("kmv"))
      .select(col("event_type"), size(col("kmv")).cast("long"),
        get(col("kmv"), lit(k - 1)), Sketch.kmvEstimate(col("kmv"), k))
      .orderBy(col("event_type"))
      .collect().map(read).toSeq
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  // ------------------------------------------- incremental exact dedup

  test("incrementalExact: history wins, batch-first wins, rest are dups") {
    val hist = Seq("alpha text", "beta text").toDF("text")
      .select(graft.text.fingerprint_md5(col("text")).as("fp"))
    val batch = Seq(
      (10L, "alpha text"),   // in history → dup_hist even though min id
      (11L, "gamma text"),   // new → kept
      (12L, "gamma text"),   // batch dup of 11 → dup_batch
      (13L, "Beta   TEXT"),  // normalizes into history → dup_hist
      (14L, "delta text")    // new → kept
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(batch, hist)
      .select(col("doc_id"), col("status")).as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "dup_hist", 11L -> "kept", 12L -> "dup_batch",
      13L -> "dup_hist", 14L -> "kept"))
  }

  test("incrementalExact kept set == full-corpus exact dedup restricted to the batch") {
    // appending the kept docs reproduces what offline dedup of
    // history+batch would have kept from the batch
    val docs = Tables.documents(spark, sf001)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val kept = Dedup.incrementalExact(batch,
        hist.select(graft.text.fingerprint_md5(col("text")).as("fp")))
      .filter(col("status") === "kept").select(col("doc_id"))
      .as[Long].collect().toSet
    val offline = Dedup.exactGroups(docs).select(col("keep_id")).as[Long]
      .collect().toSet
    // a batch doc survives offline dedup iff its fp's global keeper is
    // itself; with history ids ≠ batch ids the batch survivors are
    // exactly the incremental kept set MINUS those whose fp exists in
    // history under a HIGHER id (offline would keep the lower batch id)
    val histFps = hist.select(graft.text.fingerprint_md5(col("text")).as("fp"))
      .distinct().as[String].collect().toSet
    val batchFp = batch.select(col("doc_id"),
        graft.text.fingerprint_md5(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    kept.foreach { id =>
      assert(!histFps.contains(batchFp(id)), s"kept doc $id exists in history")
    }
    // and every kept doc IS its fp's first occurrence within the batch
    val firsts = batchFp.groupBy(_._2).map { case (fp, xs) => fp -> xs.keys.min }
    kept.foreach { id => assert(firsts(batchFp(id)) == id) }
    // sanity vs offline keepers: kept ⊆ offline keepers ∪ {batch docs
    // whose keeper is a history doc} — i.e. no kept doc duplicates
    // another kept doc
    assert(kept.map(batchFp).size == kept.size)
    assert(offline.nonEmpty)
  }

  // ------------------------------------------------ Naive Bayes

  test("nbTrain/nbScore: separable classes classify perfectly, scores quantized-exact") {
    val train = Seq(
      (1L, "spam", "buy cheap pills buy now cheap"),
      (2L, "spam", "cheap pills now buy"),
      (3L, "spam", "now now buy cheap"),
      (4L, "ham", "meeting notes project plan review"),
      (5L, "ham", "project review plan meeting"),
      (6L, "ham", "notes plan meeting project")
    ).toDF("doc_id", "cls", "text")
    val test = Seq(
      (100L, "cheap pills buy"),
      (101L, "project meeting notes")
    ).toDF("doc_id", "text")
    val (ll, priors) = Classify.nbTrain(train, "cls", "text")
    // model shape: one unseen row per class; priors are ln(1/2) quantized
    assert(ll.filter(col("t").isNull).count() == 2)
    val pq = priors.select(col("priorq")).as[Long].collect().toSet
    assert(pq == Set(math.round(math.log(0.5) * 1e9)))
    val got = Classify.nbScore(test, ll, priors, "doc_id", "text")
      .select(col("doc_id"), col("pred")).as[(Long, String)].collect().toMap
    assert(got == Map(100L -> "spam", 101L -> "ham"))
    // quantized scores are integers — identical under repartitioning
    val s1 = Classify.nbScore(test, ll, priors, "doc_id", "text")
      .select(col("doc_id"), col("scoreq")).as[(Long, Long)].collect().toSet
    val s2 = Classify.nbScore(test.repartition(7), ll.repartition(5), priors,
        "doc_id", "text")
      .select(col("doc_id"), col("scoreq")).as[(Long, Long)].collect().toSet
    assert(s1 == s2)
  }

  test("nbClassifyHoldout recovers a token-derived label with high accuracy") {
    // the corpus's lang COLUMN is assigned independently of the text (no
    // classifier can learn it — the t_nb_classify gate pins the math, not
    // accuracy), so learnability is asserted on a label that IS a
    // function of the tokens: the lang_id heuristic's output
    val docs = Tables.documents(spark, sf001)
      .withColumn("hlang", graft.text.lang_id(col("text")))
    val out = Classify.nbClassifyHoldout(spark, docs, "hlang")
      .select(col("actual"), col("pred")).as[(String, String)].collect()
    assert(out.nonEmpty)
    val acc = out.count { case (a, p) => a == p }.toDouble / out.length
    assert(acc >= 0.8, s"NB accuracy $acc on a token-derived label")
  }
}
