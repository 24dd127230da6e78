package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Watermarked append-mode semantic decontamination
  * (st_decontam_embed_wm): the emission boundary (a window whose end
  * equals the watermark IS emitted — the edge the DuckDB oracle
  * hardcodes), multi-trigger == single-batch equivalence on a
  * time-ordered split, and state EVICTION (emitted windows leave the
  * store; only the open horizon remains). */
class DecontamWmSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  /** Fixture: 131 identical unit vectors, ids 0..130 — ids < 100 are
    * the benchmark suite (and re-ingest as plants 131..230), 100..130
    * arrive natural. All sims are 1.0. Arrival clock = vec_id seconds;
    * max arrival 230, delay 30 s → watermark 200 — EXACTLY a window
    * end (windows align at epoch 10⁹+20+60k). */
  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    val rows = (0L to 130L).map(i => (i, Seq(1.0f, 0.0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // stream slices ordered by ARRIVAL time (naturals 100..130 first,
    // then bench ids in plant order) so no batch delivers late input
    val slices = Seq(
      rows.filter(r => r._1 >= 100L),          // arrivals 100..130
      rows.filter(r => r._1 <= 30L),           // plants  131..161
      rows.filter(r => r._1 >= 31L && r._1 <= 70L), // plants 162..201
      rows.filter(r => r._1 >= 71L && r._1 <= 99L)) // plants 202..230
    slices.zipWithIndex.foreach { case (rs, i) =>
      rs.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.parquet(s"$dir/stream/f$i")
      Thread.sleep(20) // distinct mod times => deterministic file order
    }
    dir
  }

  private def run(dir: String, opts: Map[String, String], name: String) = {
    val out = Streaming.decontamEmbedWmTransform(spark, s"$dir/stream/*/",
      staticDir = dir, glob = "*.parquet", extraOptions = opts)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    (spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))),
      q)
  }

  test("emission boundary: watermark == window end emits; open horizon held back") {
    val dir = writeFixture()
    val (rows, _) = run(dir, Map.empty, "wm_single")
    val ids = rows.map(_._2).toSet
    // closed windows cover arrivals 100..199; the EDGE window
    // [140, 200) has end == watermark (200) and must be emitted
    assert(ids == (100L to 199L).toSet, s"got ${ids.size} ids")
    assert((140L to 199L).forall(ids), "edge window (end == watermark) missing")
    // every row: 100 benchmark hits at sim 1.0
    assert(rows.forall(r => r._3 == 100L && r._4 == 1.0))
    // window starts are the aligned epoch buckets of the arrival time
    assert(rows.forall { case (ws, vid, _, _) =>
      ws == ((vid + 1000000000L) / 60L) * 60L })
  }

  test("multi-trigger replay == single batch; emitted windows EVICT from the store") {
    val dir = writeFixture()
    val (single, _) = run(dir, Map.empty, "wm_one")
    val (multi, q) = run(dir, Map("maxFilesPerTrigger" -> "1"), "wm_multi")
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      "expected one batch per slice")
    assert(multi.sortBy(_._2).toSeq == single.sortBy(_._2).toSeq)
    // eviction: 131 (window, vec_id) groups ever enter the store; the
    // final state holds ONLY the open horizon (arrivals 200..230 in
    // the unclosed [200, 260) window)
    val finalRows = q.recentProgress.last.stateOperators.map(_.numRowsTotal).sum
    assert(finalRows == 31L, s"open-horizon state rows: $finalRows")
    val maxRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).max
    assert(maxRows < 131L,
      s"state never dropped below the all-groups total: $maxRows")
  }
}
