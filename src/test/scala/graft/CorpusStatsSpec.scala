package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text._

/** The fused TextStatsExpr / GopherSignalsExpr (round-20 optimization)
  * must equal the builtin combinator chains — the t_text_stats /
  * t_gopher_rules oracles replay those chains in DuckDB, and the
  * quality-classifier label derives from the same stop/token counts. */
class CorpusStatsSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val st = org.apache.spark.sql.graft.CorpusStats.text_stats _
  private val gs = org.apache.spark.sql.graft.CorpusStats.gopher_signals _

  private val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val fixtures = Seq(
    "the quick brown fox and a dog of it to be in is",
    "UPPER Case WITH The AND Of",
    "  spaces   and\ttabs\nand newlines  ",
    "numbers 123 456 mixed a1b2 punct!punct? quotes\"here\"",
    "the the the and and of of of repeated stopwords",
    "世界 unicode 漢字 tokens mixed ascii text",
    "😀 emoji 😀😀 counting",
    "no-stop-words-here-at-all xyz qqq",
    "",
    " ",
    "one",
    "that have with be that have with be",
    "a" * 2000 + " the end")

  test("TextStatsExpr == builtin combinator chain on fixtures") {
    val bad = fixtures.toDF("v").select(
        st(col("v")).as("f"),
        n_tokens(col("v")).cast("long").as("n_tokens"),
        n_bpeish(col("v")).cast("long").as("n_bpeish"),
        punct_count(col("v")).cast("long").as("punct_cnt"),
        stopword_count(col("v")).cast("long").as("stop_cnt"),
        avg_token_len(col("v")).as("avg_tok_len"))
      .filter(col("f.n_tokens") =!= col("n_tokens") ||
        col("f.n_bpeish") =!= col("n_bpeish") ||
        col("f.punct_cnt") =!= col("punct_cnt") ||
        col("f.stop_cnt") =!= col("stop_cnt") ||
        !(col("f.avg_tok_len") <=> col("avg_tok_len")))
      .count()
    assert(bad == 0L)
  }

  test("GopherSignalsExpr == builtin combinator chain on fixtures") {
    val t = tokens(col("v"))
    val n = size(t).cast("long")
    val bad = fixtures.toDF("v").select(
        gs(col("v")).as("f"),
        n.as("n_words"),
        (length(norm_text(col("v"))) - (n - 1)).cast("long").as("n_chars_w"),
        size(filter(t, w => w.rlike("[a-z]"))).cast("long").as("n_alpha"),
        size(array_intersect(array_distinct(t),
          array(GopherStops.map(lit): _*))).cast("long").as("n_stop"))
      .filter(col("f.n_words") =!= col("n_words") ||
        col("f.n_chars_w") =!= col("n_chars_w") ||
        col("f.n_alpha") =!= col("n_alpha") ||
        col("f.n_stop") =!= col("n_stop"))
      .count()
    assert(bad == 0L)
  }

  test("parity holds over the whole sf0.001 corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val t = tokens(col("text"))
    val n = size(t).cast("long")
    val bad = docs.select(
        st(col("text")).as("f"), gs(col("text")).as("g"),
        n_tokens(col("text")).cast("long").as("n_tokens"),
        n_bpeish(col("text")).cast("long").as("n_bpeish"),
        punct_count(col("text")).cast("long").as("punct_cnt"),
        stopword_count(col("text")).cast("long").as("stop_cnt"),
        avg_token_len(col("text")).as("avg_tok_len"),
        (length(norm_text(col("text"))) - (n - 1)).cast("long").as("n_chars_w"),
        size(filter(t, w => w.rlike("[a-z]"))).cast("long").as("n_alpha"),
        size(array_intersect(array_distinct(t),
          array(GopherStops.map(lit): _*))).cast("long").as("n_stop"))
      .filter(col("f.n_tokens") =!= col("n_tokens") ||
        col("f.n_bpeish") =!= col("n_bpeish") ||
        col("f.punct_cnt") =!= col("punct_cnt") ||
        col("f.stop_cnt") =!= col("stop_cnt") ||
        !(col("f.avg_tok_len") <=> col("avg_tok_len")) ||
        col("g.n_words") =!= col("n_tokens") ||
        col("g.n_chars_w") =!= col("n_chars_w") ||
        col("g.n_alpha") =!= col("n_alpha") ||
        col("g.n_stop") =!= col("n_stop"))
      .count()
    assert(bad == 0L)
  }

  test("CorpusStats expressions generate compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = fixtures.take(3).toDF("v")
        .select(st(col("v")).as("s"), gs(col("v")).as("g")).collect()
      assert(r.length == 3 && r.forall(x => !x.isNullAt(0) && !x.isNullAt(1)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
