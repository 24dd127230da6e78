package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Url

/** The codegen'd CanonicalUrlExpr / UrlDomainExpr (round-20
  * optimization) must be BUG-FOR-BUG identical to the
  * builtin-composition canonicalizer (the ~110-entry PctDecode fold +
  * dangling-sentinel machinery + bounded dot-segment regex fold) — the
  * d_url_dedup / t_pipeline_crawl / t_domain_rank oracles replay that
  * exact chain in DuckDB. Fixtures drive every documented rule and the
  * adversarial %-run shapes the sentinel machinery exists for; a
  * deterministic fuzz sweep then hammers the decoder with random
  * %-runs, and the corpus test pins equality over every staged rawUrl
  * at sf0.001. */
class UrlCanonSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private def fast(c: org.apache.spark.sql.Column) = Url.canonicalize(c)
  private def ref(c: org.apache.spark.sql.Column) = Url.canonicalizeBuiltin(c)

  private val fixtures: Seq[String] = Seq(
    // scheme/host case, default + non-default ports
    "HTTPS://WWW.Example.COM:443/a/b?x=1",
    "http://Example.com:80/a",
    "http://example.com:8080/a",
    "https://example.com:80/a",                  // non-default for https: kept
    "ftp://Example.com:21/a",
    // unreserved decode both hex cases, reserved case-norm, other kept
    "https://e.com/%41%61%30%2D%2E%5F%7E/x",
    "https://e.com/a%2Fb%2fc/%3a%3B%5b%5D",
    "https://e.com/raw%C3%A9utf%c3%a9/x",
    "https://e.com/%25literal%20pct",
    // dangling escapes, depth 1..5, interleaved with real escapes
    "https://e.com/a%",
    "https://e.com/a%2",
    "https://e.com/a%2%41",
    "https://e.com/%2%2%44",
    "https://e.com/%%41",
    "https://e.com/%%%41",
    "https://e.com/%%%%41",
    "https://e.com/%2%2%2%44",
    "https://e.com/%4%41tail",
    "https://e.com/%e%74x",
    "https://e.com/%2%66case",                   // decoded 'f' must NOT re-form %2f
    // dot segments: ./, ../, trailing, rootward, deep chains, %2E forms
    "https://e.com/a/./b",
    "https://e.com/a/c/../b",
    "https://e.com/a/b/c/d/../../../../x",
    "https://e.com/../a",
    "https://e.com/a/..",
    "https://e.com/a/.",
    "https://e.com/%2E%2E/a/%2e/b",
    "https://e.com/" + "u/" * 10 + "../" * 10 + "end",  // saturation shape
    // query: utm drop (incl. escaped smuggle), sort, empties, fragments
    "https://e.com/p?utm_source=x&b=2&a=1",
    "https://e.com/p?%75tm_source=x&a=1",
    "https://e.com/p?b=%32&a=%41&utm_campaign=c",
    "https://e.com/p?&&a=1&&",
    "https://e.com/p?utm_only=1",
    "https://e.com/p?z=9&y=8#frag?notaquery=1",
    "https://e.com/p#?q=infrag",
    "https://e.com/p?",
    // structure edges
    "https://e.com",
    "notaurl",
    "://nohost/x",
    "https://",
    "",
    "https://UPPER.HOST.com:443",
    "https://www.ex.com:4431/x",                 // :4431 is NOT :443
    "http://ex.com:800/x",                       // :800 is NOT :80
    // unicode host/path/query
    "https://Exämple.com/päth?ä=ö&utm_x=1",
    "https://e.com/emoji😀/path?q=😀")

  test("CanonicalUrlExpr == builtin fold chain on adversarial fixtures") {
    val r = fixtures.toDF("u")
      .select(col("u"), fast(col("u")).as("fast"), ref(col("u")).as("ref"))
      .collect()
    r.foreach { row =>
      assert(row.getString(1) == row.getString(2),
        s"url '${row.getString(0)}': fast=${row.getString(1)} ref=${row.getString(2)}")
    }
  }

  test("UrlDomainExpr == builtin on fixtures") {
    val r = fixtures.toDF("u")
      .select(col("u"), Url.urlDomain(col("u")).as("fast"),
        Url.urlDomainBuiltin(col("u")).as("ref"))
      .collect()
    r.foreach { row =>
      assert(row.getString(1) == row.getString(2),
        s"url '${row.getString(0)}': fast=${row.getString(1)} ref=${row.getString(2)}")
    }
  }

  test("null url: canonicalize and domain stay null (builtin parity)") {
    val r = Seq[Option[String]](None).toDF("u")
      .select(fast(col("u")).as("f"), ref(col("u")).as("r"),
        Url.urlDomain(col("u")).as("df"), Url.urlDomainBuiltin(col("u")).as("dr"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("deterministic fuzz: random %-runs decode identically") {
    // alphabet biased toward escape machinery: hex digits both cases,
    // '%', path/query structure chars, a non-ASCII char
    val alphabet = "%%%24aAfF9/?&=._~u t#é"
    val rnd = new scala.util.Random(20250818L)
    val urls = (0 until 2000).map { _ =>
      val n = 1 + rnd.nextInt(24)
      val tail = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
      "https://ex.com/" + tail
    }
    val bad = urls.toDF("u")
      .select(col("u"), fast(col("u")).as("fast"), ref(col("u")).as("ref"))
      .filter(!(col("fast") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, bad.take(5).map(_.getString(0)).mkString(" | "))
  }

  test("parity holds over every staged rawUrl of the sf0.001 corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val u = graft.queries.LlmOps.rawUrl(col("doc_id"), col("source"))
    val bad = docs
      .select(fast(u).as("cf"), ref(u).as("cr"),
        Url.urlDomain(u).as("df"), Url.urlDomainBuiltin(u).as("dr"))
      .filter(!(col("cf") <=> col("cr")) || !(col("df") <=> col("dr")))
      .count()
    assert(bad == 0L)
  }

  test("Url expressions generate compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = fixtures.take(6).toDF("u")
        .select(fast(col("u")).as("c"), Url.urlDomain(col("u")).as("d"))
        .collect()
      assert(r.length == 6 && r.forall(x => !x.isNullAt(0) && !x.isNullAt(1)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
