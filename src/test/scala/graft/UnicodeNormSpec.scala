package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.UnicodeNorm

/** Unicode NFC/NFD expression + the t_normalize gate invariants. All
  * non-ASCII test data is built from unicode escape sequences — the
  * test JVM's default charset is US-ASCII. */
class UnicodeNormSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val decomposed = "a\u0300o\u0308" // a+grave, o+diaeresis
  private val composed = "\u00e0\u00f6"     // the NFC forms

  test("nfc composes canonical sequences; stable on composed input") {
    val got = Seq(decomposed, composed, "plain ascii", "")
      .toDF("s")
      .select(col("s"), UnicodeNorm.nfc(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got(decomposed) == composed)
    assert(got(composed) == composed)
    assert(got("plain ascii") == "plain ascii")
    assert(got("") == "")
  }

  test("nfd decomposes; nfc(nfd(x)) == nfc(x)") {
    val got = Seq(composed).toDF("s")
      .select(UnicodeNorm.nfd(col("s")).as("d"),
        UnicodeNorm.nfc(UnicodeNorm.nfd(col("s"))).as("rt"))
      .collect().head
    assert(got.getString(0) == decomposed)
    assert(got.getString(1) == composed)
  }

  test("null propagates") {
    val got = Seq(Option.empty[String], Some(composed)).toDF("s")
      .select(UnicodeNorm.nfc(col("s")).as("n")).collect()
    assert(got.count(_.isNullAt(0)) == 1)
  }

  test("t_normalize gate invariants at sf0.001") {
    val rows = graft.queries.LlmOps.normalizeText(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    var anyChanged = false
    rows.foreach { r =>
      val (np, nc, nn, ch) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      // the zero-width strip only removes; NFC composition only shrinks
      assert(nc <= np, s"doc ${r.getLong(0)}: clean $nc > planted $np")
      assert(nn <= nc, s"doc ${r.getLong(0)}: nfc $nn > clean $nc")
      // on this plant set every NFC change is a composition, so the
      // changed flag and a length drop must agree
      assert((ch == 1) == (nn < nc), s"doc ${r.getLong(0)}: changed=$ch " +
        s"but clean $nc -> nfc $nn")
      anyChanged ||= ch == 1
    }
    assert(anyChanged, "no doc exercised the composition path")
  }
}
