package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text._

/** The codegen'd AllShingles expression behind shingles_from
  * (round-19 optimization) must be VALUE-IDENTICAL to the HOF
  * formulation it replaced — gramTop / bigram-CE oracles hash-pin the
  * gram strings. */
class AllShinglesSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val docs = Seq(
    "a b c d e",
    "single",
    "",
    "exactly two",
    "Ümlaut tökens ünicode here",
    (1 to 50).map(i => s"t$i").mkString(" "))

  test("shingles_from == the HOF reference for n in 1..4") {
    for (n <- 1 to 4) {
      val df = docs.toDF("text").select(tokens(col("text")).as("t"))
      val r = df.select(
        shingles_from(col("t"), n).as("fast"),
        shingles_from_hof(col("t"), n).as("ref")).collect()
      r.zip(docs).foreach { case (row, d) =>
        assert(row.getSeq[String](0) == row.getSeq[String](1), s"n=$n doc='$d'")
      }
    }
  }

  test("AllShingles generates compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = docs.toDF("text")
        .select(shingles_from(tokens(col("text")), 2).as("sh")).collect()
      assert(r.length == docs.length && r.forall(!_.isNullAt(0)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
