package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The codegen'd BandKeys expression (round-19 optimization) must be
  * BIT-IDENTICAL to the builtin `hash(slice(sig, b*rows+1, rows), b)`
  * chain it replaced in every LSH banding path — band keys decide the
  * candidate buckets, so a single divergent key silently changes
  * candidate sets (recall is then luck, not the pinned banding math). */
class BandKeysSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("BandKeys == hash(slice(sig), band) for every band and geometry") {
    val sigs = Seq(
      (1 to 64).map(_.toLong * 0x9e3779b97f4a7c15L),
      (1 to 64).map(_ => Long.MaxValue),
      (1 to 64).map(i => -i.toLong),
      Seq.fill(64)(0L))
    for ((bands, rows) <- Seq((32, 2), (16, 4), (8, 8))) {
      val df = sigs.toDF("sig")
      val r = df.select(
        org.apache.spark.sql.graft.BandKeys
          .band_keys(col("sig"), bands, rows).as("fast"),
        transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b)).as("ref"))
        .collect()
      r.foreach { row =>
        assert(row.getSeq[Int](0) == row.getSeq[Int](1), s"$bands x $rows")
      }
    }
  }

  test("BandKeys generates compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Seq((1 to 64).map(_.toLong)).toDF("sig")
        .select(org.apache.spark.sql.graft.BandKeys
          .band_keys(col("sig"), 32, 2).as("k")).collect()
      assert(r.length == 1 && r(0).getSeq[Int](0).length == 32)
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
