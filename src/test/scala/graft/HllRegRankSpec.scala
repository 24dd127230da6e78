package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sketch.Sketch

/** The fused HllRegRankExpr (round-20 optimization) must equal the
  * hex-string chain (`conv(substring(md5,1,2),16,10)` register +
  * regexp leading-zero rank) the t_hll_distinct / st_hll_stream
  * oracles replay — including the all-zero-tail cap and both hex-case
  * paths. */
class HllRegRankSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val rr = org.apache.spark.sql.graft.HllRegRank.hll_reg_rank _

  test("fused register+rank == hex-chain register+rank on fuzzed values") {
    val rnd = new scala.util.Random(42)
    val vals = (0 until 5000).map(_ => rnd.nextLong().toString) ++
      Seq("", "a", "0", "user_1", "漢字", "😀", " ", "x" * 1000)
    val bad = vals.toDF("v")
      .select(
        rr(col("v")).getField("r").as("fr"),
        rr(col("v")).getField("rank").as("frank"),
        Sketch.hllRegister(col("v")).as("rr"),
        Sketch.hllRank(col("v")).as("rrank"))
      .filter(col("fr") =!= col("rr") || col("frank") =!= col("rrank"))
      .count()
    assert(bad == 0L)
  }

  test("rank caps at 50 and register spans 0..255 (sanity over ints)") {
    val vals = (0 until 100000).map(_.toString)
    val agg = vals.toDF("v")
      .select(rr(col("v")).as("x"))
      .agg(min(col("x.rank")), max(col("x.rank")),
        min(col("x.r")), max(col("x.r")), countDistinct(col("x.r")))
      .collect()(0)
    assert(agg.getInt(0) >= 1 && agg.getInt(1) <= 50)
    assert(agg.getInt(2) == 0 && agg.getInt(3) == 255 && agg.getLong(4) == 256L)
  }

  test("HllRegRank generates compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Seq("a", "b").toDF("v").select(rr(col("v")).as("x")).collect()
      assert(r.length == 2 && r.forall(!_.isNullAt(0)))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
