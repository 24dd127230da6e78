package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** StringToIntLookup (round-19 optimization, the classifier feature
  * directory) must be value-identical to element_at over the literal
  * map it replaced — including null for absent keys and null-through
  * for null inputs. */
class LookupSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val entries = Seq("alpha" -> 1, "beta" -> 2, "gamma" -> 3,
    "" -> 4, "ünïcode" -> 5)

  test("lookup == element_at(literal map) incl. misses and nulls") {
    val fmap = map(entries.flatMap { case (t, i) =>
      Seq(lit(t), lit(i)) }.toIndexedSeq: _*)
    val probes = Seq(Some("alpha"), Some("beta"), Some("missing"),
      Some(""), Some("ünïcode"), Some("ALPHA"), None)
    val r = probes.toDF("t").select(
      org.apache.spark.sql.graft.StringToIntLookup
        .lookup(col("t"), entries).as("fast"),
      element_at(fmap, col("t")).as("ref")).collect()
    r.zip(probes).foreach { case (row, p) =>
      assert(row.isNullAt(0) == row.isNullAt(1), s"null parity on $p")
      if (!row.isNullAt(0)) assert(row.getInt(0) == row.getInt(1), s"$p")
    }
  }

  test("lookup generates compiling Java (codegen-only)") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Seq("alpha", "zzz").toDF("t")
        .select(org.apache.spark.sql.graft.StringToIntLookup
          .lookup(col("t"), entries).as("f")).collect()
      assert(r(0).getInt(0) == 1 && r(1).isNullAt(0))
    } finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
