package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sanity layer: every declared query runs at sf0.001 and returns a
  * non-degenerate result with its declared columns. Exact value
  * correctness is enforced by the DuckDB oracle gate
  * (scripts/verify_local.sh), which hash-compares at sf0.01. */
class QueryPackSpec extends AnyFunSuite {
  import SharedSpark._

  /** Queries allowed to skip the DuckDB oracle: custom-hash / probabilistic
    * operators not expressible in ANSI SQL — each is spec-verified against
    * its exact counterpart in LlmOpsSpec instead. */
  private val rowsOnlyAllowed =
    Set("d_simhash", "s_ann_lsh", "s_ann_ivf", "d_embed_cosine_lsh")

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyAllowed
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
