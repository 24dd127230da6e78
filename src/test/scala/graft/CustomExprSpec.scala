package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.SparkException

import graft.functions._

case class NestedAddr(city: String, zip: Int)
case class Person(name: String, age: Option[Int], addr: NestedAddr, tags: Map[String, Long])

class CustomExprSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("make_not_nullable flips schema nullability; make_nullable reverses") {
    val df = Seq(("a", 1)).toDF("s", "i")
    val out = df.select(
      make_not_nullable(col("s")).as("s_nn"),
      make_nullable(col("i")).as("i_n"))
    assert(!out.schema("s_nn").nullable)
    assert(out.schema("i_n").nullable)
    assert(out.collect().head.getString(0) == "a")
  }

  test("make_not_nullable throws on actual null at runtime") {
    val df = Seq(Some("x"), None).toDF("s")
    val ex = intercept[Exception] {
      df.select(make_not_nullable(col("s"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[IllegalStateException]))
  }

  test("unsafe_unary_udf applies with declared result type (codegen path)") {
    val rev = unsafe_unary_udf(
      v => if (v == null) null else v.asInstanceOf[String].reverse,
      StringType, StringType)
    val out = Seq("abc", "xy").toDF("s").select(rev(col("s")).as("r"))
    assert(out.schema("r").dataType == StringType)
    assert(out.as[String].collect().toSeq == Seq("cba", "yx"))
  }

  test("unsafe_unary_udf crossing types: string length as long") {
    val len = unsafe_unary_udf(
      v => if (v == null) null else v.asInstanceOf[String].length.toLong,
      StringType, LongType)
    val out = Seq("abc", "").toDF("s").select(len(col("s")).as("n"))
    assert(out.as[Long].collect().toSeq == Seq(3L, 0L))
  }

  test("RowDecoder decodes nested case class with Option and Map") {
    val dec = new org.apache.spark.sql.graft.RowDecoder[Person]
    val df = Seq(
      Person("ann", Some(31), NestedAddr("zrh", 8001), Map("a" -> 1L)),
      Person("bob", None, NestedAddr("ber", 10115), Map.empty)).toDF()
    val back = df.collect().map(dec.convert)
    assert(back.toSet == Set(
      Person("ann", Some(31), NestedAddr("zrh", 8001), Map("a" -> 1L)),
      Person("bob", None, NestedAddr("ber", 10115), Map.empty)))
  }

  test("show_string renders the table without printing") {
    val str = show_string(Seq((1, "a")).toDF("num", "str"))
    assert(str.contains("num") && str.contains("str") && str.contains("a"))
  }
}
