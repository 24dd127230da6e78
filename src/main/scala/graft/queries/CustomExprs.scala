package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.Tables
import graft.functions._

/** Queries that exercise graft's custom Catalyst expressions inside a
  * real distributed plan, with a plain-SQL oracle proving the semantics. */
object CustomExprs {

  /** SetNullable + UnsafeUnaryUdf in one plan: nullability override is a
    * no-op on values (identity oracle), the unsafe UDF uppercases via a
    * raw Any=>Any function with an explicit StringType result. */
  def customExprs(s: SparkSession, dir: String): DataFrame = {
    val upper = unsafe_unary_udf(
      v => if (v == null) null else v.asInstanceOf[String].toUpperCase,
      StringType, StringType)
    Tables.customer(s, dir)
      .filter(col("c_custkey") % 19 === 0)
      .select(
        col("c_custkey"),
        make_not_nullable(col("c_name")).as("c_name"),
        upper(col("c_mktsegment")).as("seg_upper"),
        make_nullable(col("c_acctbal")).as("c_acctbal"))
  }

  val customExprsSql: String =
    """SELECT c_custkey, c_name, UPPER(c_mktsegment) AS seg_upper, c_acctbal
      |FROM customer WHERE c_custkey % 19 = 0""".stripMargin
}
