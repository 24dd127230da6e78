package graft

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.types.DataType
import org.apache.spark.sql.graft.{DatasetHelper, Nullability, UnsafeUdf}

/** Public facade of graft's custom column functions. The implementations
  * live under `org.apache.spark.sql.graft` because they use
  * `private[sql]` Spark internals (Column↔Expression bridging,
  * Dataset.showString). */
package object functions {

  /** Override the inferred nullability to non-nullable; the expression
    * throws at runtime if a null actually flows through. */
  def make_not_nullable(c: Column): Column = Nullability.makeNotNullable(c)

  /** Override the inferred nullability to nullable. */
  def make_nullable(c: Column): Column = Nullability.makeNullable(c)

  /** Unary UDF with an explicitly declared result DataType; `f` operates
    * on external Scala values. */
  def unsafe_unary_udf(f: Any => Any, srcType: DataType, tgtType: DataType): Column => Column =
    UnsafeUdf.unsafeUnaryUdf(f, srcType, tgtType)

  /** Render a Dataset as the `show()` table, as a String. */
  def show_string(ds: Dataset[_], numRows: Int = 20, truncate: Int = 20,
      vertical: Boolean = false): String =
    DatasetHelper.showString(ds, numRows, truncate, vertical)
}
