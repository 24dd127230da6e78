package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset

/** Renders a Dataset to the `show()` table string without printing —
  * exposes the package-private `showString`
  * (reference: sql/DatasetHelper.scala:25-27). */
object DatasetHelper {
  def showString(
      ds: Dataset[_],
      numRows: Int = 20,
      truncate: Int = 20,
      vertical: Boolean = false): String =
    ds.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .showString(numRows, truncate, vertical)
}
