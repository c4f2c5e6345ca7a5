package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the standard
  * extension-library shim (same approach as frameless/itachi): custom
  * Catalyst expressions need to enter the public Column algebra, and
  * Spark 4 gates that behind `org.apache.spark.sql.classic`.
  */
object SqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
