package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ↔ Column bridge. Spark 4 made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); this shim lives in an
  * `org.apache.spark.sql` subpackage purely to re-export them to graft —
  * the standard extension-library technique for Catalyst expression authors.
  */
object ColumnShim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
