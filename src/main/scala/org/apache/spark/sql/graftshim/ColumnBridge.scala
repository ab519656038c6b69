package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 unified Column wraps a ColumnNode; the catalyst bridge
  * (`classic.ExpressionUtils`) is private[sql], so custom-Expression
  * libraries expose it through a shim in an org.apache.spark.sql
  * subpackage — the standard pattern for OSS Spark extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
