package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column conversions. The classic converters are
  * `private[sql]`, so this one-file bridge lives under the
  * `org.apache.spark.sql` namespace — the standard pattern for Spark
  * extension libraries needing to lift custom Catalyst expressions into
  * the public Column API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
