package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. `classic.ExpressionUtils` is `private[sql]` in Spark 4, so the
  * Column↔Expression conversion has to be re-exported from inside the
  * `org.apache.spark.sql` package — the standard technique for libraries
  * that inject native expressions without going through the SQL parser.
  * This file contains no logic of its own.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
