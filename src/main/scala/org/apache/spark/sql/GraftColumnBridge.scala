package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column ↔ Expression bridge (`classic.ExpressionUtils`)
  * private[sql]; custom native Expressions (graft.functions.*) need it to
  * surface as Columns. This is the standard extension-library pattern: a
  * minimal forwarder living in the org.apache.spark.sql package. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
