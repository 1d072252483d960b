package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression conversions so graft
  * can expose native Catalyst expressions through the public Column API —
  * the standard extension-library pattern (Sedona, spark-nlp do the same).
  * Kept to exactly two forwarders; everything else in graft uses public API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
