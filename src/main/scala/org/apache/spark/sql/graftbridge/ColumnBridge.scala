package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ↔ catalyst Expression conversion
  * `private[sql]` (columnNodeSupport.scala). Custom native expressions
  * (graft.functions.VectorFunctions) need it, so this bridge lives in
  * the `org.apache.spark.sql` namespace — the standard technique for
  * Catalyst extensions compiled against stock Spark jars.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
