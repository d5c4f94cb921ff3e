package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge.
  *
  * Spark 4 made `classic.ExpressionUtils` `private[sql]`; custom native
  * expressions (e.g. [[graft.marc.TrimPunctuation]]) still need the
  * conversion, so this object lives under `org.apache.spark.sql` to
  * re-export it — the standard extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
