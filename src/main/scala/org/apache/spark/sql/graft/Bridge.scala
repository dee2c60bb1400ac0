package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. Spark 4's Column wraps a
  * ColumnNode rather than an Expression; the classic converters are
  * private[sql], so this one-file subpackage exposes them to graft for
  * registering native codegen expressions (graft.functions.*) without a
  * SparkSessionExtensions round-trip. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
