package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building a `Column` from a raw Catalyst `Expression`.
  *
  * Spark 4 moved Column onto ColumnNode and made the Expression<->Column
  * converters `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils),
  * so extension libraries that construct expressions carrying non-Expression
  * state (e.g. [[graft.functions.vecexprs.VecNearest]]'s capped centroid
  * matrix, which cannot round-trip through the SQL function registry) reach
  * them through a same-package bridge — the standard pattern for Spark
  * extension projects.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
