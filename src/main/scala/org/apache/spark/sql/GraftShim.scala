package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for package-private Column↔Expression conversion in Spark 4's
  * classic API (`org.apache.spark.sql.classic.ExpressionUtils`). Lives in
  * the spark.sql package purely for access; the standard pattern for
  * Catalyst extensions built outside the Spark tree.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
