package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql] classic.ExpressionUtils` so graft's native
  * Catalyst expressions can be wrapped as `Column`s WITHOUT the function
  * registry — a bare Column helper (e.g. `Dedup.shingles`) carries no
  * session to register against, and forcing callers onto a
  * GraftExtensions-enabled session just to build a column is a needless
  * trap. The well-trodden pattern for Spark expression libraries (one
  * object in the `org.apache.spark.sql` package, nothing else); only
  * public Spark jars are touched. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
