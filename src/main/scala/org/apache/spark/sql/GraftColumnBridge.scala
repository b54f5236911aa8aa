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

  /** Re-wrap a (materialized, e.g. localCheckpoint'ed) DataFrame as a
    * fresh LogicalRDD leaf WITHOUT inherited statistics.
    *
    * Why this must exist: `Dataset.localCheckpoint` propagates the child
    * plan's `Statistics` into the LogicalRDD it returns. In an ITERATIVE
    * algorithm that checkpoints every round (connected components, label
    * propagation), round N's size estimate is a PRODUCT over round N−1's
    * leaf estimates, so the inherited `sizeInBytes` BigInt roughly
    * squares per generation — after ~8 rounds the driver burns minutes
    * inside `SizeInBytesOnlyStatsPlanVisitor` doing Toom-Cook multiplies
    * on million-digit integers (measured: snap wall 0.6 s → 1.9 → 7.4 →
    * 43.5 on consecutive rounds at 10× bench scale). Dropping the origin
    * stats resets the leaf to `defaultSizeInBytes`, which bounds every
    * round's stats walk; the iteration tables are shuffle-joined either
    * way at scale, so no useful broadcast decision is lost. */
  def withFreshStats(df: Dataset[Row]): Dataset[Row] = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
