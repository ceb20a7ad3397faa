package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's native Catalyst
  * expressions (graft.functions). Spark 4 made `Column` carry an opaque
  * ColumnNode and gated the Expression conversions `private[sql]`, so
  * libraries adding custom expressions host this two-line shim inside the
  * sql package — the standard extension pattern (the public alternative,
  * registering SQL-named functions through SparkSessionExtensions, is in
  * graft.functions.GraftFunctions). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Storage release for `localCheckpoint`ed Datasets. A local checkpoint
  * is backed by block-manager storage that `Dataset.unpersist` does NOT
  * touch (it only clears CacheManager entries), so iterative algorithms
  * that checkpoint per round (graft.ext.DedupResolve) would pile up one
  * dead generation per iteration until GC + ContextCleaner get around to
  * them. Only call on a frame that is provably DEAD: after release the
  * checkpoint cannot be recomputed (its lineage was truncated). */
object CheckpointBridge {
  def releaseLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
