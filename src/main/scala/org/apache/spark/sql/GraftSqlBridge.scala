package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * `classic.ExpressionUtils` is `private[sql]`, so this one-liner lives in
  * the org.apache.spark.sql package — the same pattern public Spark
  * libraries use to expose custom expressions as Columns without forcing
  * SparkSessionExtensions configuration on every session. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The materialized RDD behind a `localCheckpoint(eager = true)`
    * DataFrame, so an iterative driver loop (LlmOps.bpeTrain) can free a
    * superseded checkpoint's blocks deterministically instead of waiting
    * on the ContextCleaner. None when the plan isn't a checkpoint scan. */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Register graft's SQL functions on an ALREADY-BUILT session (sessions
    * built with spark.sql.extensions=graft.functions.GraftExtensions get
    * them automatically). */
  def registerFunctions(spark: SparkSession): Unit =
    graft.functions.GraftExtensions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
