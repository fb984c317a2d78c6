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

  /** Register graft's SQL functions on an ALREADY-BUILT session (sessions
    * built with spark.sql.extensions=graft.functions.GraftExtensions get
    * them automatically). */
  def registerFunctions(spark: SparkSession): Unit =
    graft.functions.GraftExtensions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
