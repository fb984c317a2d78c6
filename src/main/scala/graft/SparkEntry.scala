package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CtsParity
import graft.functions.CloudEventFns

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-runnable twin in `oracleSql`
  * (same column names, same ORDER BY) unless the operator is inherently
  * approximate / non-SQL-expressible, in which case the driver records a
  * rows-only check.
  */
object SparkEntry {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Scan → CloudEvent transform (§2.2) → MERGE-style dedup (§2.5) →
    * aggregate per (type, status) — the question the reference's graph
    * answers visually (SURVEY §7.1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val ce = CtsParity.toCloudEvents(
      CtsParity.eventsAsTraces(Tables.events(spark, "/root/testdata/sf0.001")))
    ce.dropDuplicates("id")
      .groupBy(col("type"), col("status"))
      .agg(count(lit(1)).as("n"), count_distinct(col("subject")).as("n_subjects"))
      .orderBy(col("type"), col("status"))
  }

  def queries: Map[String, Q] =
    Relational.queries ++ Parity.queries ++ Analytic.queries ++
      LlmOps.queries ++ graft.streaming.StreamingOps.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Parity.oracles ++ Analytic.oracles ++
      LlmOps.oracles ++ graft.streaming.StreamingOps.oracles
}
