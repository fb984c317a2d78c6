package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY §2.7 extension layer) over the
  * TPC-H-ish testdata. Conventions:
  *  - every query ends in a deterministic ORDER BY with a unique tiebreak
  *    so the DuckDB hash-compare is order-stable;
  *  - money stays `double` end-to-end (FIXTURES.md);
  *  - dimension tables are broadcast; fact-fact joins shuffle on the join
  *    key and rely on AQE for skew/partition sizing at scale.
  */
object Relational {
  import SparkEntry.Q

  def queries: Map[String, Q] = Map(
    // §2.7 aggregations — TPC-H Q1-style full scan aggregate. Partial
    // aggregation (map-side combine) is free from Catalyst; at 100 TB this
    // is one scan + one 6-group shuffle.
    "q1_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.7 filter + scalar agg (TPC-H Q6 shape) — predicate pushed to the
    // parquet scan; zero shuffle.
    "q6_revenue_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"),
             count(lit(1)).as("n"))
    }),

    // §2.7 joins — fact⋈fact⋈broadcast-dim chain with group-by (TPC-H Q3
    // shape). customer/nation are broadcast; lineitem⋈orders shuffles on
    // the order key only once.
    "q3_revenue_topn" -> ((s, d) => {
      val c = broadcast(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"))
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q6_revenue_filter" ->
      """SELECT sum(l_extendedprice * l_discount) AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q3_revenue_topn" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin
  )
}
