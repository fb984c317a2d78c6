package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the shuffle-shaping techniques a 100 TB deployment
  * leans on (SURVEY §4). Each is a plain plan transformation — Catalyst
  * still owns physical planning.
  */
object Scale {

  /** Two-phase aggregation for SKEWED group keys: pre-aggregate on
    * (key, salt) so one hot key spreads over `buckets` reducers, then
    * merge the partials per key. The salt is DETERMINISTIC (hash of a
    * second column, not rand()) so results are reproducible and the
    * transform is oracle-checkable.
    *
    * `aggs` maps output column → (partial aggregate, final merge), e.g.
    * count ≙ (count(*), sum(partial)); sum ≙ (sum(x), sum(partial)).
    */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, buckets: Int,
                aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, p, _) => p.as(s"__p_$n") }: _*)
    partial
      .groupBy(col("__key"))
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, _, f) => f(col(s"__p_$n")).as(n) }: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Co-located join via bucketing: write both sides bucketed+sorted on
    * the join key so the join needs NO shuffle at read time (the classic
    * pre-shuffle trade: pay the exchange once at write, never again).
    * Returns the saved table names. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
