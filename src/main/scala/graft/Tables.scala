package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout (TESTDATA.md).
  *
  * All reads go through here so scan-level concerns (schema, pushdown,
  * future bucketing / format switches) have a single seam. At 100 TB the
  * same call shape holds — only `dir` changes to an object-store URI and
  * the parquet footprint is split across many files; Spark's DataSource V2
  * parquet reader handles partition planning, filter pushdown and column
  * pruning identically.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is parquet `timestamp[ns]`, which Spark 4 refuses to read
    * natively (PARQUET_TYPE_ILLEGAL). Read it as a long (legacy flag) and
    * floor-divide to microsecond TimestampType — lossless here (testdata
    * carries no sub-microsecond parts) and matching DuckDB's truncating
    * TIMESTAMP_NS→TIMESTAMP cast in general.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Our own mains set this at session build (Verify/Bench/Smoke). The
    // guarded set below only covers driver-owned sessions (smoke-check of
    // SparkEntry.entry) that never ran our builder — it fires once, not on
    // every load, so no conf churn on the hot path.
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (!s.conf.getOption(k).contains("true")) s.conf.set(k, "true")
    // integral `div`, not `/` — a double round-trip loses sub-ms precision
    // on 2^60-scale nanosecond epochs
    apply(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
