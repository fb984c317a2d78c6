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

  /** Normalize `ts` to microsecond TimestampType regardless of how the
    * events parquet physically encodes it. The driver has regenerated
    * testdata with a different encoding between rounds, so ingestion keys
    * off the LOADED dtype rather than assuming a shape:
    *  - LongType: raw epoch NANOS — either parquet `timestamp[ns]` read
    *    under `nanosAsLong` (Spark refuses native ns) or an int64 column
    *    written by a fixture. Integral `div 1000`, not `/`: a double
    *    round-trip loses sub-ms precision on 2^60-scale nanosecond epochs.
    *    Truncation matches DuckDB's TIMESTAMP_NS -> TIMESTAMP cast.
    *  - TimestampNTZType: parquet timestamp with isAdjustedToUTC=false
    *    (the current driver shape, `timestamp[us]`/`[ms]` from pandas)
    *    under Spark 4's default NTZ inference. Cast to TimestampType —
    *    with the UTC session timezone every main/test sets, the cast is
    *    wall-clock identity on the stored micros.
    *  - TimestampType: already instant-typed (Spark round-trips, e.g.
    *    ScaleUp stress output) — pass through.
    * Anything else is a data bug: fail loud at plan time.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType           => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType   => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType      => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected int64 nanos, timestamp, or timestamp_ntz")
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** Events with `ts` normalized to TimestampType whatever the parquet's
    * physical encoding (see [[normalizeEventTs]]). The nanosAsLong flag is
    * kept on so a `timestamp[ns]` file stays READABLE (Spark 4 otherwise
    * throws PARQUET_TYPE_ILLEGAL) — it has no effect on µs/ms encodings.
    */
  /** Read-path confs for the events scan, applied once per session (the
    * guarded sets cover driver-owned sessions that never ran our
    * builders; they fire once, so no conf churn on the hot path):
    *  - nanosAsLong keeps a `timestamp[ns]` file READABLE.
    *  - NTZ inference OFF makes an `isAdjustedToUTC=false` file (the
    *    current driver shape) load as TimestampType AT THE SCAN instead
    *    of TimestampNTZType + a cast above it. Under the UTC session
    *    every main/test sets, the values are identical either way, but
    *    the scan-level typing is what lets a `ts` predicate reach the
    *    parquet reader as a PushedFilter — with the cast in between,
    *    an incremental time-window scan would read ALL row groups at
    *    100 TB instead of pruning by footer stats.
    */
  private[graft] def eventsReadConfs(s: SparkSession): Unit = {
    val confs = Seq(
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false")
    confs.foreach { case (k, v) =>
      if (!s.conf.getOption(k).contains(v)) s.conf.set(k, v)
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    eventsReadConfs(s)
    normalizeEventTs(apply(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")

  /** Normalize `embedding` to canonical `array<float>` whatever the parquet
    * physically encodes. Same defense as [[normalizeEventTs]]: the r8 data
    * regeneration proved the driver can flip a physical encoding between
    * rounds, and pandas writes list<double> unless the writer pins float32
    * — which would fail every embedding operator at analysis (the native
    * kernels type-check ARRAY<FLOAT>). Keyed off the LOADED dtype:
    *  - array<float>: pass through (the current driver shape).
    *  - array<double>: cast element-wise to float (IEEE round-to-nearest,
    *    the same rounding DuckDB's CAST(x AS REAL) applies — the oracle
    *    SQL normalizes through an inline REAL-cast view, so both engines
    *    compute on identical float32 values under EITHER encoding; see
    *    LlmOps.EMB_SRC). float stays the canonical width on purpose: at
    *    100 TB the embedding column dominates shuffle bytes and float64
    *    carries no signal the similarity ops use.
    * Anything else is a data bug: fail loud at plan time.
    */
  def normalizeEmbedding(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _)  => df
      case ArrayType(DoubleType, _) =>
        df.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other => throw new IllegalStateException(
        s"embeddings.embedding has unsupported type $other — expected array<float> or array<double>")
    }
  }

  def embeddings(s: SparkSession, d: String): DataFrame =
    normalizeEmbedding(apply(s, d, "embeddings"))
}
