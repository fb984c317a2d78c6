package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming parity — the reference's DEFAULT mode
  * (CTS_STREAMS=true, cmd/cts_exporter/main.go:27,122-149; the streaming
  * pagination loop is pkg/adapter/adapter.go:158-210).
  *
  * The deterministic harness is a file-source `readStream` over the events
  * parquet with `Trigger.AvailableNow` — process everything that exists,
  * checkpoint, stop — which is exactly the reference's "drain the current
  * window, then idle" poll cycle, with Spark's checkpointed offsets
  * replacing the hand-rolled delta tracking (adapter.go:266-271). Each
  * query runs a REAL StreamingQuery (state store, watermark, sink commit
  * log) and then returns the sink's content as a batch DataFrame for the
  * driver's oracle compare.
  *
  * Scale notes: streaming dedup keys the state store on event_id with a
  * watermark bound so state is evicted, not grown forever; window/session
  * aggregates shuffle once on (key, window); the foreachBatch sink writes
  * per-batch directories so redelivery overwrites instead of duplicating
  * (at-least-once delivery + idempotent write = the reference's
  * MERGE-idempotency contract, neo4j/client.go:10-21).
  */
object StreamingOps {

  /** events.parquet schema with ts as raw nanos (nanosAsLong), supplied
    * explicitly as streaming sources require. */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over the events table (ns→µs timestamp restore,
    * same as the batch loader Tables.events). */
  def readEventsStream(s: SparkSession, dir: String): DataFrame = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (!s.conf.getOption(k).contains("true")) s.conf.set(k, "true")
    // the file source wants a directory: stream the sf dir, glob-filtered
    // to the events table (the other tables never enter the file index)
    s.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Run `q` to completion under AvailableNow with its own checkpoint. */
  private def drain(df: DataFrame)(start: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val writer = df.writeStream
      .option("checkpointLocation", tmp("graft-ckpt-"))
      .trigger(Trigger.AvailableNow())
    start(writer).awaitTermination()
  }

  /** §2.5 streaming MERGE-dedup: two sources of the same feed (the
    * window-overlap redelivery of adapter.go:93-102) → watermark +
    * `dropDuplicatesWithinWatermark` (the key-only variant keyed on
    * event_id whose state IS evicted by the watermark — plain
    * `dropDuplicates("event_id")` ignores the watermark unless the
    * event-time column is a dedup key, so its state grows forever) →
    * foreachBatch idempotent parquet sink → batch re-read + aggregate for
    * the oracle. Redelivered duplicates carry the same event time, so they
    * always land within the watermark delay of the original. */
  def dedup(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft-dedup-")
    val feed = readEventsStream(s, dir).unionAll(readEventsStream(s, dir))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
    drain(feed) { w =>
      w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent: redelivered batch N lands in the same directory
        batch.write.mode("overwrite").parquet(s"$out/b$batchId")
      }.start()
    }
    s.read.option("recursiveFileLookup", "true").parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Tumbling event-time window aggregate (§2.7 streaming windows): 1-day
    * windows per event type, complete mode into a memory sink (the final
    * state equals the batch answer — no open-tail ambiguity). */
  def tumbling(s: SparkSession, dir: String): DataFrame = {
    val name = s"graft_tumbling_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val agg = readEventsStream(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    drain(agg)(_.outputMode("complete").format("memory").queryName(name).start())
    s.table(name)
      .select(col("w.start").as("day"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Sliding event-time windows (§2.7): 2-day windows advancing by 1 day —
    * every event lands in two overlapping windows (the Expand the tumbling
    * case doesn't exercise). */
  def sliding(s: SparkSession, dir: String): DataFrame = {
    val name = s"graft_sliding_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val agg = readEventsStream(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    drain(agg)(_.outputMode("complete").format("memory").queryName(name).start())
    s.table(name)
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Session windows (§2.7): per-user sessions closed by a 30-minute gap.
    * Emits (user_id, session_start, n_events) for sessions with ≥ 2
    * events — the stateful merge the reference can't express at all. */
  def session(s: SparkSession, dir: String): DataFrame = {
    val name = s"graft_session_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val agg = readEventsStream(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    drain(agg)(_.outputMode("complete").format("memory").queryName(name).start())
    s.table(name)
      .filter(col("n_events") >= 2)
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** §2.7 stream-static join: the unbounded event feed enriched against a
    * static broadcast dimension (users → market segment). The static side
    * is planned once and broadcast to every micro-batch — no state store
    * involved, the streaming analogue of the batch broadcast-dim join. */
  def staticJoin(s: SparkSession, dir: String): DataFrame = {
    val name = s"graft_staticjoin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val cust = graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = readEventsStream(s, dir)
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    drain(agg)(_.outputMode("complete").format("memory").queryName(name).start())
    s.table(name)
      .select(col("c_mktsegment"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** §2.7 stream-stream interval join: each event joined to the SAME
    * user's events in the following 30 minutes (two watermarked feeds;
    * a.id < b.id orients the pair). The watermark + time-interval bound is
    * what lets Spark evict join state — without it stream-stream state
    * grows forever. Append-mode pairs land in an idempotent foreachBatch
    * sink, then a batch aggregate per user feeds the oracle compare. */
  def streamJoin(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("graft-ssj-")
    val a = readEventsStream(s, dir)
      .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "1 day")
    val b = readEventsStream(s, dir)
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "1 day")
    val pairs = a.join(b,
      col("user_id") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 30 MINUTES") &&
        col("a_id") < col("b_id"))
    drain(pairs) { w =>
      w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/b$batchId")
      }.start()
    }
    s.read.option("recursiveFileLookup", "true").parquet(out)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** Custom per-key streaming state for [[stateful]]: order-independent
    * accumulators only (count / max / set-union), so the answer is
    * identical however the source splits micro-batches or shuffles rows
    * within a group. */
  case class UserState(n: Long, maxValue: Double, types: Set[String])

  /** §2.7 arbitrary stateful streaming: `flatMapGroupsWithState` keeps a
    * custom per-user state the built-in aggregates can't express as-is (a
    * distinct-type SET unioned across batches) and emits the running
    * totals on every trigger (Update mode). The final answer per user is
    * the update with the largest n — totals are monotone, so this is the
    * last state each key reached, independent of batch layout.
    *
    * Scale: state is shuffled once on user_id and lives in the state
    * store keyed per user — size O(|users| × |event-type vocabulary|),
    * not O(events). At 100 TB the same plan holds; a TTL/timeout would
    * bound keys for unbounded user populations. */
  def stateful(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val name = s"graft_stateful_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val updates = readEventsStream(s, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Double)], st: GroupState[UserState]) =>
          val prev = st.getOption.getOrElse(UserState(0L, Double.NegativeInfinity, Set.empty))
          val cur = rows.foldLeft(prev) { (acc, r) =>
            UserState(acc.n + 1, math.max(acc.maxValue, r._3), acc.types + r._2)
          }
          st.update(cur)
          Iterator((uid, cur.n, cur.maxValue, cur.types.size.toLong))
      }
      .toDF("user_id", "n_events", "max_value", "n_types")
    drain(updates)(_.outputMode("update").format("memory").queryName(name).start())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    s.table(name)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy(col("user_id"))
  }

  import graft.SparkEntry.Q

  def queries: Map[String, Q] = Map(
    "s_dedup" -> ((s, d) => dedup(s, d)),
    "s_tumbling" -> ((s, d) => tumbling(s, d)),
    "s_sliding" -> ((s, d) => sliding(s, d)),
    "s_session" -> ((s, d) => session(s, d)),
    "s_stateful" -> ((s, d) => stateful(s, d)),
    "s_static_join" -> ((s, d) => staticJoin(s, d)),
    "s_stream_join" -> ((s, d) => streamJoin(s, d))
  )

  /** Batch-SQL twins: the streaming answers must equal what DuckDB computes
    * over the at-rest table (exactly-once + event-time semantics). */
  def oracles: Map[String, String] = Map(
    "s_dedup" ->
      """SELECT event_type, count(*) AS n, sum(value) AS sum_value
        |FROM (SELECT DISTINCT ON (event_id) event_id, event_type, value FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "s_tumbling" ->
      """SELECT time_bucket(INTERVAL 1 DAY, ts) AS day, event_type,
        |       count(*) AS n, sum(value) AS sum_value
        |FROM events
        |GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,

    // every event contributes to the 1-day-aligned window containing it
    // AND the one starting a day earlier (2-day width, 1-day slide)
    "s_sliding" ->
      """SELECT win_start, event_type, count(*) AS n FROM (
        |  SELECT unnest([time_bucket(INTERVAL 1 DAY, ts),
        |                 time_bucket(INTERVAL 1 DAY, ts) - INTERVAL 1 DAY]) AS win_start,
        |         event_type
        |  FROM events)
        |GROUP BY win_start, event_type ORDER BY win_start, event_type""".stripMargin,

    "s_stateful" ->
      """SELECT user_id, count(*) AS n_events, max(value) AS max_value,
        |       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "s_static_join" ->
      """SELECT c_mktsegment, event_type, count(*) AS n, sum(value) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,

    "s_stream_join" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        | AND a.event_id < b.event_id
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "s_session" ->
      """WITH gaps AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |), sids AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM gaps
        |)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM sids GROUP BY user_id, sid HAVING count(*) >= 2
        |ORDER BY user_id, session_start""".stripMargin
  )
}
