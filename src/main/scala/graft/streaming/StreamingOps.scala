package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * Scale design (every query below follows it):
  *  - NO complete-mode memory sinks: complete mode re-materializes the
  *    entire result on the driver every trigger — a driver OOM at 100×.
  *    Every query writes append/update output through an idempotent
  *    `foreachBatch` parquet sink (deterministic per-batch directory +
  *    overwrite, so at-least-once redelivery of a batch rewrites instead
  *    of duplicating — the reference's MERGE-idempotency contract,
  *    neo4j/client.go:10-21).
  *  - Windowed aggregates run in APPEND mode: a window is emitted exactly
  *    once, when the watermark passes its end ("finalized"), and its state
  *    is evicted. The finite harness unions a far-future FLUSH SENTINEL
  *    row into the feed so the watermark passes every real window before
  *    the AvailableNow drain stops (in production the feed is unbounded
  *    and the watermark advances on its own — the sentinel is harness
  *    scaffolding, not operator semantics). The sentinel's own window
  *    never closes, so it never appears in output.
  *  - Stateful streaming carries an event-time TTL
  *    (`GroupStateTimeout.EventTimeTimeout`): a key's state is dropped
  *    once the watermark passes its newest event + TTL, so the state
  *    store is bounded for unbounded key populations.
  */
object StreamingOps {

  /** events schema with `ts` already normalized to TimestampType — the
    * shape every downstream streaming query sees, and the shape the flush
    * sentinel is generated in. */
  private val eventsNormalizedSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming sources require an explicit schema, but the driver has
    * regenerated the events parquet with a different physical `ts`
    * encoding between rounds (int64-nanos, then timestamp[us]). Derive
    * the source schema from the batch footer at PLAN time — one footer
    * read, not per-batch — so the stream takes whatever is on disk;
    * `Tables.normalizeEventTs` then restores TimestampType the same way
    * the batch loader does. A not-yet-written table (consumer-first
    * receive→ingest loops) defaults to the normalized shape, which is
    * what producers in this codebase write.
    */
  private def eventsRawSchema(s: SparkSession, dir: String): StructType = {
    graft.Tables.eventsReadConfs(s)
    if (tableOnDisk(s, dir, "events"))
      s.read.parquet(s"$dir/events.parquet").schema
    else eventsNormalizedSchema
  }

  /** Whether `<dir>/<table>.parquet` holds COMMITTED data — a plain
    * file, or a part-directory with at least one non-hidden data file at
    * ANY depth (a PARTITIONED table keeps its files inside key=value
    * subdirectories, which a top-level-files-only check misclassified as
    * absent — the same silent-misplan the check exists to prevent, r15
    * ADVICE). The footer-derived schema fallbacks key on THIS, not on a
    * blanket catch — a corrupt footer or transient IO failure on real
    * data must propagate, not be silently read as "table absent, use the
    * default encoding" (r14 ADVICE: a double-encoded embeddings table
    * whose footer read transiently failed would have been planned as
    * float). A directory holding only `_temporary`/hidden entries is a
    * producer MID-WRITE — the consumer-first receive→ingest state
    * streamTable documents — and counts as not-yet-written, so the
    * consumer starts on the default schema instead of crashing on an
    * unreadable footer. */
  private def tableOnDisk(s: SparkSession, dir: String, table: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    def hasData(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".") &&
          (st.isFile || hasData(st.getPath))
      }
    fs.exists(path) && (fs.getFileStatus(path).isFile || hasData(path))
  }

  /** documents.parquet schema (TESTDATA.md) for the streamed-ingest rows. */
  private val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Flush sentinel: 2100-01-01T00:00:00Z — far past any testdata horizon. */
  private val SentinelTs = java.sql.Timestamp.from(
    java.time.Instant.ofEpochSecond(4102444800L))
  private val SentinelType = "__flush__"

  /** Stream one table out of an sf dir, taking EITHER physical layout:
    * the driver's testdata ships `<t>.parquet` as a single FILE (the
    * file source needs a directory basePath, so stream the sf dir
    * glob-filtered to that leaf name), while ScaleUp stress data writes
    * it as a Spark PART DIRECTORY (stream the directory itself — the
    * leaf-name glob would see zero files inside it and fail schema
    * inference). */
  private def streamTable(s: SparkSession, dir: String, table: String,
                          schema: StructType): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    // a not-yet-written table is NOT an error: fall through to the
    // glob-filtered dir stream, which starts empty and picks the file up
    // when a producer lands it (the receive → ingest loop starts the
    // consumer first)
    if (fs.exists(path) && fs.getFileStatus(path).isDirectory)
      s.readStream.schema(schema).parquet(path.toString)
    else
      s.readStream.schema(schema)
        .option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }

  /** File-source stream over the events table, `ts` normalized to
    * TimestampType by the SAME seam as the batch loader
    * (`Tables.normalizeEventTs`) over a footer-derived source schema —
    * batch and stream can never again disagree about the encoding. */
  def readEventsStream(s: SparkSession, dir: String): DataFrame =
    graft.Tables.normalizeEventTs(
      streamTable(s, dir, "events", eventsRawSchema(s, dir)))

  /** File-source stream over the documents table. */
  def readDocumentsStream(s: SparkSession, dir: String): DataFrame =
    streamTable(s, dir, "documents", documentsSchema)

  /** File-source stream over the embeddings table, the element width
    * normalized to float by the SAME seam as the batch loader
    * ([[graft.Tables.normalizeEmbedding]] over a footer-derived source
    * schema — one footer read at plan time, like the events stream), so
    * stream and batch can never disagree about the encoding. */
  def readEmbeddingsStream(s: SparkSession, dir: String): DataFrame =
    graft.Tables.normalizeEmbedding(
      streamTable(s, dir, "embeddings", embeddingsRawSchema(s, dir)))

  private def embeddingsRawSchema(s: SparkSession, dir: String): StructType =
    if (tableOnDisk(s, dir, "embeddings"))
      s.read.parquet(s"$dir/embeddings.parquet").schema
    else StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))

  /** One-row far-future feed unioned into windowed queries so the final
    * real windows finalize (see the scale-design note above). Both file
    * sources are listed into the FIRST micro-batch (no file limit is
    * configured), so real rows are never late relative to the sentinel. */
  private def sentinelStream(s: SparkSession): DataFrame = {
    val dir = tmp("graft-sentinel-")
    val row = Row(-1L, SentinelTs, -1L, SentinelType, 0.0, "{}")
    s.createDataFrame(java.util.Collections.singletonList(row), eventsNormalizedSchema)
      .write.mode("overwrite").parquet(dir)
    s.readStream.schema(eventsNormalizedSchema).parquet(dir)
  }

  private def eventsWithFlush(s: SparkSession, dir: String): DataFrame =
    readEventsStream(s, dir).unionAll(sentinelStream(s))

  /** Scratch dirs (sinks, checkpoints, sentinels, temp models) REGISTERED
    * for recursive deletion at JVM exit — a long-lived session invoking
    * the streaming rows repeatedly must not accumulate disk (r14 ADVICE).
    * Exit-time, not eager: a drained sink is lazily re-read by the
    * returned verdict frame, so its lifetime is the session's. */
  private val tmpDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tmpDirs.forEach { root =>
        // Files.walk returns a Stream holding an open directory handle —
        // close it per root, or the hook leaks one handle per tmp dir
        try {
          val walk = Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { try Files.deleteIfExists(p) catch { case _: Exception => () } })
          finally walk.close()
        } catch { case _: Exception => () }
      }
    }, "graft-tmp-cleanup"))
  }
  private[graft] def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    tmpDirs.add(p)
    p.toString
  }

  /** Bind the state-store provider choice to the session before a
    * stream starts (the conf is read per-query at `.start()`).
    * `GRAFT_STATE_STORE=rocksdb` swaps the default on-heap
    * HDFSBackedStateStoreProvider for RocksDB; `=hdfs` pins the default
    * explicitly; unset leaves Spark's default. Why it exists: at 100 TB
    * the stream-stream join rows (`s_stream_join`/`s_stream_outer`, the
    * heaviest streaming rows at every tier) hold join state on executor
    * heap, which OOMs when state outgrows memory — RocksDB keeps state
    * on local disk with bounded heap. Env-gated so the SURVEY §8.6 A/B
    * measures both providers on identical code, and the adoption
    * decision is recorded there rather than hard-coded. */
  /** Sessions whose provider conf THIS seam last set — the None branch
    * unsets only those, so a provider an operator pinned directly via
    * Spark conf / spark-submit (outside GRAFT_STATE_STORE) survives a
    * drain with the knob unset (r18 ADVICE: the unconditional unset
    * silently discarded externally-set providers). */
  // WEAK keys (r19 ADVICE): a strong set held stopped sessions (and their
  // conf graphs) for the life of the JVM in long-lived multi-session
  // processes. WeakHashMap is not thread-safe — synchronizedSet wraps it;
  // contention is nil (one add/remove per stream start).
  private val stateStoreSetBy =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private def stateStoreConf(s: SparkSession): Unit = {
    val pkg = "org.apache.spark.sql.execution.streaming.state"
    val changelog = "spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled"
    // system property first (settable in-process — the RocksDB
    // equivalence spec), env var for the CLI harnesses (Iso/Bench).
    // Session conf is STICKY across streams: every branch pins BOTH
    // knobs (provider + changelog flag) so an earlier rocksdb-changelog
    // run in the same session cannot leak into a later plain run and
    // contaminate the A/B this seam exists to serve (r17 ADVICE).
    sys.props.get("graft.stateStore")
      .orElse(sys.env.get("GRAFT_STATE_STORE")).map(_.toLowerCase) match {
      case Some("rocksdb") =>
        stateStoreSetBy.add(s)
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          s"$pkg.RocksDBStateStoreProvider")
        s.conf.set(changelog, "false")
      // changelog checkpointing: per-batch upload becomes the delta, not
      // a full snapshot — the standard knob for RocksDB's per-batch
      // maintenance cost (measured in the §8.6 A/B)
      case Some("rocksdb-changelog") =>
        stateStoreSetBy.add(s)
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          s"$pkg.RocksDBStateStoreProvider")
        s.conf.set(changelog, "true")
      case Some("hdfs") =>
        stateStoreSetBy.add(s)
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          s"$pkg.HDFSBackedStateStoreProvider")
        s.conf.set(changelog, "false")
      // a typo'd provider name must not silently run the default store
      // while the operator believes RocksDB is active
      case Some(other) => throw new IllegalArgumentException(
        s"GRAFT_STATE_STORE=$other: expected rocksdb|rocksdb-changelog|hdfs")
      case None =>
        // only undo what THIS seam set: an externally-pinned provider
        // (Spark conf / spark-submit) is not ours to discard
        if (stateStoreSetBy.remove(s)) {
          s.conf.unset("spark.sql.streaming.stateStore.providerClass")
          s.conf.unset(changelog)
        }
    }
  }

  /** Bytes on disk behind a streaming frame's file sources, read off the
    * plan's StreamingRelation leaves (honoring each source's
    * pathGlobFilter, so a glob-filtered sf-dir source counts only its
    * table's file, not its neighbors). A frame that unions the feed with
    * itself counts the bytes twice — correct, since the drain ingests
    * both copies. Returns -1 when no file source is found or any probe
    * fails: the caller then leaves the session parallelism alone. */
  private def feedBytes(df: DataFrame): Long = try {
    import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation
    // the ANALYZED plan: Spark 4.1's DataStreamReader leaves an
    // UnresolvedDataSource in the raw logical plan; the StreamingRelation
    // only exists after analysis. A single-path source carries its path
    // in options("path"), not in dataSource.paths.
    val rels = df.queryExecution.analyzed.collect {
      case r: StreamingRelation =>
        (r.dataSource.paths ++ r.dataSource.options.get("path"),
          r.dataSource.options.get("pathGlobFilter"))
    }
    if (rels.isEmpty) -1L
    else rels.map { case (paths, glob) =>
      paths.map { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        glob match {
          case Some(g) =>
            Option(fs.globStatus(new org.apache.hadoop.fs.Path(path, g)))
              .map(_.map(st =>
                if (st.isFile) st.getLen
                else fs.getContentSummary(st.getPath).getLength).sum)
              .getOrElse(0L)
          case None =>
            if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
        }
      }.sum
    }.sum
  } catch { case _: Exception => -1L }

  /** Feed-per-partition target for [[withDrainParallelism]] — each
    * shuffle/state partition of a drain should own at least this much
    * source data before another partition is worth its fixed costs.
    * Sizing: a partition's per-trigger fixed cost (state-store commit +
    * task dispatch) is ~10 ms; the most compute-dense stateful row here
    * (the interval stream-stream join at sf1: ~3.5 s of single-core work
    * per feed-MB — its pair OUTPUT grows superlinearly with feed density)
    * amortizes that in well under 100 KB, and even scan-speed stateless
    * drains (~100 MB/s/core) amortize it by ~1 MB. 4 MB gives an order
    * of magnitude of slack for cheaper operators while still collapsing
    * kilobyte feeds to one partition. Measured at TWO SFs (the r22 first
    * cut used 32 MB and regressed s_stream_join at sf1 10.7 -> 70 s by
    * single-partitioning a 2×20 MB feed whose join compute — not the
    * per-partition fixed cost — dominates there; 4 MB restores the
    * parallelism: see OPTIMIZATION_r22.md). Env/prop-tunable so a
    * deployment can re-derive it from its own operator cost profile. */
  private[graft] def DrainTargetBytesPerPartition: Long =
    sys.props.get("graft.drain.targetBytes")
      .orElse(sys.env.get("GRAFT_DRAIN_TARGET_BYTES"))
      .map(_.toLong).getOrElse(4L << 20)

  /** Data-size-derived shuffle/state-partition count for ONE drain
    * (guide §2.2 — size partitions by bytes, never by core count): a
    * stateful micro-batch pays fixed per-partition costs every trigger —
    * one state-store commit (delta file + fsync) per store per
    * partition, a shuffle-block matrix, one sink file per non-empty
    * partition — so partitions beyond what the DATA needs are pure
    * overhead (the stream-stream joins run 4 stores × partitions ×
    * batches commits: at local[32] that is 100s of kilobyte files for a
    * 2 MB feed). Derived = ceil(feed bytes /
    * [[DrainTargetBytesPerPartition]]), clamped to
    * [1, session shuffle.partitions]. NOT local-tuned: the cap is the
    * session's own configured parallelism, so at production scale
    * (feed ≫ partitions × target) the clamp returns the session value
    * unchanged and this helper is the identity — it only ever SHRINKS
    * the partition count when the feed is provably too small to fill
    * it, which is precisely the regime where per-partition fixed costs
    * dominate. */
  private[graft] def drainPartitions(sessionPartitions: Int, bytes: Long): Int = {
    val derived = ((bytes + DrainTargetBytesPerPartition - 1) /
      DrainTargetBytesPerPartition).toInt
    math.max(1, math.min(sessionPartitions, derived))
  }

  /** Run one drain (`body` must contain the `.start().awaitTermination()`)
    * with `spark.sql.shuffle.partitions` set to [[drainPartitions]] of the
    * frame's [[feedBytes]], restoring the session value afterwards — the
    * streaming planner snapshots the conf at `.start()`, so the override
    * scopes to exactly this query; the batch tail every streaming row
    * runs over its drained sink still plans at session parallelism. */
  private[graft] def withDrainParallelism[T](df: DataFrame)(body: => T): T = {
    val s = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    // kill switch (system property for in-process A/Bs, env for the CLI
    // harnesses): GRAFT_DRAIN_ADAPTIVE=0 drains at the raw session
    // parallelism — the pre-r22 behavior — so the derived-count win stays
    // re-measurable on one binary instead of a recompile-and-swap A/B
    val adaptiveOn = sys.props.get("graft.drain.adaptive")
      .orElse(sys.env.get("GRAFT_DRAIN_ADAPTIVE")).forall(_ != "0")
    val bytes = if (adaptiveOn) feedBytes(df) else -1L
    if (bytes < 0) body
    else {
      val session = try s.conf.get(key).toInt
        catch { case _: Exception => s.sparkContext.defaultParallelism }
      val old = s.conf.getOption(key)
      s.conf.set(key, drainPartitions(session, bytes).toString)
      try body
      finally old match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
  }

  /** Drain `df` to completion under AvailableNow into an idempotent
    * per-batch parquet sink (deterministic `b<batchId>` directory +
    * overwrite: a redelivered batch rewrites its own directory). Returns
    * the sink root for batch re-read. */
  private[graft] def drainToParquet(df: DataFrame, mode: String): String = {
    val out = tmp("graft-sink-")
    stateStoreConf(df.sparkSession)
    withDrainParallelism(df) {
      df.writeStream
        .option("checkpointLocation", tmp("graft-ckpt-"))
        .trigger(Trigger.AvailableNow())
        .outputMode(mode)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.write.mode("overwrite").parquet(s"$out/b$batchId")
        }
        .start().awaitTermination()
    }
    out
  }

  private def readSink(s: SparkSession, out: String): DataFrame =
    s.read.option("recursiveFileLookup", "true").parquet(out)

  /** Numbered state directories `<prefix><id>` under `dir`, through the
    * Hadoop FileSystem API so maintained-index / versioned-state roots
    * work on ANY scheme (hdfs://, s3a://, file:) — `java.io.File
    * .listFiles` returns null on a non-local path, which would silently
    * disable the index side of every maintained-index op in the 100 TB
    * deployment its docstring describes (r15 verdict task 4). Strict
    * `<prefix><digits>` match, id bounded well under Long range: a
    * foreign directory (`b`, `b<overflow>`, `_tmp`) is ignored, not a
    * crash. A missing root (nothing written yet) is an empty listing. */
  private[graft] def numberedDirs(s: SparkSession, dir: String,
                                  prefix: String): Seq[(Long, String)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory &&
        // quote the prefix: current callers pass 'b'/'v', but a prefix
        // carrying regex metacharacters must match literally, not as a
        // pattern (r16 ADVICE)
        st.getPath.getName.matches(
          java.util.regex.Pattern.quote(prefix) + "\\d{1,17}"))
      .map(st => (st.getPath.getName.drop(prefix.length).toLong,
        st.getPath.toString))
  }

  /** `<dir>/<name>` iff it exists as a directory — the optional `seed`
    * index root of the maintained-index ops, same FS-portability rule as
    * [[numberedDirs]]. */
  private[graft] def namedDir(s: SparkSession, dir: String,
                              name: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path) && fs.getFileStatus(path).isDirectory)
      Some(path.toString)
    else None
  }

  /** Read a drained sink under the transform's OWN analyzed schema —
    * the ONE zero-batch rule shared by every drain variant below: the
    * schema is derived once by binding `f` to an empty batch (pure
    * analysis, nothing executes), so a zero-batch drain (empty source
    * dir) yields the empty frame the batch rows return, where schema
    * INFERENCE over a file-less sink would throw (r15 ADVICE applied
    * uniformly). */
  private def readDrained(stream: DataFrame, f: DataFrame => DataFrame,
                          dir: String): DataFrame = {
    val s = stream.sparkSession
    val schema = f(s.createDataFrame(
      java.util.Collections.emptyList[Row](), stream.schema)).schema
    s.read.schema(schema).option("recursiveFileLookup", "true").parquet(dir)
  }

  /** [[drainToParquet]] with a BATCH transformation applied inside
    * foreachBatch — for admission stages whose per-document result needs
    * a batch-local aggregate the append-mode streaming planner rejects
    * (langid scoring groups a document's exploded grams). Correct
    * because the transform is PER-DOCUMENT and the file source delivers
    * each document row in exactly one micro-batch under AvailableNow:
    * batch composition cannot change any document's answer, so the
    * drained union equals the one-shot batch result (proven by the
    * shared oracle). Same idempotent per-batch directory + overwrite
    * discipline as drainToParquet. Returns the drained sink via
    * [[readDrained]]. */
  private def drainMapped(stream: DataFrame, f: DataFrame => DataFrame): DataFrame = {
    val out = tmp("graft-sink-")
    stateStoreConf(stream.sparkSession)
    withDrainParallelism(stream) {
      stream.writeStream
        .option("checkpointLocation", tmp("graft-ckpt-"))
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          f(batch).write.mode("overwrite").parquet(s"$out/b$batchId")
        }
        .start().awaitTermination()
    }
    readDrained(stream, f, out)
  }

  /** One micro-batch of the streaming graph materialization
    * ([[drainUpsert]]): the arriving rows take a batch-identical fan-out
    * (`rows` — the SAME CtsParity.nodes/edges spelling as the batch K3
    * queries), and only rows whose identity key is NOT yet in the
    * state-so-far are appended as this batch's delta — Cypher MERGE
    * semantics per micro-batch, matching the reference's continuous sink
    * consumer (cmd/neo4j_sink/main.go:80-89 drains the event channel into
    * one WriteEventGraph MERGE transaction per event,
    * pkg/neo4j/client.go:49-84).
    *
    * Idempotence under at-least-once redelivery is the admitBatch
    * discipline: deterministic `b<batchId>` delta dirs with overwrite,
    * state-so-far = strictly-smaller batch ids only — a replayed batch
    * recomputes its original delta byte-for-byte. Deltas are DISJOINT on
    * the identity key by construction, so the materialized table is the
    * plain union of delta dirs, no terminal distinct.
    *
    * Scale: the state is append-only DELTAS, never a rewrite — the graph
    * table only grows (the ACTION node set is event-sized), so the CDC
    * rows' rewrite-state-per-batch spelling would be quadratic in stream
    * length here. Per-batch work = the batch's own fan-out + one anti-join
    * probe of the state-so-far; at 100 TB the state is a bucketed-by-key
    * table and the anti-join shuffles only the arriving batch. Non-key
    * columns are functionally determined by the key in this graph (dim
    * nodes carry identity-only NULL props; ACTION props derive from the
    * unique event id), so first-writer-wins ≡ the batch distinct — proven
    * by sharing the batch rows' oracles. */
  private[graft] def graphUpsertBatch(batch: DataFrame, batchId: Long,
                                      stateDir: String,
                                      rows: DataFrame => DataFrame,
                                      keys: Seq[String]): Unit = {
    val s = batch.sparkSession
    val b = rows(batch)
    val prior = numberedDirs(s, stateDir, "b").filter(_._1 < batchId).map(_._2)
    val fresh =
      if (prior.isEmpty) b
      // prior deltas read under the batch fan-out's OWN analyzed schema
      // (the readDrained rule): an all-duplicate or empty micro-batch
      // legitimately writes a ZERO-ROW delta dir, and schema inference
      // over schema-less parquet dirs would abort the stream (r16 ADVICE)
      else b.join(s.read.schema(b.schema).parquet(prior: _*)
        .select(keys.map(col): _*), keys, "left_anti")
    fresh.write.mode("overwrite").parquet(s"$stateDir/b$batchId")
  }

  /** Drain `stream` through [[graphUpsertBatch]] and return the
    * materialized (union-of-deltas) table via [[readDrained]]. */
  private def drainUpsert(stream: DataFrame, rows: DataFrame => DataFrame,
                          keys: Seq[String]): DataFrame = {
    val stateDir = tmp("graft-graph-")
    stateStoreConf(stream.sparkSession)
    withDrainParallelism(stream) {
      stream.writeStream
        .option("checkpointLocation", tmp("graft-ckpt-"))
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graphUpsertBatch(batch, batchId, stateDir, rows, keys)
        }
        .start().awaitTermination()
    }
    readDrained(stream, rows, stateDir)
  }

  /** The events→CloudEvent projection bound to one micro-batch — the
    * SAME spelling as the batch K3 rows (Parity.ce), so the streaming
    * graph tables cannot drift from the batch ones. */
  private def ceOf(batch: DataFrame): DataFrame =
    graft.operators.CtsParity.toCloudEvents(
      graft.operators.CtsParity.eventsAsTraces(batch))

  /** §2.5 streaming MERGE-dedup: two sources of the same feed (the
    * window-overlap redelivery of adapter.go:93-102) → watermark +
    * `dropDuplicatesWithinWatermark` (the key-only variant keyed on
    * event_id whose state IS evicted by the watermark — plain
    * `dropDuplicates("event_id")` ignores the watermark unless the
    * event-time column is a dedup key, so its state grows forever) →
    * foreachBatch idempotent parquet sink → batch re-read + aggregate for
    * the oracle.
    *
    * Collapse condition: a duplicate is dropped iff it ARRIVES before the
    * watermark evicts the original's state — the API dedups by arrival
    * relative to state eviction, not by event time. That holds here
    * because both feed copies land in the same micro-batches; a genuinely
    * delayed redelivery arriving after eviction would be re-emitted (and
    * the downstream MERGE sink would absorb it — §2.5). */
  def dedup(s: SparkSession, dir: String): DataFrame = {
    val feed = readEventsStream(s, dir).unionAll(readEventsStream(s, dir))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
    val out = drainToParquet(feed, "append")
    readSink(s, out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Streaming document-level dedup — the LLM ingest-pipeline shape
    * (SURVEY north_star): a streamed documents feed redelivered
    * at-least-once, deduplicated on the sha256 CONTENT fingerprint (not
    * the id — a re-crawl gets a new id, same bytes) under a watermark so
    * fingerprint state is evicted, not grown forever. Event time is a
    * deterministic ingest-time stand-in derived from doc_id (the testdata
    * carries no document timestamp). Output is the surviving FINGERPRINT
    * set: when distinct documents share content (the corpus has such
    * pairs at sf0.1), WHICH doc survives depends on arrival order inside
    * the micro-batch — the fingerprint is the deterministic identity;
    * canonical-id selection is the batch l_exact_dedup row's job. */
  def docDedup(s: SparkSession, dir: String): DataFrame = {
    // anchor the synthetic ingest time well past the epoch: the initial
    // watermark is 0 (epoch), and a row whose event time coincides with
    // the watermark is already expired — doc_id 0 would be dropped
    val feed = readDocumentsStream(s, dir).unionAll(readDocumentsStream(s, dir))
      .withColumn("ts", expr("timestamp_micros(1700000000000000 + doc_id)"))
      .withColumn("fp", sha2(lower(trim(col("text"))), 256))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("fp"))
    val out = drainToParquet(feed, "append")
    readSink(s, out).select(col("fp")).orderBy(col("fp"))
  }

  /** Tumbling event-time window aggregate (§2.7 streaming windows): 1-day
    * windows per event type, append-mode — each window emitted once when
    * the watermark finalizes it, state evicted. */
  def tumbling(s: SparkSession, dir: String): DataFrame = {
    val agg = eventsWithFlush(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val out = drainToParquet(agg, "append")
    readSink(s, out)
      .filter(col("event_type") =!= SentinelType)
      .select(col("w.start").as("day"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Sliding event-time windows (§2.7): 2-day windows advancing by 1 day —
    * every event lands in two overlapping windows (the Expand the tumbling
    * case doesn't exercise). Append-mode finalization as in [[tumbling]]. */
  def sliding(s: SparkSession, dir: String): DataFrame = {
    val agg = eventsWithFlush(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val out = drainToParquet(agg, "append")
    readSink(s, out)
      .filter(col("event_type") =!= SentinelType)
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Session windows (§2.7): per-user sessions closed by a 30-minute gap.
    * Emits (user_id, session_start, n_events) for sessions with ≥ 2
    * events — the stateful merge the reference can't express at all. A
    * session finalizes when the watermark passes its end (no event can
    * extend it anymore); the ≥2 filter is applied on the finalized
    * output. */
  def session(s: SparkSession, dir: String): DataFrame = {
    val agg = eventsWithFlush(s, dir)
      .withWatermark("ts", "1 day")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val out = drainToParquet(agg, "append")
    readSink(s, out)
      .filter(col("user_id") >= 0 && col("n_events") >= 2)
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** §2.7 stream-static join: the unbounded event feed enriched against a
    * static broadcast dimension (users → market segment). The static side
    * is planned once and broadcast to every micro-batch — no state store
    * involved, the streaming analogue of the batch broadcast-dim join.
    * The aggregate runs BATCH-side over the sink (an unbounded global
    * group-by can't finalize in append mode; the streaming stage is the
    * enrichment, the rollup is a query over delivered output). */
  def staticJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = readEventsStream(s, dir)
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .select(col("c_mktsegment"), col("event_type"), col("value"))
    val out = drainToParquet(enriched, "append")
    readSink(s, out)
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** §2.7 stream-stream interval join: each event joined to the SAME
    * user's events STRICTLY after it within 30 minutes (two watermarked
    * feeds; time orients the pair). The watermark + time-interval bound
    * is what lets Spark evict join state — and the join condition must be
    * PURELY equi + time-interval conjuncts: StreamingJoinHelper aborts
    * state-watermark extraction wholesale when any conjunct mixes
    * non-temporal attributes from both sides (an `a_id < b_id` orientation
    * clause silently disables state eviction → unbounded join state — a
    * predicate-pushdown round trip makes a post-join filter equivalent, so
    * the SEMANTICS had to avoid the cross-side id clause, not just its
    * placement). Append-mode pairs land in the idempotent foreachBatch
    * sink, then a batch aggregate per user feeds the oracle compare. */
  def streamJoin(s: SparkSession, dir: String): DataFrame = {
    val a = readEventsStream(s, dir)
      .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "1 day")
    val b = readEventsStream(s, dir)
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "1 day")
    val pairs = a.join(b,
      col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 30 MINUTES"))
    val out = drainToParquet(pairs, "append")
    readSink(s, out)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** Custom per-key streaming state for [[stateful]]: order-independent
    * accumulators only (count / max / set-union), so the answer is
    * identical however the source splits micro-batches or shuffles rows
    * within a group. */
  case class UserState(n: Long, maxValue: Double, types: Set[String])

  /** State TTL for [[stateful]]: a key's state dies when the watermark
    * passes its newest event by this much. */
  private val StateTtlMs = 24L * 3600 * 1000

  /** §2.7 arbitrary stateful streaming: `flatMapGroupsWithState` keeps a
    * custom per-user state the built-in aggregates can't express as-is (a
    * distinct-type SET unioned across batches) and emits the running
    * totals on every trigger (Update mode). The final answer per user is
    * the update with the largest n — totals are monotone, so this is the
    * last state each key reached, independent of batch layout.
    *
    * Scale: state is shuffled once on user_id and lives in the state
    * store keyed per user — size O(|users| × |event-type vocabulary|),
    * not O(events) — and is BOUNDED by an event-time TTL
    * (`EventTimeTimeout`): once the watermark passes a user's newest
    * event + 1 day, the timeout fires and the state is removed. The
    * sentinel feed drives the watermark far enough that every real key's
    * timeout actually fires inside the harness run — the eviction path is
    * exercised, not just declared. */
  def stateful(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val feed = eventsWithFlush(s, dir)
      // width-adaptive at the typed boundary: the encoder below pins
      // (Long, Double) and an int32/float32 regeneration of the events
      // file would otherwise fail analysis here (identity casts are
      // erased by SimplifyCasts, so the current shape pays nothing)
      .select(col("user_id").cast("long").as("user_id"), col("event_type"),
        col("value").cast("double").as("value"), col("ts"))
      .withWatermark("ts", "1 day")
      .as[(Long, String, Double, java.sql.Timestamp)]
    val updates = feed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Double, java.sql.Timestamp)],
         st: GroupState[UserState]) =>
          if (st.hasTimedOut) {
            // TTL: watermark passed this key's newest event + TTL — drop
            // the state; totals were already emitted on every update
            st.remove()
            Iterator.empty
          } else {
            val prev = st.getOption.getOrElse(UserState(0L, Double.NegativeInfinity, Set.empty))
            var newest = Long.MinValue
            val cur = rows.foldLeft(prev) { (acc, r) =>
              newest = math.max(newest, r._4.getTime)
              UserState(acc.n + 1, math.max(acc.maxValue, r._3), acc.types + r._2)
            }
            st.update(cur)
            st.setTimeoutTimestamp(newest + StateTtlMs)
            Iterator((uid, cur.n, cur.maxValue, cur.types.size.toLong))
          }
      }
      .toDF("user_id", "n_events", "max_value", "n_types")
    val out = drainToParquet(updates, "update")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    readSink(s, out)
      .filter(col("user_id") >= 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy(col("user_id"))
  }

  /** Watermarked stream-stream LEFT OUTER interval join — the semantics
    * the inner join (streamJoin) cannot express: a left row with no
    * match emits null-padded exactly ONCE, when the watermark proves no
    * matching right row can still arrive (a_ts + 30 min < watermark) —
    * at which point its join state is also evicted. Both sides carry the
    * flush sentinel so the finite harness's watermark passes every real
    * row. The sentinel is NOT filtered out — a pre-join filter gets
    * pushed below the EventTimeWatermark node by the optimizer and the
    * sentinel would then never advance the watermark (observed: the
    * newest watermark-delay's worth of rows never flushed). It needs no
    * filter: its own match window closes 30 min AFTER its event time,
    * which the watermark (sentinel − 1 day) never passes, so the
    * sentinel sits in state for the harness lifetime and never reaches
    * the output. The emitted result must equal the batch LEFT JOIN —
    * which is the oracle. */
  def streamOuterJoin(s: SparkSession, dir: String): DataFrame = {
    def side(p: String) = eventsWithFlush(s, dir)
      .select(col("user_id").as(s"${p}_user"), col("event_id").as(s"${p}_id"),
        col("ts").as(s"${p}_ts"))
      .withWatermark(s"${p}_ts", "1 day")
    val joined = side("a").join(side("b"),
      col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 30 MINUTES"),
      "leftOuter")
    val out = drainToParquet(joined, "append")
    readSink(s, out)
      .groupBy(col("a_user"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("b_id").isNull, 1L).otherwise(0L)).as("n_unmatched"))
      .orderBy(col("a_user"))
  }

  /** Streaming CDC materialization — the INCREMENTAL spelling of the
    * batch `w_cdc_apply` row: each micro-batch is reduced to a per-key
    * summary (latest change by (ts, event_id) + change count) and MERGEd
    * into a versioned state table. The merge is associative and
    * commutative — max(struct(ts, event_id, …)) picks the latest writer
    * and counts add — so the materialized state is INDEPENDENT of how
    * the feed splits into micro-batches (StreamingSpec proves 3 drops ==
    * 1 drop == the batch row; the oracle IS the batch oracle).
    *
    * State versioning makes redelivery idempotent without a transaction
    * log: batch b always reads v(b-1) (immutable once written) and
    * rewrites v(b) deterministically — a replayed batch reproduces its
    * own version byte-for-byte instead of double-applying. DELETE
    * tombstones stay IN the state (filtered only at read time): a
    * tombstone must out-order late updates for earlier changes, exactly
    * like Delta/Iceberg MERGE semantics. At 100 TB the per-batch merge
    * touches |keys-in-batch| + |state| rows — and the state frame is
    * (key, summary) wide, never the feed. */
  /** One CDC micro-batch applied to the versioned state: summarize the
    * batch per key, merge with v(batchId-1), write v(batchId). Pure
    * function of (batch content, batchId, prior state) — calling it twice
    * with the same inputs rewrites the same version identically, which is
    * the redelivery-idempotence contract (tested directly in
    * StreamingSpec, not just via the happy path). */
  private[graft] def cdcMergeBatch(batch: DataFrame, batchId: Long,
                                   stateDir: String): Unit = {
    val batchSummary = batch
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        graft.Analytic.cdcOp.as("op"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("op"), col("value"))).as("last"),
        count(lit(1)).as("n_changes"))
      .select(col("user_id"), col("last.ts").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.op").as("last_op"), col("last.value").as("last_value"),
        col("n_changes"))
    val merged =
      if (batchId == 0) batchSummary
      else batchSummary.unionByName(
          batch.sparkSession.read.parquet(s"$stateDir/v${batchId - 1}"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("last_ts"), col("last_event_id"),
          col("last_op"), col("last_value"))).as("last"),
          sum(col("n_changes")).as("n_changes"))
        .select(col("user_id"), col("last.last_ts").as("last_ts"),
          col("last.last_event_id").as("last_event_id"),
          col("last.last_op").as("last_op"),
          col("last.last_value").as("last_value"), col("n_changes"))
    merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
  }

  /** `checkpointDir` is exposed so a caller (or test) can stop a run and
    * RESTART a new query against the same checkpoint: committed offsets
    * and the batchId counter recover, so the versioned state continues
    * where the previous query left off instead of reprocessing. */
  private[graft] def cdcApplyInto(stream: DataFrame, stateDir: String,
                                  checkpointDir: String = null): String = {
    val s = stream.sparkSession
    stateStoreConf(s)
    withDrainParallelism(stream) {
      stream.writeStream
        .option("checkpointLocation",
          Option(checkpointDir).getOrElse(tmp("graft-cdc-ckpt-")))
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          cdcMergeBatch(batch, batchId, stateDir)
        }
        .start().awaitTermination()
    }
    // current state = highest version written (FS-API listing: the state
    // root is hdfs/s3a-portable like every maintained-index dir)
    val vs = numberedDirs(s, stateDir, "v").map(_._1)
    require(vs.nonEmpty, "cdcApplyInto: stream produced no batches")
    s"$stateDir/v${vs.max}"
  }

  /** The materialized CDC state re-read for the oracle: tombstoned keys
    * filtered out, same shape as the batch w_cdc_apply row. */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val current = cdcApplyInto(readEventsStream(s, dir), tmp("graft-cdc-state-"))
    s.read.parquet(current)
      .filter(col("last_op") =!= "D")
      .select(col("user_id"), col("last_op"), col("last_value"),
        col("last_ts"), col("n_changes"))
      .orderBy(col("user_id"))
  }

  import graft.SparkEntry.Q

  /** Stateless ingest-admission shape shared by s_quality / s_pii /
    * s_media_decode: bind a batch-identical per-row projection to the
    * document stream itself (no foreachBatch — the projection IS the
    * streaming plan), drain append-mode to parquet, re-read sorted for
    * the oracle compare — under the projection's own analyzed schema
    * (the drainMapped zero-batch rule). */
  private def drainedDocProjection(s: SparkSession, d: String,
      proj: DataFrame => DataFrame): DataFrame = {
    val stream = readDocumentsStream(s, d)
    readDrained(stream, proj, drainToParquet(proj(stream), "append"))
      .orderBy(org.apache.spark.sql.functions.col("doc_id"))
  }

  def queries: Map[String, Q] = Map(
    "s_dedup" -> ((s, d) => dedup(s, d)),
    "s_doc_dedup" -> ((s, d) => docDedup(s, d)),
    "s_neardup" -> ((s, d) => graft.LlmOps.streamNearDup(s, d)),
    // Streaming URL-dedup admission WITH a maintained canonical-URL
    // index (r19 verdict task 1) — the crawler front-end's first
    // continuous stage: per micro-batch, canonicalize (the batch row's
    // stateless ladder), reject URLs already admitted, fold admissions
    // into the index for the next batch (the admitBatch discipline).
    // The duplicate-group verdict is re-derived FROM the admission log,
    // so the maintained index is load-bearing for the shared
    // l_url_dedup oracle, not just for the side files.
    "s_url_dedup" -> ((s, d) => graft.LlmOps.streamUrlDedup(s, d)),
    // Streaming QUALITY-FILTER admission: the stateless rule cascade
    // (LlmOps.qualityProjection) bound to the document stream — an
    // ingest-time gate needs no state store, so the streaming plan IS the
    // batch plan; provably so, since the row shares the batch oracle.
    "s_quality" -> ((s, d) =>
      drainedDocProjection(s, d, graft.LlmOps.qualityProjection)),
    // Streaming PII scrub at ingest: the stateless regex Project
    // (LlmOps.piiProjection) bound to the document stream — like
    // s_quality, no state store, so the streaming plan IS the batch
    // plan, proven by the shared l_pii_scrub oracle.
    "s_pii" -> ((s, d) =>
      drainedDocProjection(s, d, graft.LlmOps.piiProjection)),
    // Streaming HTML main-content extraction at ingest — the FIRST
    // transform a crawler feed hits, before url/quality/dedup: the
    // stateless construct+extract Project (LlmOps.htmlExtractProjection)
    // bound to the document stream, no state store — the streaming plan
    // IS the batch plan, proven by the shared l_html_extract oracle.
    "s_html_extract" -> ((s, d) =>
      drainedDocProjection(s, d, graft.LlmOps.htmlExtractProjection)),
    // Streaming MEDIA DECODE at ingest: the construct + real-parser
    // decode pass (LlmOps.mediaDecodeProjection — per-row stateless
    // mapPartitions, decoder context per partition) bound to the
    // document stream AS the streaming plan, no state store and no
    // foreachBatch. Shares l_media_decode's oracle: micro-batched
    // ingest-time decode provably equals the batch scan.
    "s_media_decode" -> ((s, d) =>
      drainedDocProjection(s, d, graft.LlmOps.mediaDecodeProjection)),
    // Streaming LANGUAGE-ID admission: the model is trained ONCE
    // batch-side and persisted to parquet (the production shape — an
    // offline trainer, an online scorer), then every micro-batch is
    // scored against the loaded broadcast model. Scoring is stateless
    // per document, so micro-batched scoring provably equals the batch
    // l_langid row — the shared oracle is the proof.
    "s_langid" -> ((s, d) => {
      val modelDir = tmp("graft-langid-model-")
      graft.LlmOps.trainLangidModel(graft.Tables.documents(s, d), modelDir)
      val model = s.read.parquet(modelDir)
      val langs = graft.LlmOps.langidLangs(model)
      drainMapped(readDocumentsStream(s, d),
        b => graft.LlmOps.scoreLangid(b, model, langs))
        .orderBy(org.apache.spark.sql.functions.col("doc_id"))
    }),
    // The PRODUCTION ingest loop end-to-end: the pipeline's stateless
    // head (quality cascade + PII scrub, LlmOps.pipelineHead) admits
    // documents per micro-batch into a parquet store, and the
    // corpus-global curation tail (exact dedup → near-dup → decontaminate
    // → mixture → pack) then runs over the ADMITTED STORE — exactly the
    // periodic-compaction shape a 100 TB deployment runs. Sharing
    // l_pipeline's oracle proves micro-batched admission + batch curation
    // equals the one-shot batch pipeline.
    "s_pipeline" -> ((s, d) =>
      graft.LlmOps.pipelineTail(s, d, readSink(s, drainToParquet(
        graft.LlmOps.pipelineHead(readDocumentsStream(s, d)), "append")))),
    // Streaming HEAVY HITTERS — the additive-partial-aggregate pattern:
    // counting is distributive, so each micro-batch drains its map-side-
    // combined token-count partial append-only (LlmOps.tokenCountPartials,
    // vocabulary-bounded per batch) and ONE compaction aggregate at the
    // tail sums partials into exact corpus counts — no state store, no
    // unbounded keyed state, the at-scale spelling for any distributive
    // aggregate over an unbounded ingest. Shares l_heavy_hitters' oracle
    // (the batch row's count-min pass is a scan optimization, invisible
    // to correctness there and unnecessary here).
    "s_heavy_hitters" -> ((s, d) => {
      drainMapped(readDocumentsStream(s, d), graft.LlmOps.tokenCountPartials)
        .groupBy(col("tok")).agg(sum(col("pc")).as("n"))
        .filter(col("n") >= graft.LlmOps.HH_T)
        .orderBy(col("n").desc, col("tok"))
    }),
    // Streaming BM25 scoring at ingest: corpus statistics (per-term df,
    // n_docs, avgdl) TRAINED once batch-side and persisted to a
    // kilobyte parquet model (the offline-indexer/online-scorer seam,
    // the l_langid pattern), then every arriving document scored
    // statelessly against the loaded model — tf and dl are row-local
    // facts, so micro-batched scoring provably equals the batch row;
    // the corpus-global top-10 is the drain tail. Shares l_bm25's
    // oracle.
    "s_bm25" -> ((s, d) => {
      val modelDir = tmp("graft-bm25-model-")
      graft.LlmOps.trainBm25Model(s, d, modelDir)
      val model = s.read.parquet(modelDir)
      drainMapped(readDocumentsStream(s, d),
        b => graft.LlmOps.scoreBm25(b, model))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
        .select(col("doc_id"), col("n_terms"), col("score"))
    }),
    // Streaming PER-DOMAIN admission cap: scoring is stateless per
    // document (LlmOps.domainQuality — URL canonicalization + the
    // l_text_stats quality arithmetic, no corpus facts), so it binds to
    // each micro-batch inside foreachBatch unchanged (the drainMapped
    // rule); the per-domain top-N is a corpus-global selection, hence
    // the drain tail (the s_bm25 discipline) — and the tail runs the
    // SAME two-phase skew-safe spelling as the batch row
    // (LlmOps.domainCapSelect), so at 100 TB the admitted store never
    // shuffles on the bare domain key either. Shares l_domain_cap's
    // oracle: micro-batched scoring + one selection pass ≡ the batch row.
    "s_domain_cap" -> ((s, d) =>
      graft.LlmOps.domainCapSelect(
        drainMapped(readDocumentsStream(s, d), graft.LlmOps.domainQuality))),
    // Streaming LM-perplexity scoring at ingest: the bigram-MLE model is
    // TRAINED once batch-side and persisted (LlmOps.trainLmModel — the
    // last model-carrying op to get the offline-trainer/online-scorer
    // seam; langid, BM25, semdedup and kmeans already have it), then
    // every arriving document is scored statelessly against the loaded
    // model: a bigram occurrence is a row-local fact, its counts are
    // corpus facts carried BY the model, so micro-batched scoring
    // provably equals the batch l_lm_score row — the shared oracle is
    // the proof. The model join stays SHUFFLED per micro-batch (the
    // model is vocabulary²-bounded and grows with the corpus — never a
    // broadcast).
    "s_lm_score" -> ((s, d) => {
      val modelDir = tmp("graft-lm-model-")
      graft.LlmOps.trainLmModel(s, d, modelDir)
      val model = s.read.parquet(modelDir)
      drainMapped(readDocumentsStream(s, d),
        b => graft.LlmOps.scoreLm(b, model))
        .orderBy(col("doc_id"))
    }),
    // Streaming similarity RETRIEVAL: query vectors arrive as a stream,
    // the corpus index is static — the online-serving shape of the
    // similarity-search family. Per-query scoring is stateless (one
    // index scan per micro-batch of queries, exact cosine + top-k inside
    // foreachBatch), so the twin binds the batch row's scorer
    // (LlmOps.cosineTopk) per micro-batch unchanged and shares
    // l_cosine_topk's oracle. At 100 TB the index side is the bucketed/
    // IVF-partitioned table (l_ann_lsh/l_ivf are the scale paths); the
    // brute scorer is the recall ceiling a serving deployment A/Bs
    // against.
    "s_cosine_topk" -> ((s, d) => {
      val index = graft.LlmOps.embedNorms(s, d)
      val queries = readEmbeddingsStream(s, d)
        .select(col("vec_id"), col("embedding"))
        .withColumn("nrm", sqrt(graft.functions.HashExprs.vecDot(
          col("embedding"), col("embedding"))))
        .filter(col("vec_id") < 5)
      drainMapped(queries, b => graft.LlmOps.cosineTopk(index, b))
        .orderBy(col("q_id"), col("rank"))
    }),
    // Streaming repeated-substring detection WITH index maintenance: the
    // ExactSubstr family's ingest-time shape — per micro-batch, arriving
    // docs' positional grams probe (and then join) the gram index-so-far,
    // covered positions emitted symmetrically so the drained union is
    // EXACTLY the batch covered set (LlmOps.dupSpanBatch). Shares
    // l_dup_spans' oracle: micro-batched ingest with a maintained index
    // provably equals the one-shot corpus scan.
    // Streaming ANN serving over the PERSISTED compressed index — the
    // billion-vector online path composed end-to-end: the IVF+PQ index
    // (vec_id, cell, codes) is trained once offline
    // (LlmOps.trainIvfPqIndex — the same train/score seam as langid/
    // BM25/LM/semdedup), and each arriving query micro-batch probes its
    // nprobe cells, ADC-scores codes, and exact-re-ranks the shortlist
    // (LlmOps.ivfPqScorer) — stateless per query, no state store.
    // Shares l_ivfpq_ann's oracle: the proof the SERVED approximate
    // answer equals the batch row over the same index.
    "s_ivfpq_topk" -> ((s, d) => {
      val indexDir = tmp("graft-ivfpq-index-")
      // train + serve share ONE ivfPqPrep (r22): the codebook collects
      // ran twice per invocation before — identical rows both times
      val scorer = graft.LlmOps.ivfPqTrainAndServe(s, d, indexDir)
      val queries = readEmbeddingsStream(s, d)
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 5)
      drainMapped(queries, scorer)
        .orderBy(col("q_id"), col("rank"))
    }),
    "s_dup_spans" -> ((s, d) => graft.LlmOps.streamDupSpans(s, d)),
    // Streaming DECONTAMINATION at ingest: the benchmark 8-gram set is
    // STATIC (eval sets are MBs, built once offline — here LlmOps
    // .benchGrams on the at-rest corpus, the same frame the batch row
    // broadcasts), and the overlap count is per-document, so scoring
    // binds to each micro-batch inside foreachBatch unchanged — the last
    // stateless LLM admission gate to get its streaming twin (quality,
    // PII, langid, neardup, semdedup already have one). Shares
    // l_decontaminate's oracle: micro-batched admission ≡ the batch scan.
    "s_decontaminate" -> ((s, d) => {
      // persisted for the drain: every micro-batch's score plan embeds
      // this frame's broadcast — without the persist each batch would
      // re-run the at-rest corpus scan + gram explode + distinct that
      // the "built once offline" eval-set contract forbids
      val bench = graft.LlmOps.benchGrams(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out =
        try drainMapped(readDocumentsStream(s, d),
          b => graft.LlmOps.decontaminateScore(b, bench))
        finally bench.unpersist()
      out.orderBy(col("doc_id"))
    }),
    // Streaming SEMANTIC-dedup admission: codebook trained once and
    // persisted (the r12 model seam), arriving vectors scored statelessly
    // against the static corpus assignment index — cell-bounded candidate
    // work per vector, no state store. Shares l_semdedup's oracle: the
    // proof that micro-batched admission equals the batch verdict.
    // Streaming BPE encoding at ingest: the merge model trains once on
    // the at-rest corpus (LlmOps.bpeTrain — the offline-train/
    // online-score seam), then each arriving document's token count is
    // computed statelessly against it (LlmOps.bpeScorer — per-doc facts
    // + model facts only, so micro-batched encoding ≡ the batch row;
    // shared oracle). The per-doc aggregate is batch-local, hence
    // drainMapped (the langid rule).
    "s_bpe_encode" -> ((s, d) =>
      drainMapped(readDocumentsStream(s, d), graft.LlmOps.bpeScorer(s, d))
        .orderBy(col("doc_id"))),
    "s_semdedup" -> ((s, d) => graft.LlmOps.streamSemDedup(s, d)),
    // Streaming CDC: incremental MERGE materialization of the changelog
    // (see cdcApplyInto) — shares the batch row's oracle, proving the
    // micro-batched upsert equals the one-shot batch apply.
    "s_cdc" -> ((s, d) => cdcApply(s, d)),
    // Streaming graph materialization — the reference's ACTUAL sink shape
    // (its Neo4j consumer MERGEs each event's 6-node/5-edge fan-out as it
    // arrives, cmd/neo4j_sink/main.go:80-89): the node table maintained
    // incrementally per micro-batch via the idempotent delta upsert
    // (graphUpsertBatch). Shares the batch k3_graph_nodes oracle — the
    // proof that per-batch MERGE equals the one-shot batch dedup.
    "s_graph_nodes" -> ((s, d) =>
      drainUpsert(readEventsStream(s, d),
        b => graft.operators.CtsParity.nodes(ceOf(b)),
        Seq("kind", "key"))
        .orderBy(col("kind"), col("key"))),
    // Streaming graph edges — same maintained MERGE shape, identity
    // (rel, src_key, dst_key); shares the batch k3_graph_edges oracle.
    "s_graph_edges" -> ((s, d) =>
      drainUpsert(readEventsStream(s, d),
        b => graft.operators.CtsParity.edges(ceOf(b)),
        Seq("rel", "src_key", "dst_key"))
        .orderBy(col("rel"), col("src_key"), col("dst_key"))),
    // Streaming Cypher emission — the statement stream the reference's
    // Bolt writer actually consumes (one parametrized MERGE per event as
    // it arrives, neo4j/client.go:33-84): the batch k3_cypher projection
    // bound to the event stream as a stateless per-row plan (no
    // foreachBatch, no state store — the projection IS the streaming
    // plan). Shares the batch oracle: per-event statement text cannot
    // depend on micro-batch composition.
    "s_cypher" -> ((s, d) => {
      val stream = readEventsStream(s, d)
      val proj = (b: DataFrame) => ceOf(b).select(
        col("id"),
        org.apache.spark.sql.functions.lit(
          graft.operators.CtsParity.cypherMerge).as("statement"),
        graft.operators.CtsParity.cypherParamsJson.as("params_json"))
      readDrained(stream, proj, drainToParquet(proj(stream), "append"))
        .orderBy(col("id").cast("long"))
    }),
    "s_tumbling" -> ((s, d) => tumbling(s, d)),
    "s_sliding" -> ((s, d) => sliding(s, d)),
    "s_session" -> ((s, d) => session(s, d)),
    "s_stateful" -> ((s, d) => stateful(s, d)),
    "s_static_join" -> ((s, d) => staticJoin(s, d)),
    "s_stream_join" -> ((s, d) => streamJoin(s, d)),
    "s_stream_outer" -> ((s, d) => streamOuterJoin(s, d))
  )

  /** Which testdata table each streaming row CONSUMES — the denominator
    * of Bench's `streaming_rows_per_sec` figure. Declared here, next to
    * [[queries]], so a new row cannot silently pick up a wrong default
    * in Bench; `StreamingSpec` asserts the two maps stay key-identical.
    * Rows that read the feed twice (the redelivery unions) count
    * single-feed rows — a consistent RELATIVE metric. Rows that stream a
    * FILTERED subset of their table (s_cosine_topk streams only the
    * vec_id < 5 query rows against a static index) still use the full
    * table count: the rate is meaningful ROUND-OVER-ROUND per row, never
    * comparable across rows (r16 ADVICE — the cross-row caveat applies
    * to every row here, filtered or not, because per-row drain overhead
    * differs; the denominator just has to stay fixed per row). */
  def sourceTables: Map[String, String] = Map(
    "s_dedup" -> "events", "s_cdc" -> "events", "s_tumbling" -> "events",
    "s_sliding" -> "events", "s_session" -> "events",
    "s_stateful" -> "events", "s_static_join" -> "events",
    "s_stream_join" -> "events", "s_stream_outer" -> "events",
    "s_graph_nodes" -> "events", "s_graph_edges" -> "events",
    "s_cypher" -> "events",
    "s_doc_dedup" -> "documents", "s_quality" -> "documents",
    "s_pii" -> "documents", "s_langid" -> "documents",
    "s_media_decode" -> "documents", "s_heavy_hitters" -> "documents",
    "s_bm25" -> "documents", "s_lm_score" -> "documents",
    "s_decontaminate" -> "documents", "s_dup_spans" -> "documents",
    "s_bpe_encode" -> "documents", "s_domain_cap" -> "documents",
    "s_neardup" -> "documents", "s_pipeline" -> "documents",
    "s_url_dedup" -> "documents", "s_html_extract" -> "documents",
    "s_semdedup" -> "embeddings", "s_cosine_topk" -> "embeddings",
    "s_ivfpq_topk" -> "embeddings")

  /** Batch-SQL twins: the streaming answers must equal what DuckDB computes
    * over the at-rest table (exactly-once + event-time semantics). */
  def oracles: Map[String, String] = Map(
    "s_dedup" ->
      """SELECT event_type, count(*) AS n, sum(value) AS sum_value
        |FROM (SELECT DISTINCT ON (event_id) event_id, event_type, value FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "s_doc_dedup" ->
      """SELECT DISTINCT sha256(lower(trim(text))) AS fp
        |FROM documents ORDER BY fp""".stripMargin,

    // streaming admission control provably equals the batch LSH row (each
    // pair surfaces from both sides' ingest; orientation + distinct
    // collapses them) — the oracle IS the batch oracle
    "s_neardup" -> graft.LlmOps.oracles("l_minhash_lsh"),
    // maintained-index URL admission: first-come-wins over a doc_id-
    // ordered feed ≡ the batch row's min-id canon — the oracle IS the
    // batch url-dedup oracle
    "s_url_dedup" -> graft.LlmOps.oracles("l_url_dedup"),
    "s_quality" -> graft.LlmOps.oracles("l_quality_filter"),
    "s_pii" -> graft.LlmOps.oracles("l_pii_scrub"),
    // stateless per-row construct+extract at ingest — the oracle IS the
    // batch html-extract oracle
    "s_html_extract" -> graft.LlmOps.oracles("l_html_extract"),
    // stateless per-row construct+decode at ingest — the oracle IS the
    // batch media-decode oracle
    "s_media_decode" -> graft.LlmOps.oracles("l_media_decode"),
    // stateless per-doc scoring against a persisted model: micro-batched
    // scoring ≡ the batch row — the oracle IS the batch oracle
    "s_langid" -> graft.LlmOps.oracles("l_langid"),
    // additive partials + compaction tail ≙ the one-shot corpus count —
    // the oracle IS the batch heavy-hitters oracle
    "s_heavy_hitters" -> graft.LlmOps.oracles("l_heavy_hitters"),
    // stateless per-doc scoring against the persisted corpus-statistics
    // model — the oracle IS the batch BM25 oracle
    "s_bm25" -> graft.LlmOps.oracles("l_bm25"),
    // stateless per-doc URL+quality scoring, corpus-global top-N at the
    // drain tail — the oracle IS the batch domain-cap oracle
    "s_domain_cap" -> graft.LlmOps.oracles("l_domain_cap"),
    // stateless per-doc scoring against the persisted bigram-MLE model —
    // the oracle IS the batch LM-score oracle
    "s_lm_score" -> graft.LlmOps.oracles("l_lm_score"),
    // stateless per-query scoring against the static corpus index — the
    // oracle IS the batch top-k oracle
    "s_cosine_topk" -> graft.LlmOps.oracles("l_cosine_topk"),
    // served-from-persisted-index scoring ≡ the batch IVF+PQ row — the
    // oracle IS the batch oracle
    "s_ivfpq_topk" -> graft.LlmOps.oracles("l_ivfpq_ann"),
    // stateless per-doc encoding against the trained merge model — the
    // oracle IS the batch BPE-encode oracle
    "s_bpe_encode" -> graft.LlmOps.oracles("l_bpe_encode"),
    // maintained-gram-index ingest provably equals the one-shot corpus
    // scan (symmetric coverage emission + terminal distinct) — the
    // oracle IS the batch detect oracle
    "s_dup_spans" -> graft.LlmOps.oracles("l_dup_spans"),
    // stateless per-doc scoring against the static benchmark gram set —
    // the oracle IS the batch decontamination oracle
    "s_decontaminate" -> graft.LlmOps.oracles("l_decontaminate"),
    // stateless per-vector scoring against the persisted codebook + the
    // static corpus index — the oracle IS the batch semdedup oracle
    "s_semdedup" -> graft.LlmOps.oracles("l_semdedup"),
    // micro-batched admission + batch curation ≙ the one-shot batch
    // pipeline — the oracle IS the batch pipeline's oracle
    "s_pipeline" -> graft.LlmOps.oracles("l_pipeline"),
    "s_cdc" -> graft.Analytic.oracles("w_cdc_apply"),
    // per-micro-batch MERGE materialization ≡ the one-shot batch dedup —
    // the oracles ARE the batch graph-table oracles
    "s_graph_nodes" -> graft.Parity.oracles("k3_graph_nodes"),
    "s_graph_edges" -> graft.Parity.oracles("k3_graph_edges"),
    // stateless per-event statement render — the oracle IS the batch
    // k3_cypher oracle (identical wire text, hash-pinned)
    "s_cypher" -> graft.Parity.oracles("k3_cypher"),

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
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    // the watermark-finalized outer join must equal the batch LEFT JOIN
    "s_stream_outer" ->
      """WITH j AS (
        |  SELECT a.user_id AS a_user, b.event_id AS b_id
        |  FROM events a LEFT JOIN events b
        |    ON b.user_id = a.user_id
        |   AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |)
        |SELECT a_user, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN b_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM j GROUP BY a_user ORDER BY a_user""".stripMargin,

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
