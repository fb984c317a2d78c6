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
    *
    * `keyName` names the output key column. Temp columns are generated
    * collision-free against the input schema and agg names, so same-named
    * caller columns are never clobbered (and a `keyName` that collides
    * with an agg output is rejected instead of silently shadowing it).
    */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, buckets: Int,
                aggs: Seq[(String, Column, Column => Column)],
                keyName: String = "key"): DataFrame = {
    require(!aggs.exists(_._1 == keyName),
      s"saltedAgg: keyName '$keyName' collides with an aggregate output name")
    val taken = df.columns.toSet ++ aggs.map(_._1) + keyName
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val saltCol = fresh("__salt")
    val keyCol = fresh("__key")
    val pPrefix = fresh("__p_")
    val partial = df
      .withColumn(saltCol, pmod(hash(saltSource), lit(buckets)))
      .groupBy(key.as(keyCol), col(saltCol))
      .agg(aggs.head._2.as(s"$pPrefix${aggs.head._1}"),
        aggs.tail.map { case (n, p, _) => p.as(s"$pPrefix$n") }: _*)
    partial
      .groupBy(col(keyCol))
      .agg(aggs.head._3(col(s"$pPrefix${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, _, f) => f(col(s"$pPrefix$n")).as(n) }: _*)
      .withColumnRenamed(keyCol, keyName)
  }

  /** Skew-safe equi-join with HOT-KEY SPLITTING: one map-side-combined
    * aggregate counts fact rows per key; keys above `hotFactor`× the
    * mean per-key count are HOT. Only hot fact rows get a deterministic
    * salt (hash of `saltSource`, not rand() — reproducible across
    * retries) and only the hot-key SUBSET of the dim is replicated
    * `buckets`-fold (one replica per salt value, joined on (key, salt));
    * the cold majority takes the plain join. Union of the two branches
    * is answer-identical to the plain join: every key lands in exactly
    * one branch, every hot fact row meets exactly the one dim replica
    * carrying its salt.
    *
    * Scale shape: the previous spelling replicated the ENTIRE dim for
    * every key, hot or not — linear but `buckets`× the dim shuffle even
    * on uniform data (measured 6.2× the linear slope at the sf10 stress
    * run). Hot-key-split pays replication only where skew exists: on
    * uniform input the hot set is empty and the plan degenerates to the
    * plain join plus one cheap key-count aggregate; on skewed input the
    * hot keys (a kilobyte broadcast — skew means FEW keys carry many
    * rows) spread over `buckets` reducers while the cold shuffle stays
    * 1×. The fact scan runs twice (hot/cold split); both passes are
    * map-side-filtered by the broadcast hot set before any exchange.
    *
    * This is the manual spelling of what AQE's skew-join mitigation does
    * at runtime; it exists for plans AQE cannot rewrite (e.g. when the
    * skew only materializes after an upstream stage) and as the
    * oracle-checkable demonstration of the technique. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
                 dimKey: Column, saltSource: Column, buckets: Int,
                 hotFactor: Double = 4.0): DataFrame = {
    val taken = fact.columns.toSet ++ dim.columns.toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val saltCol = fresh("__salt")
    val keyCol = fresh("__hk")
    val cntCol = fresh("__hn")
    // per-key frequency: distinct-keys-sized after map-side combine;
    // persisted because the threshold scalar and the hot filter both
    // read it (longs only — spillable, never the fact rows)
    val counts = fact.groupBy(factKey.as(keyCol))
      .agg(count(lit(1)).as(cntCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = counts.agg((avg(col(cntCol)) * hotFactor).as("__thr"))
    val hot = counts.crossJoin(broadcast(thr))
      .filter(col(cntCol) > col("__thr"))
      .select(col(keyCol))
    val hotFacts = fact.join(broadcast(hot), factKey === col(keyCol), "left_semi")
    val coldFacts = fact.join(broadcast(hot), factKey === col(keyCol), "left_anti")
    val saltedFact = hotFacts.withColumn(saltCol, pmod(hash(saltSource), lit(buckets)))
    val replicatedDim = dim
      .join(broadcast(hot), dimKey === col(keyCol), "left_semi")
      .withColumn(saltCol, explode(sequence(lit(0), lit(buckets - 1))))
    val hotJoined = saltedFact.join(replicatedDim,
        factKey === dimKey && saltedFact(saltCol) === replicatedDim(saltCol))
      .drop(saltCol)
    hotJoined.unionByName(coldFacts.join(dim, factKey === dimKey))
  }

  /** Bloom-filter semi-join reduction: prune the FACT side down to rows
    * whose key *might* appear in `dim` BEFORE any exchange, using a
    * compact bloom sketch of the dim key set. The classic distributed
    * pattern for a dim that is too big to broadcast as rows but whose KEY
    * SET fits a few megabytes of bits: build the sketch with one
    * distributed aggregate over dim, broadcast it, and filter the fact
    * scan map-side. False positives (rate `fpp`) survive the filter and
    * are eliminated by the real join that follows — the final answer is
    * exactly the plain join's; false negatives cannot occur. At 100 TB
    * this turns "shuffle every fact row" into "shuffle the ~matching
    * fraction", which is the difference between a job that runs and one
    * that doesn't when the join is selective. (Spark's AQE injects the
    * same trick as a runtime filter for some plans; this is the explicit
    * spelling that composes with any downstream operator.)
    *
    * Long-typed keys only — the sketch hashes raw longs, so no row
    * serialization rides the broadcast. Returns the pruned fact frame;
    * the caller owns the join itself.
    *
    * The probe is a native codegen expression
    * ([[graft.functions.BloomMightContainLong]]), NOT a udf: the fact
    * scan stays inside whole-stage codegen and keys are never boxed. The
    * serialized sketch rides the plan as a binary literal — the scheduler
    * broadcasts task binaries per stage, so it ships to each executor
    * once, exactly like Spark's own injected runtime bloom filters.
    */
  def bloomPrune(fact: DataFrame, factKey: Column,
                 dim: DataFrame, dimKey: Column,
                 expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    // one distributed pass over dim: per-partition inserts, tree-merged
    // sketches (built on the public sketch API — DataFrameStatFunctions
    // .bloomFilter NPEs on an empty dim, and empty must mean "prune all",
    // not crash)
    val bf = dim.select(dimKey.cast("long"))
      .na.drop()
      .rdd.map(_.getLong(0))
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (f, k) => { f.putLong(k); f },
        (a, b) => a.mergeInPlace(b))
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    fact.filter(graft.functions.HashExprs.bloomMightContain(
      lit(bos.toByteArray), factKey.cast("long")))
  }

  /** Morton (z-order) key over `cols`: each column is min-max normalized
    * to a `bits`-wide integer, then the bits are interleaved (column j
    * owns bit positions i·n+j). Rows close in z are close in EVERY
    * participating dimension, so sorting a table by z clusters it for
    * multi-column range predicates at once — the layout trick behind
    * Delta/Iceberg OPTIMIZE ZORDER. A plain sort clusters only its
    * leading column; parquet min/max file skipping on the second column
    * degenerates to "every file overlaps". min/max come in as Columns so
    * callers can feed either literals (write path) or a broadcast stats
    * row (pure-plan path). All integer ops after one normalize
    * multiply+divide per column — codegen-friendly, no UDF.
    *
    * Caveat: min-max coding assumes roughly uniform columns. A heavily
    * skewed column squashes most of its mass into a few codes and the
    * clustering (not correctness) degrades — pre-transform such columns
    * (log, rank/ntile) before z-ordering, which is what production
    * OPTIMIZE ZORDER implementations do with range-ID coding. */
  def zValue(cols: Seq[(Column, Column, Column)], bits: Int): Column = {
    val n = cols.size
    // Spark's shiftleft wraps the shift count mod 64 — positions past the
    // long would silently fold onto low bits and corrupt the key
    require(n * bits <= 63,
      s"zValue: $n cols x $bits bits = ${n * bits} bit positions > 63; lower bits")
    val k = lit(((1L << bits) - 1).toDouble)
    val scaled = cols.map { case (c, mn, mx) =>
      val range = mx.cast("double") - mn.cast("double")
      when(range === 0.0, lit(0L))
        .otherwise(((c.cast("double") - mn.cast("double")) * k / range).cast("long"))
    }
    (for { i <- 0 until bits; j <- 0 until n } yield
      shiftleft(shiftright(scaled(j), i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` as `nFiles` parquet files range-partitioned and sorted
    * by the z-order key of `cols` (computed from one min/max stats pass,
    * inlined as literals). The z key is layout-only — dropped before the
    * write, so the schema is unchanged. Pay-once-at-write, like
    * `writeBucketed`: every later scan with range predicates on ANY
    * prefix-free combination of `cols` skips most files on footer
    * min/max stats. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], outDir: String,
                    nFiles: Int, bits: Int = 16): Unit = {
    val stats = df.agg(
      min(col(cols.head)).cast("double").as("mn0"),
      (cols.indices.map(j => max(col(cols(j))).cast("double").as(s"mx$j")) ++
        cols.indices.drop(1).map(j => min(col(cols(j))).cast("double").as(s"mn$j"))): _*)
      .collect()(0)
    // degenerate input (empty frame, or an all-null column): no usable
    // stats to z-order by — write the frame as-is rather than NPE on a
    // null min/max
    if ((0 until stats.length).exists(stats.isNullAt)) {
      df.write.mode("overwrite").parquet(outDir)
      return
    }
    val z = zValue(cols.indices.map { j =>
      (col(cols(j)), lit(stats.getAs[Double](s"mn$j")), lit(stats.getAs[Double](s"mx$j")))
    }, bits)
    val taken = df.columns.toSet
    val zc = Iterator.iterate("__z")(_ + "_").dropWhile(taken.contains).next()
    df.withColumn(zc, z)
      .repartitionByRange(nFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(outDir)
  }

  /** Small-file compaction: rewrite a parquet directory into files of
    * ~`targetBytes` each (sized from the CURRENT on-disk footprint, so
    * compression ratio carries over). Streaming sinks and incremental
    * ingest accrete small files; at 100 TB the resulting file-listing and
    * per-file open costs dominate scan setup, and a periodic compaction
    * pass is table maintenance, not an optimization. Uses a ROUND-ROBIN
    * repartition (pure size balancing, no key assumption); callers that
    * want co-location compact through `writeBucketed` instead. Writes to
    * `outDir` (a compacted copy), never in place — the swap is the
    * caller's atomic-rename concern. Returns the file count written. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              outDir: String, targetBytes: Long = 128L << 20): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(path).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(onDisk.toDouble / targetBytes).toInt)
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    val out = new org.apache.hadoop.fs.Path(outDir)
    fs.listStatus(out).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Co-located join via bucketing: write both sides bucketed+sorted on
    * the join key so the join needs NO shuffle at read time (the classic
    * pre-shuffle trade: pay the exchange once at write, never again). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    // with the in-memory catalog, a previous SESSION's managed-table
    // directory can survive without a catalog entry; saveAsTable then
    // refuses the orphaned location — clear it (DROP TABLE would have,
    // had the entry survived)
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(s"$wh/${table.toLowerCase}")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
