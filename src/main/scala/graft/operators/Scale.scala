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

  /** Skew-safe equi-join for a HOT fact key: the fact side gets a
    * deterministic salt (hash of `saltSource`, not rand() — reproducible
    * across retries), the dim side is REPLICATED `buckets` times with one
    * replica per salt value, and the join runs on (key, salt). A key that
    * would hammer one reducer now spreads over `buckets` of them; the dim
    * rows replicate `buckets`-fold, which is the deliberate trade (dims
    * are small next to facts — that is why the key is hot in the first
    * place). Answer-identical to the plain join: every fact row meets
    * exactly the one dim replica carrying its salt.
    *
    * This is the manual spelling of what AQE's skew-join mitigation does
    * at runtime; it exists for plans AQE cannot rewrite (e.g. when the
    * skew only materializes after an upstream stage) and as the
    * oracle-checkable demonstration of the technique. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
                 dimKey: Column, saltSource: Column, buckets: Int): DataFrame = {
    val taken = fact.columns.toSet ++ dim.columns.toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val saltCol = fresh("__salt")
    val saltedFact = fact.withColumn(saltCol, pmod(hash(saltSource), lit(buckets)))
    val replicatedDim = dim.withColumn(saltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim,
        factKey === dimKey && saltedFact(saltCol) === replicatedDim(saltCol))
      .drop(saltCol)
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
