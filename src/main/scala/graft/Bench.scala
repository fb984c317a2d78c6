package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): every batch query from
  * SparkEntry.queries against SPARK_GRAFT_SF_DIR, one JSON line out.
  *
  * Methodology: each query executes to completion through the `noop`
  * DataSource — all rows materialized, nothing pruned under a count, no
  * disk write in the measurement (the r01/r02 `.count()` harness measured
  * pruned scans and swung 20× run-to-run).
  *
  * Iteration layout: one warm-up PASS over every query (JIT, codegen and
  * file-index caches), then 3 further full passes, reporting each query's
  * MINIMUM across passes. Passes are interleaved rather than per-query
  * back-to-back because this box suffers multi-minute external load
  * bursts: back-to-back iterations all land inside a burst (median
  * included), while interleaving separates a query's samples by minutes
  * so the min reflects the machine, not the neighbor (observed: identical
  * binaries, 0.4 s → 34 s swings on back-to-back medians).
  *
  * Streaming (`s_*`) queries are excluded — they time trigger machinery,
  * not operator cost, and have their own correctness rows.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(fn: SparkEntry.Q): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      // cache lifecycle: queries persist intermediates (shingle/signature
      // frames) for intra-query reuse; drop them between queries so
      // CacheManager entries don't accumulate across the whole suite —
      // each sample pays its own materialization and nothing else's
      spark.catalog.clearCache()
      t
    }

    val batchQueries = SparkEntry.queries.filterNot(_._1.startsWith("s_")).toSeq
    // pass 0 = warm-up (discarded), passes 1..SPARK_GRAFT_PASSES recorded
    // (default 3; large-SF stress runs set 1 — at 10× data each pass is
    // ~10 min and run-to-run JIT variance is amortized by query length)
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val samples = collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 0 to passes; (name, fn) <- batchQueries) {
      val t = try runOnce(fn) catch { case _: Throwable => -1.0 }
      if (pass > 0) samples(name) = t :: samples.getOrElse(name, Nil)
    }
    val results = batchQueries.map { case (name, _) =>
      val xs = samples.getOrElse(name, List(-1.0))
      name -> (if (xs.forall(_ < 0)) -1.0 else xs.filter(_ >= 0).min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout is the driver contract, but its capture has been observed to
    // clip mid-line (BENCH_r06 lost 3 queries) — persist the same JSON to a
    // file so the per-query map always survives intact
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
