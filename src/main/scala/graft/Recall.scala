package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Recall probe: the approximate ANN rows measured against the exact
  * cosine top-3 ground truth (l_cosine_topk) on the same corpus —
  * recall@3 is THE dial an ANN deployment monitors (IVF loses
  * candidates at cell boundaries, PQ distorts the metric with
  * quantization error, LSH buckets are similarity-oblivious). The
  * correctness gate pins each row's DETERMINISTIC output against its
  * oracle; this main pins how much of the exact answer the
  * approximation retains, which only a cross-row comparison can say.
  *
  * Usage: tools/run.sh graft.Recall [sfDir] [row ...]
  * Prints one `RECALL <row> hits/total = r` line per approximate row.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rows =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("l_ann_lsh", "l_ivf_ann", "l_ivfpq_ann")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pairs(name: String): Set[(Long, Long)] = {
      val p = SparkEntry.queries(name)(spark, sfDir)
        .select(col("q_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      p
    }
    val exact = pairs("l_cosine_topk")
    for (name <- rows) {
      val approx = pairs(name)
      val hit = exact.count(approx.contains)
      println(f"RECALL $name%-14s $hit/${exact.size} = ${hit.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
