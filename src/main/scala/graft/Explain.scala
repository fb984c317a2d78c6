package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val advisory = sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // flags may appear anywhere: Explain [--clear|--bench-order] <sfDir> <query...>
    val (flags, positional) = args.partition(_.startsWith("--"))
    val d = positional.headOption.getOrElse("/root/testdata/sf0.01")
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      (System.nanoTime()-t0)/1e9
    }
    if (flags.contains("--bench-order")) {
      for ((name, _) <- SparkEntry.queries.filterNot(_._1.startsWith("s_"))) {
        val ts = Seq.fill(4)(once(name))
        println(f"$name%-22s ${ts.map(t => f"$t%7.2f").mkString(" ")}")
      }
    } else {
      // --clear: isolate each query's cost (drop persisted intermediates
      // between queries, mirroring Bench.runOnce)
      val clear = flags.contains("--clear")
      for (q <- positional.drop(1)) {
        println(s"===== $q =====")
        val df = SparkEntry.queries(q)(spark, d)
        df.explain("formatted")
        val ts = Seq.fill(3) {
          val t = once(q)
          if (clear) spark.catalog.clearCache()
          t
        }
        println(s"time: ${ts.map(t => f"$t%.2f").mkString(" ")}s")
      }
    }
    spark.stop()
  }
}
