package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      (System.nanoTime()-t0)/1e9
    }
    if (args.length > 1 && args(1) == "--bench-order") {
      for ((name, _) <- SparkEntry.queries.filterNot(_._1.startsWith("s_"))) {
        val ts = Seq.fill(4)(once(name))
        println(f"$name%-22s ${ts.map(t => f"$t%7.2f").mkString(" ")}")
      }
    } else {
      for (q <- args.drop(1)) {
        println(s"===== $q =====")
        val df = SparkEntry.queries(q)(spark, d)
        df.explain("formatted")
        println(s"time: ${once(q)}s")
      }
    }
    spark.stop()
  }
}
