package graft

import org.apache.spark.sql.SparkSession

/** Measurement utility for the BPE train-path decision (r18 verdict
  * task 4): time merge learning at production round counts, local
  * (collect the word-frequency table, learn on the driver — the
  * reference-trainer shape) vs distributed (one pair-aggregate Spark
  * job per round). The numbers this printed at K=1024/sf10 are
  * recorded in SURVEY §8.6 and in [[LlmOps.bpeTrainCompute]]'s
  * docstring; the local path won and is the default.
  *
  * Usage: tools/run.sh graft.BpeProbe <sfDir> <rounds> [local|distributed]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = args(1).toInt
    val mode = args.lift(2).getOrElse("local")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (mode == "distributed") sys.props("graft.bpe.distributed") = "1"
    val t0 = System.nanoTime()
    val m = LlmOps.bpeTrainCompute(spark, sfDir, rounds)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"BPEPROBE mode=$mode rounds=$rounds learned=${m.length} last=${m.lastOption} sec=$sec%.2f")
    spark.stop()
  }
}
