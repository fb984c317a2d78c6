package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic plan capture (not part of the driver contract):
  * `tools/run.sh graft.PlanDump <sfDir> <outDir> <tag> <query...>` writes
  * each named query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/. Building a DataFrame may run
  * jobs (model training, CC loops), but nothing is timed here; for
  * timings use Iso/Bench.
  *
  * Extras (diagnostic per-stage plans, not driver rows):
  *  - `url_admit_decision`: the urlAdmitBatch per-micro-batch decision
  *    frame over the documents table with a 1-batch prior index, i.e.
  *    exactly what every s_url_dedup trigger executes (the plan lives
  *    inside foreachBatch, which no declared query's explain can show).
  *  - `url_admit_decision_r20`: the RETIRED r20 spelling of the same
  *    decision — in-batch duplicates from a canon⋈canon self-join on
  *    url_canon (g(g-1)/2 rows for a hot URL) instead of the per-URL
  *    min aggregate — kept solely to generate the before-plan diff.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <tag> <query...>")
    val Array(sfDir, outDir, tag) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the canonicalized (doc_id, url_canon) frame of one arriving batch,
    // plus a prior-index dir so the index-probe join appears in the plan
    def urlCanonWithSeed(s: SparkSession): (DataFrame, Seq[String]) = {
      val canon = LlmOps.urlCanonFrame(Tables.documents(s, sfDir))
      val seed = graft.streaming.StreamingOps.tmp("graft-plandump-idx-")
      canon.limit(50).write.mode("overwrite").parquet(seed)
      (canon, Seq(seed))
    }
    val extras: Map[String, SparkSession => DataFrame] = Map(
      "url_admit_decision" -> (s => {
        val (canon, dirs) = urlCanonWithSeed(s)
        LlmOps.urlAdmitDecision(canon, dirs)
      }),
      "url_admit_decision_r20" -> (s => {
        val (canon, dirs) = urlCanonWithSeed(s)
        val vsIndex = canon.join(
            s.read.schema(canon.schema).parquet(dirs: _*)
              .select(col("url_canon"), col("doc_id").as("i_id")),
            Seq("url_canon"))
          .select(col("doc_id"), col("i_id").as("dup_of"))
        val inBatch = canon.join(
            canon.select(col("url_canon"), col("doc_id").as("o_id")),
            Seq("url_canon"))
          .filter(col("doc_id") > col("o_id"))
          .select(col("doc_id"), col("o_id").as("dup_of"))
        val rejected = vsIndex.unionByName(inBatch)
          .groupBy(col("doc_id")).agg(min(col("dup_of")).as("dup_of"))
        canon.join(rejected, Seq("doc_id"), "left")
          .select(col("doc_id"), col("url_canon"),
            col("dup_of").isNull.as("admitted"), col("dup_of"))
      }))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = extras.get(n).map(_(spark))
        .getOrElse(SparkEntry.queries(n)(spark, sfDir))
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLAN $n -> $outDir/${n}_$tag.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
