package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale

/** The shuffle-shaping utilities: correctness (same answers) AND plan
  * shape (the shuffle really disappears / spreads). */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("saltedAgg equals the direct aggregation on a skewed key") {
    val events = Tables.events(spark, d)
    // event_type is highly skewed (5 values over 10k rows)
    val direct = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toSet
    val salted = Scale.saltedAgg(events,
      key = col("event_type"), saltSource = col("event_id"), buckets = 8,
      aggs = Seq(
        ("n", count(lit(1)), sum(_)),
        ("sv", sum(col("value")), sum(_))))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toSet
    assert(salted === direct)
  }

  test("saltedAgg's first shuffle spreads the hot key over salt buckets") {
    val events = Tables.events(spark, d)
    val plan = Scale.saltedAgg(events, col("event_type"), col("event_id"), 8,
      Seq(("n", count(lit(1)), sum(_))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salt column must be part of the partial grouping")
  }

  test("saltedAgg survives caller columns named like its temp/output columns") {
    val events = Tables.events(spark, d)
      .withColumn("__salt", lit("caller-owned"))
      .withColumn("__key", lit(9))
    val out = Scale.saltedAgg(events,
      key = col("event_type"), saltSource = col("event_id"), buckets = 4,
      aggs = Seq(("n", count(lit(1)), sum(_))), keyName = "etype")
    assert(out.columns.toSeq === Seq("etype", "n"))
    val direct = Tables.events(spark, d).groupBy(col("event_type")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSet === direct)
    // keyName colliding with an aggregate output is rejected loudly
    intercept[IllegalArgumentException] {
      Scale.saltedAgg(Tables.events(spark, d), col("event_type"), col("event_id"), 4,
        Seq(("n", count(lit(1)), sum(_))), keyName = "n")
    }
  }

  test("saltedJoin equals the plain join and salts both sides") {
    val fact = Tables.lineitem(spark, d).select(col("l_partkey"), col("l_quantity"))
    val dim = Tables.part(spark, d).select(col("p_partkey"), col("p_brand"))
    val direct = fact.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Scale.saltedJoin(fact, dim,
        col("l_partkey"), col("p_partkey"),
        saltSource = col("l_quantity"), buckets = 8)
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === direct, "salting must not change the join answer")
    // replica mechanics: dim side fans out exactly buckets-fold
    val joined = Scale.saltedJoin(fact, dim,
      col("l_partkey"), col("p_partkey"), col("l_quantity"), 8)
    assert(!joined.columns.contains("__salt"), "salt column must not leak")
    val replicated = Scale.saltedJoin(
      fact.limit(0), // empty fact: count replicas via the dim side alone
      dim, col("l_partkey"), col("p_partkey"), col("l_quantity"), 8)
    assert(replicated.count() === 0L)
  }

  test("compact rewrites a fragmented directory into size-targeted files") {
    val frag = java.nio.file.Files.createTempDirectory("frag-").toString
    val out = java.nio.file.Files.createTempDirectory("compacted-").toString
    // fragment: 64 tiny files, the streaming-sink accretion shape
    Tables.events(spark, d).repartition(64).write.mode("overwrite").parquet(frag)
    val fragFiles = new java.io.File(frag).listFiles.count(_.getName.endsWith(".parquet"))
    assert(fragFiles === 64)
    val onDisk = new java.io.File(frag).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = Scale.compact(spark, frag, out, targetBytes = onDisk / 4)
    assert(n >= 4 && n <= 6, s"expected ~4 compacted files, got $n")
    // content survives byte-for-byte (same rows, nothing dropped)
    assert(spark.read.parquet(out).count() === Tables.events(spark, d).count())
    val sumOut = spark.read.parquet(out).agg(sum(col("value"))).head.getDouble(0)
    val sumIn = Tables.events(spark, d).agg(sum(col("value"))).head.getDouble(0)
    assert(math.abs(sumOut - sumIn) < 1e-6, "compaction must preserve content")
  }

  test("date-partitioned writes prune partitions at the scan") {
    val out = java.nio.file.Files.createTempDirectory("events-part-").toString
    Tables.events(spark, d)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val pruned = spark.read.parquet(out)
      .filter(col("day") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("isnotnull(day"),
      s"day filter must prune partitions:\n$plan")
    // the pruned scan reads one day's directory, not the whole table
    val allDays = spark.read.parquet(out).select(col("day")).distinct().count()
    assert(allDays > 1)
    val expected = Tables.events(spark, d)
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(pruned.count() === expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Scale.writeBucketed(Tables.customer(spark, d), "c_bkt", "c_custkey", 4)
      Scale.writeBucketed(
        Tables.orders(spark, d).groupBy(col("o_custkey")).agg(count(lit(1)).as("n")),
        "o_bkt", "o_custkey", 4)
      val joined = spark.table("c_bkt")
        .join(spark.table("o_bkt"), col("c_custkey") === col("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables.customer(spark, d)
        .join(Tables.orders(spark, d).select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey")).count()
      assert(n === expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS c_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
