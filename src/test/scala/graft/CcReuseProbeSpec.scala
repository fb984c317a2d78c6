package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Why the CC loop persists `merged` (LlmOps.connectedComponents): the
  * pointer-jump self-join reads it twice with DIFFERENT required
  * partitionings (a-side joins on `a.label`, b-side on `b.v`), so
  * ReuseExchange cannot dedup the two reads — unpersisted, the edge-join +
  * aggregate subtree executes once per side. These tests pin the plan
  * evidence for both spellings so a future "drop the persist, Spark reuses
  * it" simplification trips here instead of silently doubling per-pass work.
  */
class CcReuseProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // one pass of the CC loop's merged + pointer-jump shape over a toy graph
  private def onePass(persistMerged: Boolean) = {
    import spark.implicits._
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val edges = p.select(col("d1").as("src"), col("d2").as("dst"))
      .unionAll(p.select(col("d2").as("src"), col("d1").as("dst")))
    val labels = edges.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src").as("v"), least(col("src"), col("mn")).as("label"))
    val prop = edges.join(labels, col("src") === col("v"))
      .select(col("dst").as("v"), col("label"), lit(0).as("own"))
    val merged0 = labels.select(col("v"), col("label"), lit(1).as("own"))
      .unionAll(prop)
      .groupBy(col("v"))
      .agg(min(col("label")).as("label"),
        max(when(col("own") === 1, col("label"))).as("own_label"))
    val merged =
      if (persistMerged) merged0.persist(StorageLevel.MEMORY_AND_DISK)
      else merged0
    val jumped = merged.as("a")
      .join(merged.as("b"), col("a.label") === col("b.v"), "left")
      .select(col("a.v").as("v"),
        coalesce(col("b.label"), col("a.label")).as("label"),
        col("a.own_label").as("own_label"))
    jumped.collect()
    val plan = jumped.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    if (persistMerged) merged.unpersist()
    plan
  }

  test("unpersisted merged runs its aggregate subtree once per join side") {
    val plan = onePass(persistMerged = false)
    // the merged aggregate groups by v; each copy plans its own
    // hashpartitioning(v) exchange (a-side then re-shuffles on label /
    // broadcasts). Two such exchanges = the subtree executed twice.
    val mergedAggs = "Exchange hashpartitioning\\(v#".r.findAllIn(plan).size
    assert(mergedAggs >= 2,
      s"expected the merged aggregate duplicated across join sides:\n$plan")
  }

  test("persisted merged is computed once and read from cache on both sides") {
    val plan = onePass(persistMerged = true)
    val cacheScans = "InMemoryTableScan|TableCacheQueryStage".r
      .findAllIn(plan).size
    assert(cacheScans >= 2,
      s"expected both join sides to read merged from cache:\n$plan")
    // and the aggregate's own exchange appears only under the cache's
    // one cached plan, not once per side
    val mergedAggs = "Exchange hashpartitioning\\(v#".r.findAllIn(plan).size
    assert(mergedAggs <= 1,
      s"merged aggregate must not replan per side once cached:\n$plan")
  }
}
