package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the stress-scale invariant checks (StressCheck — the engine-side
  * validation used where the DuckDB oracle is disk-infeasible, see the
  * object's doc) runnable and green at test scale, so they can't rot
  * between stress runs. */
class StressCheckSpec extends AnyFunSuite {
  test("all stress invariants hold at test SF") {
    val rs = StressCheck.run(TestSpark.spark, TestSpark.sfDir)
    assert(rs.nonEmpty)
    val failed = rs.filter(!_._2)
    assert(failed.isEmpty,
      failed.map { case (n, _, d) => s"$n: $d" }.mkString("; "))
  }
}
