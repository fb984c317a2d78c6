package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY §2.7 UDAF surface): the
  * `Aggregator[IN, BUF, OUT]` API — Catalyst plans it as a proper two-phase
  * aggregate (partial reduce → merge), so it scales exactly like a built-in
  * (map-side combine, no per-group row materialization). Used where the
  * combination isn't a single built-in; still pure JVM math, no Python. */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  /** buffer = (Σ value·weight, Σ weight) */
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double = b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
