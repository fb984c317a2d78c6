package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's trace→CloudEvent projection re-expressed as a Catalyst
  * column library (reference: pkg/adapter/adapter.go:220-264). Pure
  * built-in expressions — everything stays inside whole-stage codegen, no
  * UDFs, so the transform is a zero-cost Project at any scale.
  */
object CloudEventFns {

  /** P1 — event-type derivation (adapter.go:226-234).
    *
    * Go builds `service.trace.resource.name` with literal dots from
    * possibly-empty segments, lowercases, then `strings.TrimRight(s, ".")`.
    * Consequence: interior empty segments KEEP their dots (`a..c.d`), only
    * trailing dots are trimmed. `concat_ws` skips NULLs but keeps empty
    * strings, so coalescing each segment to "" reproduces the Go zero-value
    * behaviour exactly.
    */
  def eventType(serviceType: Column, traceType: Column,
                resourceType: Column, traceName: Column): Column =
    rtrim(lower(concat_ws(".",
      coalesce(serviceType, lit("")),
      coalesce(traceType, lit("")),
      coalesce(resourceType, lit("")),
      coalesce(traceName, lit("")))), ".")

  /** P2 — subject coalesce (adapter.go:236-240): `resource_name` when it is
    * non-blank after trimming, else `resource_id`. Go treats a missing name
    * as "", hence the NULL-safe coalesce before the blank check.
    */
  def subject(resourceName: Column, resourceId: Column): Column =
    when(trim(coalesce(resourceName, lit(""))) =!= "", resourceName)
      .otherwise(resourceId)

  /** P3 — epoch-milliseconds → timestamp (adapter.go:242, time.UnixMilli). */
  def msToTimestamp(epochMs: Column): Column = timestamp_millis(epochMs)

  /** P4 — whole-record JSON payload (adapter.go:244, event.SetData). */
  def jsonPayload(cols: Column*): Column = to_json(struct(cols: _*))

  /** P6 — extension-map merge (adapter.go:256-261): `K_CE_OVERRIDES` keys
    * overwrite existing extension keys (right-biased). `map_zip_with` +
    * coalesce gives last-wins semantics without depending on the session's
    * `spark.sql.mapKeyDedupPolicy`.
    */
  def mergeExtensions(base: Column, overrides: Column): Column =
    map_zip_with(base, overrides, (_, v1, v2) => coalesce(v2, v1))

  /** P6 helper — a map literal from a Scala Map (the parsed K_CE_OVERRIDES,
    * adapter.go:57-65). */
  def mapLit(m: Map[String, String]): Column =
    if (m.isEmpty) map_from_arrays(array(), array())
    else map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** P7 — CE id is the trace id (adapter.go:222); UUID/time defaults for
    * records missing them (adapter.go:72 WithUUIDs/WithTimeNow). Only use
    * the deterministic branch in oracle-checked queries (SURVEY §7.4).
    */
  def ceId(traceId: Column): Column = coalesce(traceId, expr("uuid()"))
}
