package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CloudEventFns

/** Unit semantics of the trace→CloudEvent derivations (SURVEY §2.2) against
  * the Go reference behaviour (pkg/adapter/adapter.go:220-264). */
class CloudEventFnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evalType(st: String, tt: String, rt: String, tn: String): String =
    Seq((Option(st), Option(tt), Option(rt), Option(tn)))
      .toDF("st", "tt", "rt", "tn")
      .select(CloudEventFns.eventType(col("st"), col("tt"), col("rt"), col("tn")).as("t"))
      .as[String].head()

  // P1 — Go builds "a.b.c.d" with literal dots then TrimRight("."):
  // interior empty segments KEEP their dots, only trailing dots trimmed
  // (adapter.go:226-234).
  test("P1: full 4-segment type is dotted and lowercased") {
    assert(evalType("ECS", "ApiCall", "Server", "createServer")
      === "ecs.apicall.server.createserver")
  }
  test("P1: interior empty segment keeps its dot (Go parity)") {
    assert(evalType("web", "", "user", "x") === "web..user.x")
  }
  test("P1: trailing empty segments are trimmed") {
    assert(evalType("web", "click", "", "") === "web.click")
  }
  test("P1: all-empty input collapses to empty string") {
    assert(evalType("", "", "", "") === "")
  }
  test("P1: NULL segment behaves like Go zero-value empty string") {
    assert(evalType("web", null, "user", "login") === "web..user.login")
  }

  // P2 — subject = resource_name unless blank after trim, else resource_id
  // (adapter.go:236-240; Go treats missing as "").
  private def evalSubject(name: String, id: String): String =
    Seq((Option(name), Option(id))).toDF("n", "i")
      .select(CloudEventFns.subject(col("n"), col("i")).as("s"))
      .as[String].head()

  test("P2: non-blank name wins") {
    assert(evalSubject("vm-1", "r-9") === "vm-1")
  }
  test("P2: whitespace-only name falls back to id") {
    assert(evalSubject("   ", "r-9") === "r-9")
  }
  test("P2: NULL name falls back to id") {
    assert(evalSubject(null, "r-9") === "r-9")
  }

  // P3 — epoch-ms → timestamp (adapter.go:242, time.UnixMilli).
  test("P3: ms epoch converts with millisecond precision, UTC") {
    val ts = Seq(1704067200123L).toDF("ms")
      .select(CloudEventFns.msToTimestamp(col("ms")).cast("string").as("t"))
      .as[String].head()
    assert(ts === "2024-01-01 00:00:00.123")
  }

  // P4 — payload JSON keeps the struct field order given.
  test("P4: jsonPayload serializes fields in declared order") {
    val j = Seq(("t1", 7L)).toDF("id", "n")
      .select(CloudEventFns.jsonPayload(col("id"), col("n")).as("j"))
      .as[String].head()
    assert(j === """{"id":"t1","n":7}""")
  }

  // P6 — K_CE_OVERRIDES merge is right-biased (adapter.go:256-261: override
  // keys replace existing extension values).
  test("P6: override value wins on key collision, both sides' keys survive") {
    val merged = spark.range(1)
      .select(CloudEventFns.mergeExtensions(
        CloudEventFns.mapLit(Map("a" -> "1", "b" -> "2")),
        CloudEventFns.mapLit(Map("b" -> "X", "c" -> "Y"))).as("m"))
      .select(map_entries(col("m")).as("e"))
      .head().getSeq[Row](0).map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged === Map("a" -> "1", "b" -> "X", "c" -> "Y"))
  }

  // P7 — CE id is the trace id; missing ids get a UUID (adapter.go:222,72).
  test("P7: present trace id passes through; NULL id becomes a UUID") {
    val rows = Seq(Option("trace-1"), None).toDF("id")
      .select(CloudEventFns.ceId(col("id")).as("out")).as[String].collect()
    assert(rows(0) === "trace-1")
    assert(rows(1).matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }
}
