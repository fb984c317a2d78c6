package graft

import org.apache.spark.sql.functions._
import graft.operators.CtsParity

/** Parity-layer queries: the reference's transform/dedup/graph semantics
  * (SURVEY §2.2, §2.5, §1.3) as oracle-checked batch queries over the
  * `events` CTS stand-in table.
  */
object Parity {
  import SparkEntry.Q

  private def ce(s: org.apache.spark.sql.SparkSession, d: String) =
    CtsParity.toCloudEvents(CtsParity.eventsAsTraces(Tables.events(s, d)))

  def queries: Map[String, Q] = Map(
    // P1+P2+P3 — the full CloudEvent projection (adapter.go:220-264).
    "p_ce_transform" -> ((s, d) => {
      ce(s, d).select(col("id"), col("type"), col("subject"), col("time"),
          col("status"), col("code"), col("resourceid"),
          col("region"), col("domain"), col("tenant"))
        .orderBy(col("id").cast("long"))
    }),

    // §2.5 — MERGE idempotency: re-delivered duplicates (window-overlap,
    // adapter.go:93-102) collapse on trace id. Simulated by unioning the
    // feed with itself; dropDuplicates plans as a hash aggregate.
    // Project to the 3 needed columns BEFORE the dedup shuffle — the full
    // row (incl. the props JSON string) must never ride the exchange.
    "p_dedup_merge" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      e.unionAll(e).dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // S4/F1 — incremental time-window scan: count per type inside a poll
    // window [from, to) — the pushed-down predicate of adapter.go:98-100.
    "p_window_scan" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
                col("ts") <  lit("2024-01-20 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("first_ts"),
             max(col("ts")).as("last_ts"))
        .orderBy(col("event_type"))
    }),

    // P3+P4+P6+P7 — the CloudEvent envelope mechanics the transform query
    // doesn't reach: ms-epoch round trip (adapter.go:242), whole-record
    // JSON payload (adapter.go:244), right-biased K_CE_OVERRIDES extension
    // merge (adapter.go:256-261), id assignment (adapter.go:222). All
    // deterministic; one codegen'd Project, no shuffle.
    "p_ce_payload" -> ((s, d) => {
      import graft.functions.CloudEventFns
      val ms = unix_millis(col("ts"))
      val base = map(
        lit("region"), concat(lit("region-"), pmod(col("user_id"), lit(3))),
        lit("env"), lit("prod"))
      val overrides = CloudEventFns.mapLit(Map("env" -> "staging", "team" -> "data"))
      val merged = CloudEventFns.mergeExtensions(base, overrides)
      Tables.events(s, d).select(
        CloudEventFns.ceId(col("event_id").cast("string")).as("id"),
        ms.as("ms"),
        CloudEventFns.msToTimestamp(ms).as("time_restored"),
        CloudEventFns.jsonPayload(
          col("event_id"), col("event_type"), col("user_id")).as("payload"),
        element_at(merged, "region").as("ext_region"),
        element_at(merged, "env").as("ext_env"),
        element_at(merged, "team").as("ext_team"))
        .orderBy(col("id").cast("long"))
    }),

    // K3 — graph node table (neo4j/client.go:10-21), unique on (kind,key).
    "k3_graph_nodes" -> ((s, d) =>
      CtsParity.nodes(ce(s, d))
        .orderBy(col("kind"), col("key"))),

    // K3 — graph edge table, unique on (rel, src_key, dst_key).
    "k3_graph_edges" -> ((s, d) =>
      CtsParity.edges(ce(s, d))
        .orderBy(col("rel"), col("src_key"), col("dst_key"))),

    // Provenance chain — the multi-hop question the reference's Neo4j
    // graph exists to answer (README.md:39-48): ACTION —APPLIED_ON→
    // RESOURCE —MEMBER_OF→ TENANT —LOCATED_AT→ REGION, materialized by
    // joining the edge table against itself along the path and
    // aggregated per (region, tenant). The edge table is built once and
    // persisted; the three path joins shuffle only (rel, src, dst)
    // triples. Oracle computes the same rollup straight off the CE
    // projection (the chain columns are functionally dependent), so the
    // graph-join reconstruction is verified against first principles.
    "k3_chain" -> ((s, d) => {
      // build ONLY the 3 chain relations, filtered BEFORE the dedup
      // exchange (r21, guide §2.3): the full edges() frame distincts all
      // 5 relations and this query then discards WITH_STATUS and
      // PERFORMED_BY — both ACTION-keyed (unique per event, so map-side
      // combine never collapses them): ~2/5 of the exchange's rows were
      // shuffled to be thrown away. The 3-column distinct is identical to
      // edges()'s 5-column one restricted to these rels (kinds are
      // functionally determined by rel — the edges() invariant).
      val e = ce(s, d).select(explode(CtsParity.edgeArray).as("e"))
        .select(col("e.rel").as("rel"), col("e.src_key").as("src_key"),
          col("e.dst_key").as("dst_key"))
        .filter(col("rel").isin("APPLIED_ON", "MEMBER_OF", "LOCATED_AT"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def hop(rel: String, src: String, dst: String) =
        e.filter(col("rel") === rel)
          .select(col("src_key").as(src), col("dst_key").as(dst))
      hop("APPLIED_ON", "action", "resource")
        .join(hop("MEMBER_OF", "resource2", "tenant"),
          col("resource") === col("resource2"))
        .join(hop("LOCATED_AT", "tenant2", "region"),
          col("tenant") === col("tenant2"))
        .groupBy(col("region"), col("tenant"))
        .agg(count_distinct(col("action")).as("n_actions"),
          count_distinct(col("resource")).as("n_resources"))
        .orderBy(col("region"), col("tenant"))
    }),

    // Temporal graph delta — "what changed in the audit graph": edges of
    // the second half of the window vs the first, in ONE scan (the time
    // half rides the explode as a tag → per-edge presence flags →
    // per-relation rollup; a per-half edge build would scan and
    // CE-transform the feed twice). The operational diff a provenance
    // consumer actually reads.
    "k3_graph_delta" -> ((s, d) => {
      val split = lit("2024-01-15 00:00:00").cast("timestamp")
      ce(s, d)
        .select((col("time") < split).cast("long").as("in_a"),
          (col("time") >= split).cast("long").as("in_b"),
          explode(CtsParity.edgeArray).as("e"))
        .groupBy(col("e.rel").as("rel"), col("e.src_key").as("src_key"),
          col("e.dst_key").as("dst_key"))
        .agg(max(col("in_a")).as("a"), max(col("in_b")).as("b"))
        .groupBy(col("rel"))
        .agg(sum(col("a")).as("n_first"), sum(col("b")).as("n_second"),
          sum(when(col("b") === 1 && col("a") === 0, 1L).otherwise(0L)).as("n_added"),
          sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L)).as("n_gone"),
          sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L)).as("n_stable"))
        .orderBy(col("rel"))
    }),

    // K3 fidelity — the EXACT parametrized Cypher MERGE the reference
    // sink executes per event (neo4j/client.go:10-21) with its parameter
    // bindings (client.go:57-68) rendered to JSON: the one reference
    // artifact no graph table replicates is the statement TEXT itself
    // (no Bolt driver jar in the sandbox), so it ships as a deliverable
    // column — these rows are executable verbatim by any Bolt session.
    // One codegen Project over the CE frame, zero shuffle at any scale;
    // the oracle assembles the identical strings, so the wire text is
    // hash-pinned, not eyeballed.
    "k3_cypher" -> ((s, d) =>
      ce(s, d).select(
        col("id"),
        lit(CtsParity.cypherMerge).as("statement"),
        CtsParity.cypherParamsJson.as("params_json"))
        .orderBy(col("id").cast("long"))),

    // Graph centrality over the provenance graph — fixed-point integer
    // PageRank (see CtsParity.pageRank for the determinism + scale story).
    // The kind graph is a DAG (ACTION→RESOURCE→TENANT→REGION is the
    // longest chain, 3 hops), so the rank vector reaches its EXACT fixed
    // point after depth+1 = 4 passes — verified: the DuckDB oracle's r4
    // equals r10 bit-for-bit. 4 passes IS the fixed point; running more
    // buys zero rank drift at ~1.3 s per pass.
    // Top-20 is a TakeOrderedAndProject, not a global sort.
    "k3_pagerank" -> ((s, d) =>
      CtsParity.pageRank(CtsParity.linkPairs(ce(s, d)), iters = 4)
        .orderBy(col("pr_fixed").desc, col("node"))
        .limit(20)
        .select(col("node"), col("pr_fixed"),
          (col("pr_fixed").cast("double") / lit(1.0e9)).as("pr")))
  )

  /** The events→trace mapping (CtsParity.eventsAsTraces) replayed in ANSI
    * SQL. Kept as a CTE fragment shared by the oracle strings. */
  private val traceCte =
    """WITH tr AS (
      |  SELECT CAST(event_id AS VARCHAR) AS trace_id, ts, value,
      |    'web' AS service_type, event_type AS trace_type,
      |    'user' AS resource_type, props->>'$.k' AS trace_name,
      |    CAST(user_id AS VARCHAR) AS resource_id,
      |    CASE WHEN event_type = 'signup' THEN ''
      |         ELSE 'user-' || CAST(user_id AS VARCHAR) END AS resource_name,
      |    CASE WHEN value < 10 THEN 'incident'
      |         WHEN value < 100 THEN 'warning' ELSE 'normal' END AS trace_status,
      |    props->>'$.k' AS code,
      |    'region-' || CAST(user_id % 3 AS VARCHAR) AS region,
      |    'dom-' || CAST(user_id % 5 AS VARCHAR) AS domain,
      |    'ten-' || CAST(user_id % 7 AS VARCHAR) AS tenant
      |  FROM events
      |), ce AS (
      |  SELECT trace_id AS id, 'https://cts.example/v2' AS source,
      |    rtrim(lower(concat_ws('.', service_type, trace_type, resource_type,
      |                          coalesce(trace_name,''))), '.') AS type,
      |    CASE WHEN trim(coalesce(resource_name,'')) <> '' THEN resource_name
      |         ELSE resource_id END AS subject,
      |    ts AS time, trace_status AS status, code,
      |    resource_id AS resourceid, region, "domain", tenant
      |  FROM tr
      |)""".stripMargin

  /** The 5-relation edge fan-out (neo4j/client.go:15-20) as a SQL union
    * over a ce-shaped relation — shared by every graph oracle so the
    * edge spelling can never diverge between them. */
  private def edgeUnion(src: String): String =
    s"""
       |  SELECT 'APPLIED_ON' AS rel, 'ACTION' AS src_kind, id AS src_key,
       |         'RESOURCE' AS dst_kind, resourceid AS dst_key FROM $src
       |  UNION ALL SELECT 'LOCATED_AT', 'TENANT', tenant || '|' || "domain",
       |         'REGION', region FROM $src
       |  UNION ALL SELECT 'MEMBER_OF', 'RESOURCE', resourceid,
       |         'TENANT', tenant || '|' || "domain" FROM $src
       |  UNION ALL SELECT 'WITH_STATUS', 'ACTION', id, 'STATUS', status FROM $src
       |  UNION ALL SELECT 'PERFORMED_BY', 'ACTION', id, 'SUBJECT', subject FROM $src
       |""".stripMargin

  def oracles: Map[String, String] = Map(
    "p_ce_transform" -> (traceCte +
      """
        |SELECT id, type, subject, time, status, code, resourceid,
        |       region, "domain", tenant
        |FROM ce ORDER BY CAST(id AS BIGINT)""".stripMargin),

    "p_dedup_merge" ->
      """WITH doubled AS (
        |  SELECT * FROM events UNION ALL SELECT * FROM events
        |), dedup AS (
        |  SELECT event_type, value FROM (
        |    SELECT event_type, value,
        |           row_number() OVER (PARTITION BY event_id) AS rn
        |    FROM doubled) WHERE rn = 1
        |)
        |SELECT event_type, count(*) AS n, sum(value) AS sum_value
        |FROM dedup GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The merge expectation is stated directly: override keys win ('env' →
    // 'staging'), new keys appear ('team'), untouched keys survive.
    "p_ce_payload" ->
      """SELECT CAST(event_id AS VARCHAR) AS id,
        |  epoch_ms(ts) AS ms,
        |  make_timestamp(epoch_ms(ts) * 1000) AS time_restored,
        |  to_json(struct_pack(event_id := event_id, event_type := event_type,
        |                      user_id := user_id)) AS payload,
        |  'region-' || CAST(user_id % 3 AS VARCHAR) AS ext_region,
        |  'staging' AS ext_env,
        |  'data' AS ext_team
        |FROM events ORDER BY event_id""".stripMargin,

    "p_window_scan" ->
      """SELECT event_type, count(*) AS n, min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "k3_graph_nodes" -> (traceCte +
      """
        |, nodes AS (
        |  SELECT 'REGION' AS kind, region AS key,
        |         CAST(NULL AS TIMESTAMP) AS node_ts,
        |         CAST(NULL AS VARCHAR) AS node_source,
        |         CAST(NULL AS VARCHAR) AS node_type FROM ce
        |  UNION ALL SELECT 'STATUS', status, NULL, NULL, NULL FROM ce
        |  UNION ALL SELECT 'SUBJECT', subject, NULL, NULL, NULL FROM ce
        |  UNION ALL SELECT 'TENANT', tenant || '|' || "domain", NULL, NULL, NULL FROM ce
        |  UNION ALL SELECT 'RESOURCE', resourceid, NULL, NULL, NULL FROM ce
        |  UNION ALL SELECT 'ACTION', id, time, source, type FROM ce
        |)
        |SELECT kind, key, min(node_ts) AS node_ts, min(node_source) AS node_source,
        |       min(node_type) AS node_type
        |FROM nodes GROUP BY kind, key ORDER BY kind, key""".stripMargin),

    // PageRank replayed iteration-by-iteration: the recursion is unrolled
    // into r0..r10 CTEs (no reliance on DuckDB's recursive-CTE aggregate
    // semantics). All arithmetic is the same fixed-point integer math as
    // the Spark plan — integer sums are order-independent, so the two
    // engines agree bit-for-bit with no float-fold discipline needed.
    "k3_pagerank" -> {
      val iterCtes = (1 to 4).map { i =>
        s"""r$i AS (
           |  SELECT v.node,
           |    CAST(150000000 + (85 * coalesce(s.m, 0)) // 100 AS BIGINT) AS pr_fixed
           |  FROM verts v LEFT JOIN (
           |    SELECT l.dst AS node, CAST(sum(r.pr_fixed // l.outdeg) AS BIGINT) AS m
           |    FROM lnk l JOIN r${i - 1} r ON r.node = l.src GROUP BY l.dst) s
           |  ON s.node = v.node)""".stripMargin
      }.mkString(",\n")
      traceCte + s"""
        |, links AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT 'ACTION|' || id AS src, 'RESOURCE|' || resourceid AS dst FROM ce
        |    UNION ALL SELECT 'TENANT|' || tenant || '|' || "domain", 'REGION|' || region FROM ce
        |    UNION ALL SELECT 'RESOURCE|' || resourceid, 'TENANT|' || tenant || '|' || "domain" FROM ce
        |    UNION ALL SELECT 'ACTION|' || id, 'STATUS|' || status FROM ce
        |    UNION ALL SELECT 'ACTION|' || id, 'SUBJECT|' || subject FROM ce)
        |), outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
        |              FROM links GROUP BY src),
        |lnk AS (SELECT l.src, l.dst, o.outdeg
        |        FROM links l JOIN outdeg o ON o.src = l.src),
        |verts AS (SELECT DISTINCT node FROM (
        |  SELECT src AS node FROM links UNION ALL SELECT dst AS node FROM links)),
        |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr_fixed FROM verts),
        |$iterCtes
        |SELECT node, pr_fixed, CAST(pr_fixed AS DOUBLE) / 1000000000.0 AS pr
        |FROM r4 ORDER BY pr_fixed DESC, node LIMIT 20""".stripMargin
    },

    "k3_graph_edges" -> (traceCte + s"""
        |, e AS (${edgeUnion("ce")})
        |SELECT DISTINCT rel, src_kind, src_key, dst_kind, dst_key
        |FROM e ORDER BY rel, src_key, dst_key""".stripMargin),

    // join semantics, not per-row semantics: a tenant LOCATED_AT several
    // regions fans each chain out to all of them — mirror the 3-way edge
    // join exactly
    "k3_chain" -> (traceCte + s"""
        |, e AS (${edgeUnion("ce")}),
        |ed AS (SELECT DISTINCT rel, src_key, dst_key FROM e)
        |SELECT c3.dst_key AS region, c2.dst_key AS tenant,
        |       CAST(count(DISTINCT c1.src_key) AS BIGINT) AS n_actions,
        |       CAST(count(DISTINCT c1.dst_key) AS BIGINT) AS n_resources
        |FROM ed c1
        |JOIN ed c2 ON c2.rel = 'MEMBER_OF'  AND c2.src_key = c1.dst_key
        |JOIN ed c3 ON c3.rel = 'LOCATED_AT' AND c3.src_key = c2.dst_key
        |WHERE c1.rel = 'APPLIED_ON'
        |GROUP BY 1, 2 ORDER BY region, tenant""".stripMargin),

    // statement literal injected verbatim (it contains `$param` markers
    // and newlines — plain SQL string, no interpolation); params JSON is
    // the same fixed-shape concat as the Spark column
    "k3_cypher" -> (traceCte +
      "\nSELECT id,\n  '" + CtsParity.cypherMerge + "' AS statement,\n" +
      """  '{"region":"' || region || '","tenantId":"' || tenant ||
        |  '","domainId":"' || "domain" || '","resourceId":"' || resourceid ||
        |  '","actionId":"' || id || '","timestamp":"' ||
        |  strftime(time, '%Y-%m-%dT%H:%M:%S.%fZ') ||
        |  '","source":"' || source || '","type":"' || type ||
        |  '","status":"' || status || '","subject":"' || subject ||
        |  '"}' AS params_json
        |FROM ce ORDER BY CAST(id AS BIGINT)""".stripMargin),

    "k3_graph_delta" -> (traceCte + s"""
        |, cea AS (SELECT * FROM ce WHERE time <  TIMESTAMP '2024-01-15 00:00:00'),
        |ceb AS (SELECT * FROM ce WHERE time >= TIMESTAMP '2024-01-15 00:00:00'),
        |ea AS (SELECT DISTINCT rel, src_key, dst_key FROM (${edgeUnion("cea")})),
        |eb AS (SELECT DISTINCT rel, src_key, dst_key FROM (${edgeUnion("ceb")})),
        |tag AS (
        |  SELECT rel, src_key, dst_key, 1 AS in_a, 0 AS in_b FROM ea
        |  UNION ALL SELECT rel, src_key, dst_key, 0, 1 FROM eb
        |), fl AS (
        |  SELECT rel, src_key, dst_key, max(in_a) AS a, max(in_b) AS b
        |  FROM tag GROUP BY 1, 2, 3
        |)
        |SELECT rel, CAST(sum(a) AS BIGINT) AS n_first,
        |       CAST(sum(b) AS BIGINT) AS n_second,
        |       CAST(sum(CASE WHEN b = 1 AND a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |       CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gone,
        |       CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_stable
        |FROM fl GROUP BY rel ORDER BY rel""".stripMargin)
  )
}
