package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY §2.7 extension layer) over the
  * TPC-H-ish testdata. Conventions:
  *  - every query ends in a deterministic ORDER BY with a unique tiebreak
  *    so the DuckDB hash-compare is order-stable;
  *  - money is `double` at rest (FIXTURES.md); unordered money sums go
  *    through DECIMAL(38,2) (exact, order-independent, overflow-safe far
  *    beyond 100 TB row counts) and cast back to double at the end;
  *  - dimension tables are broadcast; fact-fact joins shuffle on the join
  *    key and rely on AQE for skew/partition sizing at scale.
  */
object Relational {
  import SparkEntry.Q

  def queries: Map[String, Q] = Map(
    // §2.7 aggregations — TPC-H Q1-style full scan aggregate. Partial
    // aggregation (map-side combine) is free from Catalyst; at 100 TB this
    // is one scan + one 6-group shuffle.
    "q1_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.7 filter + scalar agg (TPC-H Q6 shape) — predicate pushed to the
    // parquet scan; zero shuffle.
    "q6_revenue_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"),
             count(lit(1)).as("n"))
    }),

    // §2.7 joins — fact⋈fact⋈broadcast-dim chain with group-by (TPC-H Q3
    // shape). customer/nation are broadcast; lineitem⋈orders shuffles on
    // the order key only once.
    "q3_revenue_topn" -> ((s, d) => {
      val c = broadcast(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"))
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // §2.7 set ops — union/intersect/except over the distinct customer sets
    // of two order years. Each set op plans as a shuffle on the full row —
    // the minimum; inputs are pre-distinct projections so the shuffled
    // payload is one bigint column.
    "q_set_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def custOf(year: Int) = o
        .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
                col("o_orderdate") <  lit(s"${year + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      val a = custOf(1995); val b = custOf(1996)
      def tag(df: org.apache.spark.sql.DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      tag(a.union(b).distinct(), "union")
        .unionAll(tag(a.intersect(b), "intersect"))
        .unionAll(tag(a.except(b), "except"))
        .orderBy(col("op"))
    }),

    // §2.7 semi/anti joins — customers with vs without orders, per segment.
    // left_semi/left_anti ship no payload from the right side; at scale the
    // orders side reduces to its join key before the shuffle.
    "q_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val ok = Tables.orders(s, d).select(col("o_custkey"))
      def side(joinType: String, tagV: String) =
        c.join(ok, c("c_custkey") === ok("o_custkey"), joinType)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
          .select(lit(tagV).as("side"), col("c_mktsegment"), col("n"))
      side("left_semi", "with_orders")
        .unionAll(side("left_anti", "without_orders"))
        .orderBy(col("side"), col("c_mktsegment"))
    }),

    // §2.7 outer join + histogram — orders-per-customer incl. zero-order
    // customers. Orders pre-aggregates to (o_custkey, n) before the join,
    // so the join shuffle carries |distinct custkey| rows instead of
    // |orders|, and the left join's null side becomes a 0-coalesce.
    "q_outer_hist" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"))
      val perCust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_ord"))
      c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left")
        .select(coalesce(col("n_ord"), lit(0L)).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_orders"))
    }),

    // §2.7 rollup — region→nation supplier account totals with subtotal and
    // grand-total rows (grouping-sets aggregate: one shuffle, rollup rows
    // synthesized by Catalyst's Expand).
    "q_rollup" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val nat = broadcast(Tables.nation(s, d))
      val reg = broadcast(Tables.region(s, d))
      sup.join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(col("s_acctbal")).as("sum_acctbal"), count(lit(1)).as("n"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
                coalesce(col("n_name"), lit("ALL")).as("nation_name"),
                col("sum_acctbal"), col("n"))
        .orderBy(col("region_name"), col("nation_name"))
    }),

    // §2.7 cube — all grouping combinations of the lineitem flag pair.
    "q_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                col("sum_qty"), col("n"))
        .orderBy(col("rf"), col("ls"))
    }),

    // §2.7 scalar string/math functions — pure codegen'd Project, no shuffle.
    "q_scalar_fns" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        // casts: Spark length/size are INT, DuckDB's are BIGINT — align on
        // BIGINT so the driver's typed hash compare matches (r01 failure)
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 8).as("name_pfx"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"),
        size(split(col("p_name"), " ")).cast("long").as("name_words"),
        lpad(col("p_brand"), 12, "#").as("brand_pad"),
        abs(col("p_retailprice") - 1000.0).as("price_dev"),
        sqrt(col("p_size").cast("double")).as("size_sqrt"),
        floor(col("p_retailprice")).as("price_floor"))
        .orderBy(col("p_partkey"))
    }),

    // §2.7 date/time functions over orders.
    "q_date_fns" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.7 exact distinct aggregation — count_distinct expands to a
    // two-phase aggregate; keys stay partitioned on the group key.
    // Money is summed in DECIMAL: double addition is order-dependent and
    // Spark's partial-agg merge order differs from DuckDB's, so a double
    // sum is not bit-stable (r01 hash failure). Decimal addition is exact
    // and order-independent; the final cast back to double is a single
    // well-defined rounding both engines share. Input cast is (38,2) so the
    // sum never overflows-to-NULL in non-ANSI mode (r02 ADVICE) — Spark
    // keeps a (38,2) sum type, enough for ~1e31 rows of 1e6-scale prices.
    "q_agg_distinct" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(count_distinct(col("o_custkey")).as("n_cust"),
             count(lit(1)).as("n"),
             sum(col("o_totalprice").cast("decimal(38,2)")).cast("double").as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // §2.7 approximate distinct (HLL) — DuckDB's approx sketch differs, so
    // the oracle checks a derived deterministic property instead: the HLL
    // estimate at rsd=0.01 must land within 5% of the exact count (it is
    // deterministic for a given input, so the boolean is hash-stable).
    // Scale path: approx_count_distinct is mergeable, single pass,
    // constant memory per group — the 100 TB answer to count_distinct.
    // NOTE (r02 ADVICE): the exact count_distinct alongside the sketch is
    // oracle scaffolding only — a production plan would run the approx
    // aggregate alone; its bench cost here includes the exact pass.
    // §2.7 scalar JSON functions — schema-on-read over the events props
    // payload: get_json_object path extraction and from_json with an
    // explicit schema, both codegen'd in one Project.
    "q_json_fns" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("k_typed"),
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"))
        .orderBy(col("event_id"))
    }),

    // §2.7 grouping sets — explicit set list (finer control than rollup/
    // cube): totals by (region, nation), by region, and grand total, one
    // Expand + one shuffle.
    "q_grouping_sets" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
      val nat = broadcast(Tables.nation(s, d))
      val reg = broadcast(Tables.region(s, d))
      sup.join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupingSets(
          Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
          col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
                coalesce(col("n_name"), lit("ALL")).as("nation_name"),
                col("n"))
        .orderBy(col("region_name"), col("nation_name"))
    }),

    // §2.7 percentiles — exact interpolated percentile (both engines use
    // the same linear-interpolation definition; the checker's 1e-9
    // relative float tolerance absorbs last-bit interpolation drift).
    "q_percentile" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(o_totalprice, 0.25)").as("p25"),
             expr("percentile(o_totalprice, 0.5)").as("p50"),
             expr("percentile(o_totalprice, 0.95)").as("p95"),
             count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // §2.7 array functions + agg-to-array — per-order line numbers as a
    // sorted array (collect_list alone is order-nondeterministic;
    // sort_array pins it), with size/element/contains probes.
    "q_array_fns" -> ((s, d) => {
      // ONE exchange serves both keyed operations (r21, guide §2.4): the
      // aggregate and the final ORDER BY share the l_orderkey key, so
      // range-partitioning the SKINNY input (two numeric columns) up
      // front lets the aggregate run exchange-free (RangePartitioning
      // clusters equal keys) and the global sort collapse to a local
      // sort — where the former plan hash-exchanged the collect_list
      // partials AND range-exchanged the rendered CSV output rows.
      // Result identical: partitioning changes placement, not content.
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"))
        .repartitionByRange(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
        .select(
          col("l_orderkey"),
          // rendered as a canonical string: the driver's hash compare (and
          // pandas) can't equality-test raw array cells
          array_join(col("lines"), ",").as("lines_csv"),
          size(col("lines")).cast("long").as("n_lines"),
          element_at(col("lines"), 1).as("first_line"),
          array_contains(col("lines"), 1).as("has_line1"))
        .orderBy(col("l_orderkey"))
    }),

    // §2.7 UDAF — typed Aggregator (functions.udaf): quantity-weighted mean
    // price per return flag. Plans as a normal two-phase aggregate with
    // map-side combine — the custom-aggregate path that scales.
    "q_custom_agg" -> ((s, d) => {
      val wm = udaf(graft.functions.WeightedMean)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(wm(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
             count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // NB: the approx and exact aggregates run as SEPARATE aggregations
    // joined on the tiny group key. In one agg, Catalyst's distinct
    // rewrite regroups by (priority, custkey) and then materializes the
    // rsd=0.01 HLL buffer (~1.6k longs) PER DISTINCT PAIR — hundreds of
    // thousands of 13 KB sketches (measured 65 s at sf0.1 vs ~2 s split).
    // §2.7 pivot: long→wide with EXPLICIT pivot values — no
    // distinct-collect pre-job, and the plan is a single partial-
    // aggregatable hash aggregate over (year × 5 conditional counts),
    // exactly the conditional-aggregation shape the oracle spells out.
    "q_pivot" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .groupBy(col("o_year"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("o_year"),
          col("1-URGENT").as("p_urgent"), col("2-HIGH").as("p_high"),
          col("3-MEDIUM").as("p_medium"), col("4-NOT SPECIFIED").as("p_notspec"),
          col("5-LOW").as("p_low"))
        .orderBy(col("o_year"))
    }),

    // §2.7 statistical aggregates — second-moment family (stddev/var/
    // corr/covar). All partial+final mergeable (sum of squares/cross
    // products), so one scan + one 3-group shuffle at any scale.
    "q_stats_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          stddev_samp(col("l_quantity")).as("sd_qty"),
          var_samp(col("l_quantity")).as("var_qty"),
          stddev_pop(col("l_discount")).as("sdp_disc"),
          corr(col("l_quantity"), col("l_extendedprice")).as("corr_qp"),
          covar_samp(col("l_quantity"), col("l_extendedprice")).as("covar_qp"))
        .orderBy(col("l_returnflag"))
    }),

    // §2.7 unpivot (melt, wide→long) — the inverse of q_pivot: per-priority
    // measures become (measure, value) rows. Unpivot is a zero-shuffle
    // Expand over an already-aggregated frame; money goes through the
    // DECIMAL sum convention so the doubles compare exactly.
    "q_unpivot" -> ((s, d) => {
      val agg = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("double").as("n_orders"),
          sum(col("o_totalprice").cast("decimal(38,2)")).cast("double").as("total_price"))
      agg.unpivot(Array(col("o_orderpriority")),
          Array(col("n_orders"), col("total_price")), "measure", "value")
        .orderBy(col("o_orderpriority"), col("measure"))
    }),

    // §2.7 correlated subqueries through the SQL surface: EXISTS plans as
    // a left-semi join, NOT EXISTS as a left-anti join, and the scalar
    // subquery as a one-row broadcast — all three decorrelated by
    // Catalyst into shuffle-free-or-single-shuffle joins (no per-row
    // re-execution anywhere, the property that keeps this viable at scale).
    "q_exists" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("graft_customer")
      Tables.orders(s, d).createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT c_custkey, c_name FROM graft_customer c
          |WHERE EXISTS (SELECT 1 FROM graft_orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > (SELECT 1.5 * avg(o_totalprice)
          |                                      FROM graft_orders))
          |  AND NOT EXISTS (SELECT 1 FROM graft_orders o2
          |                  WHERE o2.o_custkey = c.c_custkey
          |                    AND o2.o_orderpriority = '1-URGENT')
          |ORDER BY c_custkey""".stripMargin)
    }),

    "q_approx_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val approx = o.groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey"), 0.01).as("approx_cust"),
             count(lit(1)).as("n"))
      val exact = o.groupBy(col("o_orderpriority").as("prio"))
        .agg(count_distinct(col("o_custkey")).as("n_cust_exact"))
      approx.join(broadcast(exact), col("o_orderpriority") === col("prio"))
        .select(col("o_orderpriority"),
                col("n_cust_exact"), col("n"),
                (abs(col("approx_cust") - col("n_cust_exact")) <=
                  col("n_cust_exact") * 0.05).as("approx_within_5pct"))
        .orderBy(col("o_orderpriority"))
    }),

    // Approximate percentile (mergeable quantile sketch): the exact
    // `percentile` buffers EVERY group value in the aggregation buffer —
    // disqualifying at 100 TB — while approx_percentile keeps a bounded
    // sketch that partial-aggregates map-side and merges. Oracle pattern
    // as q_approx_distinct: exact quantile is the hash-checked answer, the
    // sketch result is asserted within tolerance (a sketch value itself is
    // engine-specific and not hash-comparable).
    "q_approx_percentile" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val approx = o.groupBy(col("o_orderpriority"))
        .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap50"),
             count(lit(1)).as("n"))
      val exact = o.groupBy(col("o_orderpriority").as("prio"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("p50_exact"))
      approx.join(broadcast(exact), col("o_orderpriority") === col("prio"))
        .select(col("o_orderpriority"), col("p50_exact"), col("n"),
          (abs(col("ap50") - col("p50_exact")) <= col("p50_exact") * 0.05)
            .as("approx_within_5pct"))
        .orderBy(col("o_orderpriority"))
    }),

    // Skew-safe aggregation (SURVEY §4): the same group-by answer computed
    // through Scale.saltedAgg's two-phase (key, salt) → key plan. The
    // events table has a handful of event types over millions of rows —
    // the classic hot-key shape where a direct shuffle sends a whole key
    // to one reducer; salting spreads each hot key over 32 buckets of
    // map-side partials first, then merges 5×32 tiny rows. The oracle is
    // the DIRECT aggregate: the salted plan must be answer-identical.
    "q_salted_agg" -> ((s, d) => {
      graft.operators.Scale.saltedAgg(
        Tables.events(s, d),
        col("event_type"), col("event_id"), buckets = 32,
        aggs = Seq(
          ("n", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
          ("sum_value", sum(col("value")), (c: org.apache.spark.sql.Column) => sum(c)),
          ("max_value", max(col("value")), (c: org.apache.spark.sql.Column) => max(c))),
        keyName = "event_type")
        .orderBy(col("event_type"))
    }),

    // Co-located join via bucketing (SURVEY §4, Scale.writeBucketed): both
    // sides written bucketed+sorted on the join key, then joined WITHOUT a
    // shuffle — the exchange is paid once at write time, never again at
    // read (the pre-shuffle trade every 100 TB warehouse leans on; at
    // scale the write is the ingest job, the join is every query after).
    // The oracle is the plain join — bucketing must not change the answer.
    "q_bucketed_join" -> ((s, d) => {
      // ingest ONCE per (session, sf dir) — the design being measured is
      // pay-the-exchange-at-write-time, so repeated query builds (Bench
      // samples) must time only the shuffle-free join, not re-pay the
      // write. The dir rides in the table name so a session that switches
      // SF dirs never reads a stale table: the sanitized path keeps the
      // tag readable, and the appended MD5 of the RAW path keeps it
      // collision-free (sanitizing alone is non-injective — `sf0.1` and
      // `sf0_1` both sanitize to `sf0_1` and would silently serve each
      // other's data; a 32-bit hash alone could collide between dirs).
      // Single-session assumption: the in-memory catalog + warehouse dir
      // are not shared across sessions.
      val tag = d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
        java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val ordersTbl = s"graft_orders_b_$tag"
      val lineitemTbl = s"graft_lineitem_b_$tag"
      if (!s.catalog.tableExists(ordersTbl))
        graft.operators.Scale.writeBucketed(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
          ordersTbl, "o_orderkey", 16)
      if (!s.catalog.tableExists(lineitemTbl))
        graft.operators.Scale.writeBucketed(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
          lineitemTbl, "l_orderkey", 16)
      val o = s.table(ordersTbl)
      val l = s.table(lineitemTbl)
      // merge hint: at oracle/bench SF the dim side is broadcastable and
      // Catalyst would skip the bucket join; force the SMJ to exercise the
      // path that matters at 100 TB (both sides huge, neither broadcasts —
      // bucketed scans already satisfy its distribution+order, so the join
      // plans with NO exchange and NO sort)
      l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // Skew-safe fact⋈dim join (SURVEY §4, Scale.saltedJoin): the fact side
    // salts its hot key, the dim side replicates once per salt — a hot
    // partkey spreads over 8 reducers instead of hammering one. The
    // oracle is the PLAIN join aggregate: salting must not change the
    // answer. (At this SF Catalyst would broadcast the dim and no skew
    // exists — the row proves answer-equality of the rewrite, the shape
    // it rewrites FOR is the 100 TB fact⋈fact case AQE can't always fix.)
    // Bloom semi-join reduction: lineitem is pruned map-side against a
    // bloom sketch of the (selective) supplier key set before the join;
    // false positives die in the join, so the answer is hash-identical
    // to the plain-join oracle (Scale.bloomPrune for the 100 TB story).
    "q_bloom_join" -> ((s, d) => {
      val dim = Tables.supplier(s, d)
        .filter(col("s_nationkey") === 3)
        .select(col("s_suppkey"), col("s_name"))
      val fact = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val pruned = graft.operators.Scale.bloomPrune(
        fact, col("l_suppkey"), dim, col("s_suppkey"), expectedItems = 1000L)
      pruned.join(dim, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // NOT IN with a NULL-bearing subquery — the classic three-valued-
    // logic trap: one NULL in the IN-list makes `x NOT IN (...)` UNKNOWN
    // for every non-matching x, so the predicate keeps only rows where
    // the comparison is definitively true of an EMPTY certainty set —
    // here the NULL is planted (orderkey 1007's custkey nulled) in a
    // RESTRICTED key list (orderkey < 2000) so the two branches visibly
    // diverge: NOT IN returns 0 (the NULL poisons every non-match into
    // UNKNOWN) while NOT EXISTS, which ignores NULLs, returns the
    // intuitive hundreds. Catalyst plans the former as a null-aware
    // anti join. Both engines must agree on BOTH numbers.
    "q_not_in_null" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_nin")
      Tables.customer(s, d).createOrReplaceTempView("graft_customer_nin")
      s.sql(s"""
        |WITH ks AS (SELECT CASE WHEN o_orderkey % 1000 = 7 THEN CAST(NULL AS BIGINT)
        |                        ELSE o_custkey END AS k
        |            FROM graft_orders_nin WHERE o_orderkey < 2000)
        |SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n
        |FROM graft_customer_nin WHERE c_custkey NOT IN (SELECT k FROM ks)
        |UNION ALL
        |SELECT 'not_exists', CAST(count(*) AS BIGINT)
        |FROM graft_customer_nin c
        |WHERE NOT EXISTS (SELECT 1 FROM ks WHERE ks.k = c.c_custkey)
        |ORDER BY variant""".stripMargin)
    }),

    // Mergeable-sketch rollup — the property that makes approximate
    // distinct-counting work at 100 TB: per-(type, day) HLL sketches are
    // built ONCE (pre-aggregation), then merged upward with
    // hll_union_agg without touching the raw data again — the two-level
    // cube/rollup pattern every metrics store runs. (approx_count_
    // distinct alone cannot express this: its partial state is not a
    // reusable column.) The sketched entity is the ACTIVE-DAY set, whose
    // cardinality is bounded by the feed's date window (~30) at EVERY
    // scale factor, so the datasketches HLL stays in sparse exact mode
    // and the estimate equals the exact count — verified against a plain
    // COUNT(DISTINCT) oracle at sf0.01 AND sf0.1 (a user_id sketch
    // already leaves sparse mode at sf0.1: estimate 1488 vs 1500).
    "q_hll_rollup" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        // datediff casts to DATE, which already truncates to the
        // session-tz (UTC) day — same day integer the oracle groups on
        .withColumn("day", datediff(col("ts"), lit("1970-01-01").cast("date")))
        // NO null filter here: a NULL user forms its own group, so its
        // events and days still reach n_events/n_days — matching the
        // oracle's count(*)/count(DISTINCT day) over the WHOLE feed.
        // Only n_users skips the NULL group, via count(user_id) below
        // (COUNT(col) ignores NULLs = the oracle's COUNT(DISTINCT
        // user_id) semantics). A NULL-bearing feed now agrees on all
        // three columns instead of only by luck of clean testdata.
        .groupBy(col("event_type"), col("user_id"))
        .agg(expr("hll_sketch_agg(day)").as("sk"), count(lit(1)).as("n"))
      perUser.groupBy(col("event_type"))
        .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)").as("n_days"),
          count(col("user_id")).as("n_users"),
          sum(col("n")).as("n_events"))
        .orderBy(col("event_type"))
    }),

    // Data-quality constraint audit — the admission gate a pipeline runs
    // before trusting an ingest batch: null-key, duplicate-key, value-
    // range and referential-integrity violation COUNTS in one pass. The
    // row-local checks ride a single aggregate over the scan (conditional
    // sums — no per-check jobs); the FK check is one left-anti join
    // against the (broadcastable) key side. The clean testdata is salted
    // with deterministic planted violations so the audit demonstrably
    // catches each class.
    "q_quality_audit" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val mutated = o.select(col("o_orderkey"),
          when(pmod(col("o_orderkey"), lit(1000)) === 7, lit(null).cast("long"))
            .when(pmod(col("o_orderkey"), lit(1000)) === 13, col("o_custkey") + 10000000L)
            .otherwise(col("o_custkey")).as("o_custkey"),
          when(pmod(col("o_orderkey"), lit(1000)) === 17, -col("o_totalprice"))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
        .unionAll(o.filter(col("o_orderkey") < 100))
      val rowLocal = mutated.agg(
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        (count(lit(1)) - count_distinct(col("o_orderkey"))).as("dup_orderkey"),
        sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("nonpositive_price"))
      val fk = mutated.filter(col("o_custkey").isNotNull)
        .join(Tables.customer(s, d).select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
      rowLocal.selectExpr(
          "stack(3, 'null_custkey', null_custkey, 'dup_orderkey', dup_orderkey, " +
            "'nonpositive_price', nonpositive_price) AS (check_name, n_bad)")
        .unionAll(fk.select(lit("fk_orphan_custkey").as("check_name"),
          col("n").as("n_bad")))
        .orderBy(col("check_name"))
    }),

    // Z-order (Morton) clustering key: the interleave arithmetic behind
    // Scale.writeZOrdered, surfaced as an oracle row (per z-prefix bucket:
    // row count + z extent). Stats ride a broadcast one-row frame — the
    // plan is scan → project → hash agg, no collect. The file-skipping
    // payoff of the layout itself is proven in ScaleSpec (footer min/max
    // pruning vs a linear sort), which an engine-vs-engine value compare
    // can't express.
    "q_zorder" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("user_id"), col("value"))
      val st = e.agg(min(col("user_id")).as("mnu"), max(col("user_id")).as("mxu"),
        min(col("value")).as("mnv"), max(col("value")).as("mxv"))
      val z = graft.operators.Scale.zValue(Seq(
        (col("user_id"), col("mnu"), col("mxu")),
        (col("value"), col("mnv"), col("mxv"))), bits = 16)
      e.crossJoin(broadcast(st))
        .select(z.as("z"))
        .groupBy(shiftright(col("z"), 24).as("z_bucket"))
        .agg(count(lit(1)).as("n"), min(col("z")).as("z_min"), max(col("z")).as("z_max"))
        .orderBy(col("z_bucket"))
    }),

    "q_salted_join" -> ((s, d) => {
      val joined = graft.operators.Scale.saltedJoin(
        Tables.lineitem(s, d).select(col("l_partkey"), col("l_quantity")),
        Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey"), col("p_partkey"),
        saltSource = col("l_quantity"), buckets = 8)
      joined.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q6_revenue_filter" ->
      """SELECT sum(l_extendedprice * l_discount) AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q3_revenue_topn" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |             AND o_orderdate <  TIMESTAMP '1996-01-01'),
        |     b AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |             AND o_orderdate <  TIMESTAMP '1997-01-01')
        |SELECT * FROM (
        |  SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM a UNION SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'intersect', count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'except', count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |) ORDER BY op""".stripMargin,

    "q_semi_anti" ->
      """SELECT * FROM (
        |  SELECT 'with_orders' AS side, c_mktsegment, count(*) AS n
        |  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY c_mktsegment
        |  UNION ALL
        |  SELECT 'without_orders', c_mktsegment, count(*)
        |  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY c_mktsegment
        |) ORDER BY side, c_mktsegment""".stripMargin,

    "q_outer_hist" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |       coalesce(n_name, 'ALL') AS nation_name,
        |       sum(s_acctbal) AS sum_acctbal, count(*) AS n
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_scalar_fns" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  length(p_name) AS name_len,
        |  substr(p_name, 1, 8) AS name_pfx,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
        |  len(string_split(p_name, ' ')) AS name_words,
        |  lpad(p_brand, 12, '#') AS brand_pad,
        |  abs(p_retailprice - 1000.0) AS price_dev,
        |  sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_fns" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dom,
        |  quarter(o_orderdate) AS qtr,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_json_fns" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k_path,
        |  CAST(props->>'$.k' AS BIGINT) AS k_typed,
        |  CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |       coalesce(n_name, 'ALL') AS nation_name,
        |       count(*) AS n
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        |ORDER BY region_name, nation_name""".stripMargin,

    "q_percentile" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.95) AS p95,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_array_fns" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS lines_csv,
        |  CAST(len(list_sort(list(l_linenumber))) AS BIGINT) AS n_lines,
        |  list_sort(list(l_linenumber))[1] AS first_line,
        |  list_contains(list(l_linenumber), 1) AS has_line1
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_custom_agg" ->
      """SELECT l_returnflag,
        |  sum(l_extendedprice * l_quantity) / sum(l_quantity) AS wavg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_approx_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_cust_exact,
        |  count(*) AS n,
        |  TRUE AS approx_within_5pct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
        |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
        |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
        |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
        |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
        |FROM orders GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q_stats_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  stddev_samp(l_quantity) AS sd_qty,
        |  var_samp(l_quantity) AS var_qty,
        |  stddev_pop(l_discount) AS sdp_disc,
        |  corr(l_quantity, l_extendedprice) AS corr_qp,
        |  covar_samp(l_quantity, l_extendedprice) AS covar_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_unpivot" ->
      """WITH a AS (
        |  SELECT o_orderpriority, CAST(count(*) AS DOUBLE) AS n_orders,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'n_orders' AS measure, n_orders AS value FROM a
        |UNION ALL
        |SELECT o_orderpriority, 'total_price' AS measure, total_price AS value FROM a
        |ORDER BY o_orderpriority, measure""".stripMargin,

    "q_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > (SELECT 1.5 * avg(o_totalprice) FROM orders))
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_approx_percentile" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50_exact,
        |  count(*) AS n,
        |  TRUE AS approx_within_5pct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the direct aggregate — the salted two-phase plan must match it
    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n, sum(value) AS sum_value,
        |       max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the plain join — the bucketed shuffle-free plan must match it
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the plain join — the salted replicated-dim plan must match it
    "q_salted_join" ->
      """SELECT p_brand, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_bloom_join" ->
      """SELECT s_suppkey, s_name, count(*) AS n,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin,

    "q_not_in_null" ->
      """WITH ks AS (SELECT CASE WHEN o_orderkey % 1000 = 7 THEN CAST(NULL AS BIGINT)
        |                        ELSE o_custkey END AS k
        |            FROM orders WHERE o_orderkey < 2000)
        |SELECT 'not_in' AS variant, CAST(count(*) AS BIGINT) AS n
        |FROM customer WHERE c_custkey NOT IN (SELECT k FROM ks)
        |UNION ALL
        |SELECT 'not_exists', CAST(count(*) AS BIGINT)
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM ks WHERE ks.k = c.c_custkey)
        |ORDER BY variant""".stripMargin,

    "q_hll_rollup" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_quality_audit" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |), m AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 1000 = 7 THEN NULL
        |         WHEN o_orderkey % 1000 = 13 THEN o_custkey + 10000000
        |         ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 1000 = 17 THEN -o_totalprice
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM o
        |  UNION ALL SELECT * FROM o WHERE o_orderkey < 100
        |), rl AS (
        |  SELECT
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey,
        |    CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price
        |  FROM m
        |), fk AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM m
        |  WHERE o_custkey IS NOT NULL
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        |)
        |SELECT 'dup_orderkey' AS check_name, dup_orderkey AS n_bad FROM rl
        |UNION ALL SELECT 'fk_orphan_custkey', n FROM fk
        |UNION ALL SELECT 'nonpositive_price', nonpositive_price FROM rl
        |UNION ALL SELECT 'null_custkey', null_custkey FROM rl
        |ORDER BY check_name""".stripMargin,

    // the same 16-bit min-max normalize + bit interleave, spelled in SQL;
    // the single multiply-then-divide per column is IEEE-bit-stable
    "q_zorder" -> {
      val interleave = (0 until 16).flatMap(i => Seq(
          s"(((su >> $i) & 1) << ${2 * i})",
          s"(((sv >> $i) & 1) << ${2 * i + 1})"))
        .mkString(" | ")
      s"""WITH st AS (
         |  SELECT CAST(min(user_id) AS DOUBLE) AS mnu, CAST(max(user_id) AS DOUBLE) AS mxu,
         |         CAST(min(value) AS DOUBLE) AS mnv, CAST(max(value) AS DOUBLE) AS mxv
         |  FROM events),
         |sc AS (
         |  SELECT CAST(CASE WHEN mxu = mnu THEN 0
         |              ELSE trunc((CAST(user_id AS DOUBLE) - mnu) * 65535.0 / (mxu - mnu))
         |              END AS BIGINT) AS su,
         |         CAST(CASE WHEN mxv = mnv THEN 0
         |              ELSE trunc((CAST(value AS DOUBLE) - mnv) * 65535.0 / (mxv - mnv))
         |              END AS BIGINT) AS sv
         |  FROM events, st),
         |z AS (SELECT $interleave AS z FROM sc)
         |SELECT z >> 24 AS z_bucket, count(*) AS n,
         |       min(z) AS z_min, max(z) AS z_max
         |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin
    }
  )
}
