package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic relational coverage (SURVEY §2 coverage checklist: projection,
  * filter, joins incl. broadcast/semi/anti, aggregation, window, sort/top-k,
  * set ops, scalar functions, event-time windowing).
  *
  * Float discipline: every double SUM is quantized to integer units
  * (round(x·10⁴) summed as BIGINT, divided back) so partial-aggregation
  * order — Spark's map-side combine vs DuckDB's sequential scan — cannot
  * produce last-bit drift. The quantized product is computed from identical
  * double inputs in both engines, so the intermediate is bit-identical.
  */
object RelationalQueries {

  /** revenue in 1e-4 units, exact under reordering. */
  private val revInt = "CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)"

  val all: Seq[Q] = Seq(

    // TPC-H Q1-style pricing summary: scan-local partial agg, 4-way shuffle.
    Q("q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |       round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0, 2) AS sum_qty,
         |       round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 2) AS sum_base,
         |       round(sum($revInt) / 10000.0, 4) AS sum_disc_price,
         |       count(*) AS n
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      table(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus") // (rollup variant: q_rollup_pricing)
        .agg(
          round(sum(round(col("l_quantity") * 100, 0).cast("long")) / 100.0, 2).as("sum_qty"),
          round(sum(round(col("l_extendedprice") * 100, 0).cast("long")) / 100.0, 2).as("sum_base"),
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0).cast("long")) / 10000.0, 4).as("sum_disc_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ROLLUP aggregation — the grouping-sets member of the standard
    // catalog (SURVEY §2 checklist notes the reference has none; a
    // warehouse user expects it). One pass: Spark expands the grouping
    // sets BEFORE the partial aggregate (Expand → hash agg), so the
    // subtotals and grand total cost one shuffle, not one job per
    // level. Group columns are non-null in this corpus, so the ALL
    // coalescing is unambiguous.
    Q("q_rollup_pricing",
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rflag,
         |       coalesce(l_linestatus, 'ALL') AS lstatus,
         |       count(*) AS n,
         |       round(sum($revInt) / 10000.0, 4) AS revenue
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY rflag, lstatus""".stripMargin) { (spark, dir) =>
      table(spark, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
            .cast("long")) / 10000.0, 4).as("revenue"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("revenue"))
        .orderBy("rflag", "lstatus")
    },

    // INTERSECT / EXCEPT — the set-op members the reference lacks
    // (SURVEY §2 checklist: "No intersect/except"). Customers who
    // ordered in BOTH halves of 1995, minus those who ever placed a
    // high-value order. Spark plans these as left-semi/anti joins over
    // the distinct key — compact single-column shuffles.
    Q("q_set_ops",
      """SELECT c_custkey FROM (
        |  (SELECT o_custkey AS c_custkey FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
        |   INTERSECT
        |   SELECT o_custkey FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |)
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      val o = table(spark, dir, "orders")
      def custIn(lo: String, hi: String) = o
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf(lo)) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf(hi)))
        .select(col("o_custkey").as("c_custkey"))
      custIn("1995-01-01 00:00:00", "1995-07-01 00:00:00")
        .intersect(custIn("1995-07-01 00:00:00", "1996-01-01 00:00:00"))
        .except(o.filter(col("o_totalprice") > 400000)
          .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    },

    // TPC-H Q3-style top-k revenue: 3-way join, group, TakeOrderedAndProject.
    Q("q3_topk_revenue_join",
      s"""SELECT o.o_orderkey, c.c_mktsegment,
         |       round(sum($revInt) / 10000.0, 4) AS revenue
         |FROM customer c
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |GROUP BY o.o_orderkey, c.c_mktsegment
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (spark, dir) =>
      val c = table(spark, dir, "customer")
      val o = table(spark, dir, "orders")
      val l = table(spark, dir, "lineitem")
      // pre-aggregate the fact table BEFORE the join: the join input drops
      // from |lineitem| rows to |orders| groups (the o_orderkey grouping
      // commutes with the 1:1 orders/customer joins). Orders and customer
      // are fact-scale in TPC-H, so neither is FORCED to broadcast: under
      // the threshold the planner broadcasts them anyway; past it both
      // joins degrade to key-shuffles over the already-aggregated
      // |orders|-sized stream
      val rev = l.groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0).cast("long")).as("rev_i"))
      rev
        .join(o.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(c.select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"),
          round(col("rev_i") / 10000.0, 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 proper — the full dimension-chain star join: region →
    // nation → customer/supplier → orders → lineitem, revenue per nation
    // inside one region, the customer's and supplier's nation required to
    // MATCH (the classic Q5 local-supplier predicate). Region ⋈ nation
    // collapses to an in-region nation set BEFORE anything touches the
    // fact side, and the TRUE dimensions (that set, supplier) broadcast
    // explicitly. Orders and customer are deliberately NOT forced to
    // broadcast: they are fact-scale tables in TPC-H, so those two joins
    // are left to the planner — under the broadcast threshold (any test
    // SF) they broadcast and the whole query runs with one rollup
    // shuffle; past it they degrade to key-shuffle joins on orderkey /
    // custkey, the textbook Q5 plan at cluster scale.
    Q("q5_region_nation_revenue",
      s"""SELECT n.n_name,
         |       round(sum($revInt) / 10000.0, 4) AS revenue,
         |       count(*) AS n_items
         |FROM lineitem l
         |JOIN orders o    ON o.o_orderkey = l.l_orderkey
         |JOIN customer c  ON c.c_custkey = o.o_custkey
         |JOIN supplier s  ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
         |JOIN nation n    ON n.n_nationkey = c.c_nationkey
         |JOIN region r    ON r.r_regionkey = n.n_regionkey
         |WHERE r.r_name = 'ASIA'
         |GROUP BY n.n_name
         |ORDER BY revenue DESC, n.n_name""".stripMargin) { (spark, dir) =>
      val l = table(spark, dir, "lineitem")
      val o = table(spark, dir, "orders")
      val c = table(spark, dir, "customer")
      val s = table(spark, dir, "supplier")
      val n = table(spark, dir, "nation")
      val r = table(spark, dir, "region")
      // region ⋈ nation collapses to the in-region nation dimension before
      // anything touches the fact table
      val asiaNations = n.join(broadcast(r.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      l.select(col("l_orderkey"), col("l_suppkey"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
            .cast("long").as("rev_i"))
        .join(o.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(c.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(s.select(col("s_suppkey"), col("s_nationkey").as("sn"))),
          col("l_suppkey") === col("s_suppkey") && col("sn") === col("c_nationkey"))
        .join(broadcast(asiaNations), col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("rev_i")) / 10000.0, 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Broadcast dimension join: part is the small side, explicitly broadcast.
    Q("q5_broadcast_brand_agg",
      s"""SELECT p.p_brand,
         |       round(sum($revInt) / 10000.0, 4) AS revenue,
         |       count(*) AS n
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) { (spark, dir) =>
      val l = table(spark, dir, "lineitem")
      val p = table(spark, dir, "part")
      l.join(broadcast(p), p("p_partkey") === l("l_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0).cast("long")) / 10000.0, 4).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    // Window ranking: top-3 suppliers by balance per nation.
    Q("q_window_rank",
      """SELECT s_nationkey, s_suppkey, rnk FROM (
        |  SELECT s_nationkey, s_suppkey,
        |         row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk
        |  FROM supplier) t
        |WHERE rnk <= 3 ORDER BY s_nationkey, rnk""".stripMargin) { (spark, dir) =>
      table(spark, dir, "supplier")
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc, col("s_suppkey"))))
        .filter(col("rnk") <= 3)
        .select(col("s_nationkey"), col("s_suppkey"), col("rnk").cast("long").as("rnk"))
        .orderBy("s_nationkey", "rnk")
    },

    // Anti join: customers with no orders (NOT EXISTS).
    Q("q_anti_join",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      val c = table(spark, dir, "customer")
      val o = table(spark, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy("c_custkey")
    },

    // Semi join: nations having at least one high-balance supplier (EXISTS).
    Q("q_semi_join",
      """SELECT n_nationkey, n_name FROM nation n
        |WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey AND s.s_acctbal > 0)
        |ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
      val n = table(spark, dir, "nation")
      val s = table(spark, dir, "supplier").filter(col("s_acctbal") > 0)
      n.join(s, n("n_nationkey") === s("s_nationkey"), "left_semi")
        .select(col("n_nationkey"), col("n_name"))
        .orderBy("n_nationkey")
    },

    // Window-function suite: lead/lag/ntile/percent_rank over one pass
    // (rank arithmetic → bit-identical doubles in both engines). The
    // global-order window is fed by a top-10k TakeOrdered — ntile and
    // percent_rank NEED a total order, and a bounded top-k feed is the
    // only shape where that single-partition pass survives scale (the
    // full supplier table would funnel through one window partition).
    Q("q_window_suite",
      """SELECT s_suppkey,
        |       lag(s_suppkey) OVER w AS prev_k,
        |       lead(s_suppkey) OVER w AS next_k,
        |       ntile(3) OVER w AS tile,
        |       round(percent_rank() OVER w, 6) AS pr
        |FROM (SELECT * FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 10000)
        |WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
      val w = Window.orderBy(col("s_acctbal").desc, col("s_suppkey"))
      table(spark, dir, "supplier")
        .orderBy(col("s_acctbal").desc, col("s_suppkey")).limit(10000)
        .select(col("s_suppkey"),
          lag(col("s_suppkey"), 1).over(w).as("prev_k"),
          lead(col("s_suppkey"), 1).over(w).as("next_k"),
          ntile(3).over(w).cast("long").as("tile"),
          round(percent_rank().over(w), 6).as("pr"))
        .orderBy("s_suppkey")
    },

    // Set ops: EXCEPT (distinct difference).
    Q("q_setops_except",
      """SELECT DISTINCT o_orderpriority AS v FROM orders
        |EXCEPT
        |SELECT DISTINCT c_mktsegment AS v FROM customer
        |ORDER BY v""".stripMargin) { (spark, dir) =>
      val a = table(spark, dir, "orders").select(col("o_orderpriority").as("v")).distinct()
      val b = table(spark, dir, "customer").select(col("c_mktsegment").as("v")).distinct()
      a.except(b).orderBy("v")
    },

    // Set ops: distinct union of two label domains.
    Q("q_setops_union",
      """SELECT DISTINCT c_mktsegment AS v FROM customer
        |UNION
        |SELECT DISTINCT o_orderpriority AS v FROM orders
        |ORDER BY v""".stripMargin) { (spark, dir) =>
      val a = table(spark, dir, "customer").select(col("c_mktsegment").as("v"))
      val b = table(spark, dir, "orders").select(col("o_orderpriority").as("v"))
      a.union(b).distinct().orderBy("v")
    },

    // Event-time tumbling window aggregation (the batch form of the
    // Structured Streaming windowed agg; same plan shape as readStream).
    Q("q_event_window_agg",
      """SELECT date_trunc('hour', ts) AS win, event_type,
        |       count(*) AS n,
        |       round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total
        |FROM events GROUP BY win, event_type
        |ORDER BY win, event_type""".stripMargin) { (spark, dir) =>
      events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("win"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(round(col("value") * 100, 0).cast("long")) / 100.0, 2).as("total"))
        .orderBy("win", "event_type")
    },

    // CDC snapshot diff: classify every key across two table versions as
    // inserted / deleted / updated / unchanged — the maintenance query of
    // any incrementally-refreshed corpus. One full-outer hash join on the
    // key (both sides pre-projected to (key, cents)); counts and net value
    // drift per class. Snapshots are deterministic filters of orders so
    // the oracle sees byte-identical inputs.
    Q("q_snapshot_diff",
      """WITH old AS (SELECT o_orderkey AS k, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
        |             FROM orders WHERE o_orderkey % 5 <> 0),
        |new AS (SELECT o_orderkey AS k,
        |               CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |                 * (CASE WHEN o_orderkey % 3 = 0 THEN 2 ELSE 1 END) AS v
        |        FROM orders WHERE o_orderkey % 7 <> 0),
        |d AS (SELECT coalesce(old.k, new.k) AS k,
        |             CASE WHEN old.k IS NULL THEN 'inserted'
        |                  WHEN new.k IS NULL THEN 'deleted'
        |                  WHEN old.v <> new.v THEN 'updated'
        |                  ELSE 'unchanged' END AS status,
        |             coalesce(new.v, 0) - coalesce(old.v, 0) AS dv
        |      FROM old FULL OUTER JOIN new ON old.k = new.k)
        |SELECT status, count(*) AS n, sum(dv)::BIGINT AS net_cents
        |FROM d GROUP BY status ORDER BY status""".stripMargin) { (spark, dir) =>
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val orders = table(spark, dir, "orders")
      val old = orders.filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey").as("k"), cents.as("vo"))
      val nw = orders.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey").as("k"),
          (cents * when(col("o_orderkey") % 3 === 0, 2L).otherwise(1L)).as("vn"))
      old.join(nw, Seq("k"), "full_outer")
        .select(
          when(col("vo").isNull, "inserted")
            .when(col("vn").isNull, "deleted")
            .when(col("vo") =!= col("vn"), "updated")
            .otherwise("unchanged").as("status"),
          (coalesce(col("vn"), lit(0L)) - coalesce(col("vo"), lit(0L))).as("dv"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum(col("dv")).as("net_cents"))
        .orderBy("status")
    },

    // SCD-2 dimension history from a change stream — the warehouse
    // maintenance op behind every "current + history" dimension: per
    // user, consecutive runs of the same attribute value collapse into
    // one validity interval [valid_from, valid_to); the latest run's
    // valid_to is NULL (the current row). Change detection is lag(),
    // run ids a running sum of change flags, intervals lead() over run
    // starts — three user-keyed windows chained on the SAME partition
    // key (one shuffle, reused), no self-join, no corpus-wide window.
    // ts ties break on event_id so the fold is deterministic; a
    // deterministic user sample bounds the dump size. 100 TB shape:
    // everything is keyed by the dimension's natural key, so the build
    // co-partitions with the dimension itself.
    Q("q_scd2_history",
      """WITH e AS (SELECT user_id, event_type AS state, epoch_ms(ts) AS ms, event_id
        |           FROM events WHERE user_id % 13 = 0),
        |m AS (SELECT user_id, state, ms, event_id,
        |             lag(state) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
        |      FROM e),
        |f AS (SELECT user_id, state, ms,
        |             sum(CASE WHEN prev IS NULL OR prev <> state THEN 1 ELSE 0 END)
        |               OVER (PARTITION BY user_id ORDER BY ms, event_id) AS run
        |      FROM m),
        |r AS (SELECT user_id, run, min(state) AS state, min(ms) AS valid_from_ms,
        |             count(*) AS n_events
        |      FROM f GROUP BY user_id, run),
        |s AS (SELECT user_id, state, valid_from_ms, n_events,
        |             lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY run) AS valid_to_ms
        |      FROM r)
        |SELECT user_id, state, valid_from_ms, valid_to_ms, n_events::BIGINT AS n_events
        |FROM s ORDER BY user_id, valid_from_ms, state""".stripMargin) { (spark, dir) =>
      val e = events(spark, dir).filter(col("user_id") % 13 === 0)
        .select(col("user_id"), col("event_type").as("state"),
          unix_millis(col("ts")).as("ms"), col("event_id"))
      scd2Intervals(e)
    },

    // MERGE-style upsert — the other half of warehouse maintenance next
    // to q_scd2_history's history build: a current-state snapshot (latest
    // per key before the cutoff) merged with a change delta (latest per
    // key after), classifying every key as insert / update / noop /
    // carry. The at-scale shape of MERGE INTO: one full-outer join
    // co-partitioned on the key, with both sides pre-collapsed to one
    // row per key by user-keyed dedup windows — the join input is
    // key-cardinality, never event-cardinality, and a bucketed base
    // table would make the join shuffle-free (q_bucketed_colocated_join
    // demonstrates that layout).
    Q("q_merge_upsert",
      """WITH b AS (SELECT user_id, state, ms FROM (
        |             SELECT user_id, event_type AS state, epoch_ms(ts) AS ms,
        |                    row_number() OVER (PARTITION BY user_id
        |                                       ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |             FROM events WHERE epoch_ms(ts) < 1705363200000)
        |           WHERE rn = 1),
        |d AS (SELECT user_id, state, ms FROM (
        |             SELECT user_id, event_type AS state, epoch_ms(ts) AS ms,
        |                    row_number() OVER (PARTITION BY user_id
        |                                       ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |             FROM events WHERE epoch_ms(ts) >= 1705363200000)
        |           WHERE rn = 1)
        |SELECT coalesce(d.user_id, b.user_id) AS user_id,
        |       coalesce(d.state, b.state) AS state,
        |       CASE WHEN b.user_id IS NULL THEN 'insert'
        |            WHEN d.user_id IS NULL THEN 'carry'
        |            WHEN d.state <> b.state THEN 'update'
        |            ELSE 'noop' END AS action,
        |       coalesce(d.ms, b.ms) AS as_of_ms
        |FROM b FULL OUTER JOIN d ON d.user_id = b.user_id
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val cutoffMs = 1705363200000L // 2024-01-16T00:00:00Z
      val ev = events(spark, dir)
        .select(col("user_id"), col("event_type").as("state"),
          unix_millis(col("ts")).as("ms"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy(col("ms").desc, col("event_id").desc)
      def latest(side: org.apache.spark.sql.DataFrame) = side
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("state"), col("ms"))
      val base = latest(ev.filter(col("ms") < cutoffMs))
        .select(col("user_id"), col("state").as("bs"), col("ms").as("bms"))
      val delta = latest(ev.filter(col("ms") >= cutoffMs))
        .select(col("user_id"), col("state").as("ds"), col("ms").as("dms"))
      base.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("ds"), col("bs")).as("state"),
          // presence is keyed on the ms columns (never null when the side
          // exists), matching the oracle's user_id-null test — a null
          // STATE on an existing side must classify as update/noop, not
          // masquerade as insert/carry
          when(col("bms").isNull, "insert")
            .when(col("dms").isNull, "carry")
            .when(col("ds") =!= col("bs"), "update")
            .otherwise("noop").as("action"),
          coalesce(col("dms"), col("bms")).as("as_of_ms"))
        .orderBy("user_id")
    },

    // Time-series gap fill — the feature-engineering op between raw
    // events and any per-day model input: a dense calendar spine (every
    // user × every day of the observed span) left-joined with daily
    // activity, zeros filled, and a carry-forward running max giving
    // days-since-last-activity (NULL before first activity — honest, not
    // zero). Scale shape: the spine is users × days built by exploding a
    // 30-element sequence against the user dim (never a range join); the
    // daily rollup and the carry-forward window are both user-keyed, so
    // one exchange serves join + window; the global (mn, mx) span is a
    // broadcast one-row aggregate. Day arithmetic is integer day-index
    // (datediff) — identical cross-engine, no date-type hashing hazard.
    Q("q_time_gap_fill",
      """WITH mm AS (SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx FROM events),
        |ev AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events WHERE user_id % 5 = 0),
        |u AS (SELECT DISTINCT user_id FROM ev),
        |sp AS (SELECT u.user_id, unnest(generate_series(0, date_diff('day', mm.mn, mm.mx))) AS d
        |       FROM u CROSS JOIN mm),
        |daily AS (SELECT ev.user_id, date_diff('day', mm.mn, ev.dt) AS d, count(*) AS n
        |          FROM ev CROSS JOIN mm GROUP BY ev.user_id, d),
        |f AS (SELECT sp.user_id, sp.d, coalesce(daily.n, 0) AS n,
        |             max(CASE WHEN daily.n > 0 THEN sp.d END)
        |               OVER (PARTITION BY sp.user_id ORDER BY sp.d) AS last_active
        |      FROM sp LEFT JOIN daily ON daily.user_id = sp.user_id AND daily.d = sp.d)
        |SELECT user_id, d::BIGINT AS d, n::BIGINT AS n,
        |       (d - last_active)::BIGINT AS days_since_active
        |FROM f ORDER BY user_id, d""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val all = events(spark, dir).select(col("user_id"), to_date(col("ts")).as("dt"))
      val mm = all.agg(min(col("dt")).as("mn"), max(col("dt")).as("mx"))
      val ev = all.filter(col("user_id") % 5 === 0)
      val users = ev.select("user_id").distinct()
      val spine = users.crossJoin(broadcast(mm))
        .select(col("user_id"), explode(expr("sequence(0, datediff(mx, mn))")).as("d"))
        .select(col("user_id"), col("d").cast("long").as("d"))
      val daily = ev.crossJoin(broadcast(mm))
        .select(col("user_id"), datediff(col("dt"), col("mn")).cast("long").as("d"))
        .groupBy("user_id", "d").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy("d")
      spine.join(daily, Seq("user_id", "d"), "left")
        .select(col("user_id"), col("d"), coalesce(col("n"), lit(0L)).as("n"))
        .withColumn("last_active", max(when(col("n") > 0, col("d"))).over(w))
        .select(col("user_id"), col("d"), col("n"),
          (col("d") - col("last_active")).as("days_since_active"))
        .orderBy("user_id", "d")
    },

    // Funnel analysis: per user, the first view, the first click at or
    // after that view, the first purchase at or after that click — the
    // ordered-sequence conversion query every event pipeline ships. Three
    // user-keyed min-aggregations chained by inequality-filtered joins on
    // the SAME key: every shuffle is user-keyed and compact (one row per
    // user per stage); no window over raw events, no cross-stage blowup.
    Q("q_funnel",
      """WITH v AS (SELECT user_id, min(epoch_ms(ts)) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND epoch_ms(e.ts) >= v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t3
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= c.t2 GROUP BY e.user_id)
        |SELECT v.user_id, v.t1 AS view_ms, c.t2 AS click_ms, p.t3 AS purchase_ms,
        |       (1 + (CASE WHEN c.t2 IS NULL THEN 0 ELSE 1 END)
        |          + (CASE WHEN p.t3 IS NULL THEN 0 ELSE 1 END))::BIGINT AS stage,
        |       p.t3 - v.t1 AS convert_ms
        |FROM v LEFT JOIN c ON c.user_id = v.user_id LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir).withColumn("ms", unix_millis(col("ts")))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ms")).as("t1"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ms") >= col("t1"))
        .groupBy("user_id").agg(min(col("ms")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ms") >= col("t2"))
        .groupBy("user_id").agg(min(col("ms")).as("t3"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t1").as("view_ms"), col("t2").as("click_ms"),
          col("t3").as("purchase_ms"),
          (lit(1L) + when(col("t2").isNull, 0L).otherwise(1L)
                   + when(col("t3").isNull, 0L).otherwise(1L)).as("stage"),
          (col("t3") - col("t1")).as("convert_ms"))
        .orderBy("user_id")
        .limit(1000)
    },

    // Cohort retention: users bucketed by first-active week, retention
    // counted at week offsets 0–3 — the other standard event-analytics
    // matrix next to q_funnel. Integer week arithmetic (epoch-ms div
    // week-ms) replays exactly cross-engine. Scale shape: the (user,
    // week) activity grid distincts with map-side combine (≤ users×weeks
    // compact rows), the cohort min reuses the user key, the grid⋈cohort
    // join is user-keyed (co-partitioned with the aggregates feeding
    // it), and the final rollup is ≤ cohorts×4 rows.
    Q("q_cohort_retention",
      """WITH w AS (SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id),
        |j AS (SELECT c.cohort, w.wk - c.cohort AS offs
        |      FROM w JOIN c ON c.user_id = w.user_id
        |      WHERE w.wk - c.cohort BETWEEN 0 AND 3)
        |SELECT cohort, offs, count(*)::BIGINT AS n_users
        |FROM j GROUP BY cohort, offs ORDER BY cohort, offs""".stripMargin) { (spark, dir) =>
      // FLOOR division, not `div`: Spark's `div` truncates toward zero
      // while DuckDB's `//` floors, so a pre-epoch timestamp (negative
      // ms) would bucket into different weeks in the two engines
      // (round-7 advice, RelationalQueries.scala:347). pmod arithmetic
      // keeps it exact integer math — (x − pmod(x, w)) / w is the
      // mathematical floor for either sign, with no double rounding.
      val w = events(spark, dir)
        .select(col("user_id"),
          expr("(unix_millis(ts) - pmod(unix_millis(ts), 604800000)) div 604800000")
            .as("wk"))
        .distinct()
      val c = w.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      w.join(c, "user_id")
        .select(col("cohort"), (col("wk") - col("cohort")).as("offs"))
        .filter(col("offs").between(0, 3))
        .groupBy("cohort", "offs")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort", "offs")
    },

    // Pivot: per-user event counts spread across one column per event
    // type. Spark's .pivot() with explicit values plans as conditional
    // aggregation (one pass, map-side partial agg — NOT a per-value scan),
    // which is also the portable SQL form the oracle uses.
    Q("q_pivot",
      """SELECT user_id,
        |       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
        |       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
      events(spark, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(coalesce(sum(lit(1)), lit(0L)).as("n"))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // Cube: all 4 grouping combinations in one pass (partial agg feeds
    // every grouping set — Spark expands then combines map-side).
    Q("q_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
      table(spark, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // GROUPING SETS: explicit non-hierarchical grouping combinations —
    // the third of the multi-grouping trio (rollup = prefixes, cube = all,
    // grouping sets = chosen). Same one-pass expand+combine plan as cube.
    Q("q_grouping_sets",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""".stripMargin) { (spark, dir) =>
      table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      spark.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, n""".stripMargin)
    },

    // RANGE-frame window: per-user running event total over the trailing
    // hour — a value-based (interval) frame, not a row count. Values are
    // per-row cent-quantized so the running sums are exact integers.
    Q("q_window_range_frame",
      """SELECT event_id,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT))
        |         OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |               RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_cents
        |FROM events ORDER BY event_id LIMIT 2000""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(unix_millis(col("ts")))
        .rangeBetween(-3600000L, Window.currentRow)
      events(spark, dir)
        .select(col("event_id"),
          sum(floor(col("value") * 100).cast("long")).over(w).as("trailing_cents"))
        .orderBy("event_id")
        .limit(2000)
    },

    // JSON/scalar extraction from the props payload.
    Q("q_json_extract",
      """SELECT event_type,
        |       round(avg(TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)), 6) AS avg_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      events(spark, dir)
        .groupBy(col("event_type"))
        .agg(
          round(avg(expr("try_cast(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)")), 6).as("avg_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // Correlated scalar subquery (TPC-H Q17 shape): lineitems below 20% of
    // their part's average quantity. Written as SQL so Catalyst's
    // decorrelation rewrites the per-row subqueries into ONE per-part
    // aggregate + join — the plan a 100 TB run needs (a re-executed
    // subquery per row would be quadratic). The avg comparison is
    // rearranged to integer arithmetic (qty·5·cnt < sum) so the filter
    // decision is exact in both engines; revenue is per-row-quantized
    // before the integer sum (order-free).
    Q("q17_small_qty_revenue",
      """SELECT count(*) AS n_small,
        |       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))::BIGINT AS revenue_cents
        |FROM lineitem l
        |WHERE CAST(l.l_quantity AS BIGINT) * 5 *
        |        (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |      < (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem l2
        |         WHERE l2.l_partkey = l.l_partkey)""".stripMargin) { (spark, dir) =>
      table(spark, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
      spark.sql(
        """SELECT count(*) AS n_small,
          |       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS revenue_cents
          |FROM graft_lineitem l
          |WHERE CAST(l.l_quantity AS BIGINT) * 5 *
          |        (SELECT count(*) FROM graft_lineitem l2 WHERE l2.l_partkey = l.l_partkey)
          |      < (SELECT sum(CAST(l_quantity AS BIGINT)) FROM graft_lineitem l2
          |         WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
    },

    // Large-volume orders (TPC-H Q18 shape): IN-subquery with HAVING. The
    // subquery is a pre-aggregation of the fact table — the qualifying
    // key set joins back left-semi BEFORE the wide customer/detail joins,
    // so only qualifying orders ever reach them.
    Q("q18_large_orders",
      """SELECT c.c_name, o.o_orderkey, sum(CAST(l.l_quantity AS BIGINT))::BIGINT AS total_qty
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                       GROUP BY l_orderkey
        |                       HAVING sum(CAST(l_quantity AS BIGINT)) > 150)
        |GROUP BY c.c_name, o.o_orderkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin) { (spark, dir) =>
      val li = table(spark, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("tq"))
        .filter(col("tq") > 150)
        .select(col("l_orderkey").as("k"))
      val o = table(spark, dir, "orders")
        .join(big, col("o_orderkey") === col("k"), "left_semi")
      o.join(li, col("l_orderkey") === col("o_orderkey"))
        .join(table(spark, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_name"), col("o_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(100)
    }
  )

  /** The SCD-2 fold behind q_scd2_history, over ANY (user_id, state, ms,
    * event_id) change stream — extracted so the spec can drive it with a
    * same-millisecond tie fixture (ts is µs-precision, ms truncates, and
    * the pinned testdata happens to contain no ms ties). Interval
    * chaining orders by RUN id, not valid_from_ms: two runs can share a
    * start millisecond, and ordering by timestamp would chain them
    * alphabetically — valid_to before valid_from and the wrong row left
    * current. */
  private[graft] def scd2Intervals(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSeq = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    val runs = e
      .withColumn("prev", lag(col("state"), 1).over(wSeq))
      .withColumn("chg", when(col("prev").isNull || col("prev") =!= col("state"), 1L).otherwise(0L))
      .withColumn("run", sum(col("chg")).over(wSeq))
      .groupBy("user_id", "run")
      .agg(min(col("state")).as("state"), min(col("ms")).as("valid_from_ms"),
        count(lit(1)).as("n_events"))
    val wRun = Window.partitionBy("user_id").orderBy(col("run"))
    runs
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(wRun))
      .select(col("user_id"), col("state"), col("valid_from_ms"),
        col("valid_to_ms"), col("n_events"))
      .orderBy("user_id", "valid_from_ms", "state")
  }
}
