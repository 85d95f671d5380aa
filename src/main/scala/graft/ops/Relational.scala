package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables => T}
import graft.core.Exact._

/** Relational operator inventory Q01–Q18 (SURVEY.md §2b).
  *
  * Every query ends in a total-order `orderBy` over a unique key so the
  * rendered result is hash-stable; the co-located DuckDB oracle SQL uses
  * the same ordering (with explicit NULLS FIRST, matching Spark's
  * ascending default).
  *
  * Scale notes are per-query in scaladoc: the point of each plan is that
  * it would survive 1000 executors / 100 TB, not just pass at sf0.01.
  */
object Relational {

  /** Q01 — the reference's silver "clean" projection re-expressed on the
    * `events` table: build a nested struct, then extract + rename fields
    * (reference: /root/reference/data_lake_transformer.py:92-104). Pure
    * Project node — shuffle-free, whole-stage-codegen'd, nested-schema
    * pruning applies at 100 TB.
    */
  val q01 = Q(
    "q01_clean",
    """SELECT event_id, user_id, 'user_' || user_id AS user_name,
       event_type, CAST(ts AS TIMESTAMP) AS event_date
       FROM events ORDER BY event_id""") { (s, dir) =>
    T(s, dir, "events")
      .select(
        struct(
          col("user_id").as("id"),
          concat(lit("user_"), col("user_id")).as("login")).as("actor"),
        col("event_id"), col("event_type"), col("ts"))
      .select(
        col("event_id"),
        col("actor.id").as("user_id"),
        col("actor.login").as("user_name"),
        col("event_type"),
        col("ts").as("event_date"))
      .orderBy("event_id")
  }

  /** Q02 — the reference's gold daily aggregate (GROUP BY ALL + count(*) +
    * date_trunc, /root/reference/data_lake_transformer.py:116-126). One
    * shuffle on the group keys; partial+final HashAggregate.
    */
  val q02 = Q(
    "q02_daily_agg",
    """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS event_day,
       count(*) AS event_count
       FROM events GROUP BY ALL ORDER BY event_type, event_day""") { (s, dir) =>
    T(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("event_day"))
      .agg(count(lit(1)).as("event_count"))
      .orderBy("event_type", "event_day")
  }

  /** Q03 — scan + conjunctive filter; every predicate reaches the parquet
    * scan (PushedFilters), so at 100 TB only matching row groups are read.
    */
  val q03 = Q(
    "q03_filter",
    """SELECT * FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
       ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q04 — projection + scalar arithmetic. Per-row double ops are IEEE
    * deterministic given identical operands, so no decimal cast is needed.
    */
  val q04 = Q(
    "q04_project_arith",
    """SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       round(l_tax * 100, 2) AS tax_pct
       FROM lineitem ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
    T(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        round(col("l_tax") * 100, 2).as("tax_pct"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q05 — TPC-H Q1 shape: multi-measure hash aggregation. Partial
    * (map-side) aggregation shrinks the shuffle to |groups|×partitions
    * rows — the canonical 100 TB-safe agg plan.
    */
  val q05 = Q(
    "q05_tpch_q1",
    """SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sumd(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sumd(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q06 — distinct aggregate: Catalyst expands to a two-phase plan
    * (distinct on (key, custkey) then count) — no driver-side state.
    */
  val q06 = Q(
    "q06_distinct_agg",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
       count(*) AS n_orders
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
    T(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Q07a — exact count-distinct per group (the hash-checkable half of the
    * approx-distinct contract; see q07_approx_hll for the HLL++ variant).
    */
  val q07 = Q(
    "q07_distinct_exact",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")
  }

  /** Q07b — approx_count_distinct (HLL++). HLL sketch values differ
    * across engines by design, so the hash-checked output is the DERIVED
    * deterministic fact both engines agree on: the exact count plus a
    * boolean asserting the approximation landed within the 5% error
    * contract (oracle-side the same predicate is trivially true of its
    * own exact count). At 100 TB this is THE way to count distincts:
    * fixed-size sketch, no expand shuffle.
    */
  val q07b = Q(
    "q07_approx_hll",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_partkey) = count(DISTINCT l_partkey) AS within_5pct
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        (abs(approx_count_distinct(col("l_partkey"), 0.02).cast("double") -
          countDistinct(col("l_partkey"))) /
          countDistinct(col("l_partkey")) < 0.05).as("within_5pct"))
      .orderBy("l_returnflag")
  }

  /** Q08 — ROLLUP: Expand node + single hash agg. */
  val q08 = Q(
    "q08_rollup",
    """SELECT n_regionkey, n_nationkey, count(*) AS n
       FROM nation GROUP BY ROLLUP(n_regionkey, n_nationkey)
       ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST""") { (s, dir) =>
    T(s, dir, "nation")
      .rollup(col("n_regionkey"), col("n_nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n_regionkey").asc_nulls_first, col("n_nationkey").asc_nulls_first)
  }

  /** Q08b — CUBE over the same keys. */
  val q08b = Q(
    "q08_cube",
    """SELECT n_regionkey, n_nationkey, count(*) AS n
       FROM nation GROUP BY CUBE(n_regionkey, n_nationkey)
       ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST""") { (s, dir) =>
    T(s, dir, "nation")
      .cube(col("n_regionkey"), col("n_nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n_regionkey").asc_nulls_first, col("n_nationkey").asc_nulls_first)
  }

  /** Q08c — explicit GROUPING SETS (Spark SQL surface; same Expand plan). */
  val q08c = Q(
    "q08_grouping_sets",
    """SELECT n_regionkey, n_nationkey, count(*) AS n FROM nation
       GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey), ())
       ORDER BY n_regionkey NULLS FIRST, n_nationkey NULLS FIRST""") { (s, dir) =>
    T(s, dir, "nation").createOrReplaceTempView("nation")
    s.sql(
      """SELECT n_regionkey, n_nationkey, count(*) AS n FROM nation
         GROUP BY GROUPING SETS ((n_regionkey), (n_nationkey), ())
         ORDER BY n_regionkey ASC NULLS FIRST, n_nationkey ASC NULLS FIRST""")
  }

  /** Q08d — grouping() markers: disambiguate a rollup's total rows from
    * genuine NULL group keys.
    */
  val q08d = Q(
    "q08_grouping_marker",
    """SELECT n_regionkey, CAST(grouping(n_regionkey) AS BIGINT) AS is_total,
       count(*) AS n
       FROM nation GROUP BY ROLLUP(n_regionkey)
       ORDER BY is_total, n_regionkey NULLS FIRST""") { (s, dir) =>
    T(s, dir, "nation")
      .rollup(col("n_regionkey"))
      .agg(grouping(col("n_regionkey")).cast("long").as("is_total"),
        count(lit(1)).as("n"))
      .orderBy(col("is_total"), col("n_regionkey").asc_nulls_first)
  }

  /** Q09 — inner equi-join. No hardcoded hint: customer is fact-sized at
    * real scale (15 M rows at sf100), so a compiled-in broadcast would be
    * a driver OOM at 100 TB. AQE picks BroadcastHashJoin when the built
    * side measures small at runtime (it does at test SFs) and falls back
    * to a shuffled hash join when it doesn't — the decision belongs to the
    * runtime stats, not the code.
    */
  val q09 = Q(
    "q09_join_inner",
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice
       FROM customer JOIN orders ON c_custkey = o_custkey
       ORDER BY o_orderkey""") { (s, dir) =>
    val c = T(s, dir, "customer")
    val o = T(s, dir, "orders")
    o.join(c, c("c_custkey") === o("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Q10 — 5-way star join (TPC-H Q5 shape) + revenue aggregation. True
    * dimensions (region/nation/supplier) carry broadcast hints — they stay
    * tiny at any SF. Customer does NOT: it is fact-sized at real scale, so
    * its join is left to AQE (broadcast at test SFs, shuffled hash join
    * when runtime stats say it's big). The remaining shuffles are
    * lineitem⋈orders and the final agg — the right plan at scale.
    */
  val q10 = Q(
    "q10_join_multi",
    """SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
       FROM customer
       JOIN orders   ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation   ON s_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY n_name ORDER BY n_name""") { (s, dir) =>
    val c = T(s, dir, "customer")
    val o = T(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = T(s, dir, "lineitem")
    val su = T(s, dir, "supplier")
    val n = T(s, dir, "nation")
    val r = T(s, dir, "region")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("c_custkey") === col("o_custkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** Q10b — TPC-H Q3 shape: 3-way join, revenue aggregation, top-10 by
    * revenue. Identical SQL runs on both engines (decimal-exact revenue,
    * unique o_orderkey tie-break).
    */
  private val q10bSql =
    """SELECT o_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY o_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, o_orderkey LIMIT 10"""
  val q10b = Q("q10_tpch_q3", q10bSql) { (s, dir) =>
    Seq("customer", "orders", "lineitem").foreach(n =>
      T(s, dir, n).createOrReplaceTempView(n))
    s.sql(q10bSql)
  }

  /** Q10c — TPC-H Q14 shape: conditional (CASE-filtered) aggregation over
    * a join, the promo-revenue ratio from exact decimal sums.
    */
  private val q10cSql =
    """SELECT
       CAST(sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100 /
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS promo_revenue_pct
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1996-02-01'"""
  val q10c = Q("q10_promo_revenue", q10cSql) { (s, dir) =>
    Seq("lineitem", "part").foreach(n => T(s, dir, n).createOrReplaceTempView(n))
    s.sql(q10cSql)
  }

  /** Q06b — boolean aggregates (bool_and/bool_or, shared names). */
  val q06b = Q(
    "q06_bool_agg",
    """SELECT o_orderpriority,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, dir) =>
    T(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_totalprice") > 400000).as("any_over_400k"))
      .orderBy("o_orderpriority")
  }

  /** Q11a — left outer join + per-customer aggregate; customers with no
    * orders keep n_orders = 0 and NULL spend.
    */
  val q11 = Q(
    "q11_join_left",
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey ORDER BY c_custkey""") { (s, dir) =>
    val c = T(s, dir, "customer")
    val o = T(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        sumd(col("o_totalprice")).as("spent"))
      .orderBy("c_custkey")
  }

  /** Q11b — full outer join of two aggregates (customer vs supplier
    * presence per nation); exercises both null sides.
    */
  val q11b = Q(
    "q11_join_full",
    """SELECT coalesce(c.k, s.k) AS n_nationkey, c.n_cust, s.n_supp FROM
       (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
       FULL JOIN
       (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
       ON c.k = s.k
       ORDER BY n_nationkey NULLS FIRST""") { (s, dir) =>
    val c = T(s, dir, "customer").groupBy(col("c_nationkey").as("k"))
      .agg(count(lit(1)).as("n_cust"))
    val su = T(s, dir, "supplier").groupBy(col("s_nationkey").as("k2"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, col("k") === col("k2"), "full")
      .select(coalesce(col("k"), col("k2")).as("n_nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy(col("n_nationkey").asc_nulls_first)
  }

  /** Q11c — right outer join: the mirrored q11_join_left spelling with
    * the preserved side on the RIGHT (orders is the left input, customer
    * the right; customers with no orders survive with NULL order
    * columns). Catalyst canonicalizes this to the same shuffled hash
    * join as the left-outer form — the point of the row is the declared
    * SURVEY §2b Q11 "left/right/full" API surface, and the aggregate
    * proves the null side landed on the correct input (n_orders = 0,
    * NULL spend for order-less customers).
    */
  val q11c = Q(
    "q11_join_right",
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
       FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
       GROUP BY c_custkey ORDER BY c_custkey""") { (s, dir) =>
    val c = T(s, dir, "customer")
    val o = T(s, dir, "orders")
    o.join(c, o("o_custkey") === c("c_custkey"), "right")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        sumd(col("o_totalprice")).as("spent"))
      .orderBy("c_custkey")
  }

  /** Q12a — semi join (EXISTS): customers having a >200k order. */
  val q12 = Q(
    "q12_semi_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_totalprice > 200000)
       ORDER BY c_custkey""") { (s, dir) =>
    val c = T(s, dir, "customer")
    val o = T(s, dir, "orders").filter(col("o_totalprice") > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Q12b — anti join (NOT EXISTS): customers with no >200k order. */
  val q12b = Q(
    "q12_anti_join",
    """SELECT c_custkey FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 200000)
       ORDER BY c_custkey""") { (s, dir) =>
    val c = T(s, dir, "customer")
    val o = T(s, dir, "orders").filter(col("o_totalprice") > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy("c_custkey")
  }

  /** Q13a — equi key + range residual: hash join on l_partkey with the
    * residual evaluated post-probe (never a cartesian product). No
    * broadcast hint: part is fact-sized at scale (20M rows at sf100) —
    * AQE broadcasts at small SF and shuffle-joins when it outgrows the
    * threshold, exactly like the q09/q10 customer joins.
    */
  val q13 = Q(
    "q13_range_join",
    """SELECT p_partkey, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
       FROM part JOIN lineitem
         ON l_partkey = p_partkey AND l_quantity > p_size
       GROUP BY p_partkey ORDER BY p_partkey""") { (s, dir) =>
    val p = T(s, dir, "part")
    val l = T(s, dir, "lineitem")
    l.join(p, col("l_partkey") === col("p_partkey")
        && col("l_quantity") > col("p_size"))
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("qty"))
      .orderBy("p_partkey")
  }

  /** Q13b — band join: signup→purchase conversions within one hour, keyed
    * by user. The user_id equi-key keeps this a hash join (the time band is
    * a residual); a pure theta join would be BNLJ — avoided by design.
    */
  val q13b = Q(
    "q13_band_join",
    """SELECT a.event_id AS signup_id, b.event_id AS purchase_id
       FROM events a JOIN events b
         ON a.user_id = b.user_id
        AND a.event_type = 'signup' AND b.event_type = 'purchase'
        AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
       ORDER BY signup_id, purchase_id""") { (s, dir) =>
    val e = T(s, dir, "events")
    val a = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("a_ts"))
    val b = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("uid2"), col("ts").as("b_ts"))
    a.join(b, col("user_id") === col("uid2")
        && col("b_ts") > col("a_ts")
        && col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("signup_id"), col("purchase_id"))
      .orderBy("signup_id", "purchase_id")
  }

  /** Q14 — as-of join: for each click, the latest error event of the same
    * user at-or-before the click. Spark has no native ASOF, so this is the
    * scalable single-pass spelling: union both sides tagged, one window
    * `last(ignoreNulls)` over (user, time) — one shuffle, no self-join
    * explosion, works at any scale.
    * (DuckDB oracle uses its native ASOF LEFT JOIN.)
    */
  val q14 = Q(
    "q14_asof_join",
    """SELECT c.event_id AS click_id, c.user_id,
              CAST(c.ts AS TIMESTAMP) AS click_ts, e.event_id AS error_id
       FROM (SELECT * FROM events WHERE event_type = 'click') c
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
         ON c.user_id = e.user_id AND c.ts >= e.ts
       ORDER BY click_id""") { (s, dir) =>
    val e = T(s, dir, "events")
    val tagged = e.filter(col("event_type").isin("click", "error"))
      .select(
        col("user_id"), col("ts"), col("event_id"),
        // errors sort before clicks at equal ts => ASOF's >= inclusivity
        when(col("event_type") === "error", 0).otherwise(1).as("side"),
        when(col("event_type") === "error", col("event_id")).as("err_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("error_id", last(col("err_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("error_id"))
      .orderBy("click_id")
  }

  /** Q15 — bounded cross join (two tiny dimensions). */
  val q15 = Q(
    "q15_cross_join",
    """SELECT r_regionkey, r_name, n_nationkey, n_name
       FROM region CROSS JOIN nation
       ORDER BY r_regionkey, n_nationkey""") { (s, dir) =>
    T(s, dir, "region").crossJoin(T(s, dir, "nation"))
      .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
      .orderBy("r_regionkey", "n_nationkey")
  }

  /** Q16 — ranking windows. The window order includes c_custkey so
    * row_number is deterministic under acctbal ties.
    */
  val q16 = Q(
    "q16_window_rank",
    """SELECT c_custkey, c_mktsegment, c_acctbal,
       row_number() OVER w AS rn, rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk
       FROM customer
       WINDOW w AS (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey)
       ORDER BY c_custkey""") { (s, dir) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    T(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .orderBy("c_custkey")
  }

  /** Q16b — distribution analytics: ntile/percent_rank/cume_dist and
    * frame-pinned first/last values. percent_rank and cume_dist are rank
    * arithmetic over identical orderings — exactly equal across engines.
    */
  val q16b = Q(
    "q16_window_analytics",
    """SELECT c_custkey, c_mktsegment,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS prank,
       cume_dist() OVER w AS cdist,
       first_value(c_custkey) OVER w AS top_cust,
       last_value(c_custkey) OVER
         (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS bottom_cust
       FROM customer
       WINDOW w AS (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey)
       ORDER BY c_custkey""") { (s, dir) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        first(col("c_custkey")).over(w).as("top_cust"),
        last(col("c_custkey")).over(wFull).as("bottom_cust"))
      .orderBy("c_custkey")
  }

  /** Q17 — analytic windows with ROWS and RANGE frames. The RANGE frame
    * orders by epoch micros (integer), identical in both engines; windowed
    * sums go through the decimal-exact path.
    */
  val q17 = Q(
    "q17_window_frames",
    """SELECT event_id, user_id,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run4,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
         (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hr_sum,
       count(*) OVER
         (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS hr_cnt
       FROM events ORDER BY event_id""") { (s, dir) =>
    val wRow = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRows = wRow.rowsBetween(-3, 0)
    val wRange = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0)
    T(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        lag(col("value"), 1).over(wRow).as("prev_value"),
        sum(dec(col("value"))).over(wRows).cast("double").as("run4"),
        sum(dec(col("value"))).over(wRange).cast("double").as("hr_sum"),
        count(lit(1)).over(wRange).as("hr_cnt"))
      .orderBy("event_id")
  }

  /** Q17b — forward-looking window navigation: lead (with default) and
    * nth_value over the per-user timeline.
    */
  val q17b = Q(
    "q17_window_lead",
    """SELECT event_id,
       lead(value) OVER w AS next_value,
       lead(value, 2, -1.0) OVER w AS next2_or_default,
       nth_value(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_value
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ORDER BY event_id""") { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T(s, dir, "events")
      .select(col("event_id"),
        lead(col("value"), 1).over(w).as("next_value"),
        lead(col("value"), 2, -1.0).over(w).as("next2_or_default"),
        nth_value(col("value"), 3).over(wFull).as("third_value"))
      .orderBy("event_id")
  }

  /** Q18 — top-k: orderBy+limit plans as TakeOrderedAndProject (per-
    * partition heaps + driver merge of k rows — no global sort shuffle).
    */
  val q18 = Q(
    "q18_topk",
    """SELECT * FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""") { (s, dir) =>
    T(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** X — TPC-H Q5 shape (local supplier volume): the 6-table star join
    * (region→nation→{customer,supplier}→orders→lineitem) with the
    * customer-and-supplier-in-the-same-nation constraint — the classic
    * optimizer workout: join ORDER matters (region/nation are 1-row/25-row
    * broadcasts that must prune early; the l_suppkey = s_suppkey AND
    * c_nationkey = s_nationkey pair closes the snowflake), and revenue
    * uses the exact decimal-product sum (the q10_promo_revenue
    * discipline). One shared SQL string runs on BOTH engines.
    *
    * Scale posture: Catalyst broadcasts region/nation/supplier (dim-
    * sized), shuffles only orders⋈lineitem on the order key, and the
    * date filter reaches the orders scan (PushedFilters); the group
    * domain is |nation| — map-side combine all the way.
    */
  private val xTpchQ5Sql =
    """SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""
  val xTpchQ5 = Q("x_tpch_q5", xTpchQ5Sql) { (s, dir) =>
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(n => T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ5Sql)
  }

  /** X — TPC-H Q18 shape (large-volume customers): a HAVING-filtered
    * aggregate feeding an IN-subquery (planned as a semi-join against
    * the aggregated key set), re-joined to orders/customer, exact
    * decimal quantity sums, TakeOrdered(20) head. The pattern that
    * punishes engines which materialize the subquery per-row.
    */
  private val xTpchQ18Sql =
    """SELECT c_name, o_orderkey,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
       FROM orders
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN customer ON c_custkey = o_custkey
       WHERE o_orderkey IN (
         SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
       GROUP BY c_name, o_orderkey
       ORDER BY total_qty DESC, o_orderkey LIMIT 20"""
  val xTpchQ18 = Q("x_tpch_q18", xTpchQ18Sql) { (s, dir) =>
    Seq("orders", "lineitem", "customer")
      .foreach(n => T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ18Sql)
  }

  /** X — TPC-H Q8 shape (national market share): the 7-table join with
    * TWO roles for nation (customer's nation gates the region filter,
    * supplier's nation drives the share numerator) and the
    * conditional-over-total ratio per order year. Ratio = exact decimal
    * sums cast to double then divided once (the q10_promo_revenue
    * discipline — correctly-rounded division of two bit-identical
    * doubles). Same shared-SQL-on-both-engines pattern as Q5/Q18.
    *
    * Scale posture: dims broadcast, one shuffle on the order key, group
    * domain = |years|; both CASE arms ride one aggregation pass.
    */
  private val xTpchQ8Sql =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
                THEN CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS mkt_share
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON c_nationkey = n1.n_nationkey
       JOIN region ON n1.n_regionkey = r_regionkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation n2 ON s_nationkey = n2.n_nationkey
       WHERE r_name = 'ASIA'
       GROUP BY o_year ORDER BY o_year"""
  val xTpchQ8 = Q("x_tpch_q8", xTpchQ8Sql) { (s, dir) =>
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region")
      .foreach(n => T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ8Sql)
  }

  /** X — TPC-H Q7 shape (volume shipping): the two-nation trade-flow
    * query where NATION joins twice with a symmetric OR predicate over
    * the role pair — the disjunctive join condition that tempts engines
    * into a cartesian nation×nation expansion. Spelled as two
    * broadcast-able nation joins with the OR evaluated as a post-join
    * residual; revenue per (supp_nation, cust_nation, ship year) via the
    * exact decimal-product sum. Shared SQL on both engines.
    *
    * Scale posture: nation is a 25-row broadcast in BOTH roles; the only
    * real shuffle is orders⋈lineitem on the order key; the group domain
    * is 2 nations × |years| — map-side combine absorbs everything.
    */
  private val xTpchQ7Sql =
    """SELECT supp_nation, cust_nation, l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
       FROM (
         SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS l_year,
                l_extendedprice, l_discount
         FROM supplier
         JOIN lineitem ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
             OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
       ) shipping
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year"""
  val xTpchQ7 = Q("x_tpch_q7", xTpchQ7Sql) { (s, dir) =>
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ7Sql)
  }

  /** X — TPC-H Q10 shape (returned-item reporting): the
    * revenue-at-risk-per-customer query — a date-windowed 4-table join
    * restricted to returned lineitems, aggregated at CUSTOMER grain (the
    * widest group domain in the TPC-H set: |customer|, not |nation| or
    * |years|), TakeOrdered(20) head on the revenue.
    *
    * Scale posture: the date window reaches the orders scan and
    * l_returnflag = 'R' the lineitem scan (PushedFilters both); nation
    * broadcasts; the customer-grain agg is the one real shuffle, and the
    * global top-20 is TakeOrderedAndProject — no full sort. Exact
    * decimal revenue; revenue-DESC ties broken by c_custkey.
    */
  private val xTpchQ10Sql =
    """SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       n_name
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1996-07-01'
       GROUP BY c_custkey, c_name, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20"""
  val xTpchQ10 = Q("x_tpch_q10", xTpchQ10Sql) { (s, dir) =>
    Seq("lineitem", "orders", "customer", "nation")
      .foreach(n => T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ10Sql)
  }

  /** X — TPC-H Q6 shape (forecast revenue change): the pure
    * scan-filter-aggregate that exists to measure predicate pushdown —
    * all three predicates land in `PushedFilters`, no join, no group.
    * revenue = Σ extprice·discount in exact decimal.
    */
  private val xTpchQ6Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
         AND l_quantity < 24"""
  val xTpchQ6 = Q("x_tpch_q6", xTpchQ6Sql) { (s, dir) =>
    Seq("lineitem").foreach(n => T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ6Sql)
  }

  /** X — TPC-H Q13 shape (customer order-count distribution): the
    * LEFT-join-then-histogram double aggregation — customers with zero
    * orders must survive into the c_count = 0 bucket, which is exactly
    * what an inner join silently loses. (The reference Q13 also excludes
    * a comment pattern; this lake has no comment column, so the shape is
    * the two-level aggregation itself.) Pure counts — integer-exact.
    */
  private val xTpchQ13Sql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
         SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey) t
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""
  val xTpchQ13 = Q("x_tpch_q13", xTpchQ13Sql) { (s, dir) =>
    Seq("customer", "orders").foreach(n =>
      T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ13Sql)
  }

  /** X — TPC-H Q15 shape (top supplier): a revenue view re-consumed
    * twice — once joined back to supplier, once under a scalar max — so
    * the equality filter selects the argmax WITHOUT a sort. The equality
    * compares exact decimals (identical derivation on both engines), the
    * pattern float revenue would forbid.
    */
  private val xTpchQ15Sql =
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name,
              CAST(total_revenue AS DOUBLE) AS total_revenue
       FROM supplier JOIN revenue ON s_suppkey = supplier_no
       WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
       ORDER BY s_suppkey"""
  val xTpchQ15 = Q("x_tpch_q15", xTpchQ15Sql) { (s, dir) =>
    Seq("lineitem", "supplier").foreach(n =>
      T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ15Sql)
  }

  /** X — TPC-H Q17 shape (small-quantity-order revenue): the correlated
    * per-part average threshold (l_quantity < 0.2·avg over the part),
    * CROSS-MULTIPLIED to the exact decimal comparison 5·qty·n < Σqty so
    * no division ever happens — the x_mannwhitney discipline applied to
    * TPC-H's own correlated-subquery benchmark. The per-part (Σ, n)
    * table replaces the correlated scalar subquery with one hash agg +
    * join (what a decorrelating optimizer produces anyway).
    */
  private val xTpchQ17Sql =
    """WITH pq AS (SELECT l_partkey AS pk,
                sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                CAST(count(*) AS BIGINT) AS nq
              FROM lineitem GROUP BY 1)
       SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS avg_yearly
       FROM lineitem
       JOIN part ON p_partkey = l_partkey
       JOIN pq ON pk = l_partkey
       WHERE p_brand = 'Brand#23'
         AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * nq < sq"""
  val xTpchQ17 = Q("x_tpch_q17", xTpchQ17Sql) { (s, dir) =>
    Seq("lineitem", "part").foreach(n =>
      T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ17Sql)
  }

  /** X — TPC-H Q22 shape (global-customer-sentiment): eligible customers
    * hold an above-global-average balance (the cross-engine trap: avg is
    * a division — cross-multiplied to bal·n > Σ over the positive
    * balances) and have gone dormant (anti join: no order since 2000 —
    * adapted from the reference's no-order-ever, which is empty on this
    * lake where every customer ordered; the phone-prefix country code
    * becomes a nationkey bucket for the same reason). Counts + exact
    * decimal balance sums per bucket.
    */
  private val xTpchQ22Sql =
    """WITH pos AS (
         SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
                CAST(count(*) AS BIGINT) AS n
         FROM customer WHERE c_acctbal > 0.0),
       eligible AS (
         SELECT c_custkey, c_nationkey,
                CAST(c_acctbal AS DECIMAL(18,2)) AS bal
         FROM customer, pos
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2000-01-01'))
       SELECT c_nationkey % 5 AS cntry_bucket,
              CAST(count(*) AS BIGINT) AS numcust,
              CAST(sum(bal) AS DOUBLE) AS totacctbal
       FROM eligible GROUP BY 1 ORDER BY 1"""
  val xTpchQ22 = Q("x_tpch_q22", xTpchQ22Sql) { (s, dir) =>
    Seq("customer", "orders").foreach(n =>
      T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xTpchQ22Sql)
  }

  val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q06b, q07, q07b, q08, q08b, q08c, q08d,
    q09, q10, q10b, q10c, q11, q11b, q11c, q12, q12b, q13, q13b, q14, q15,
    q16, q16b, q17, q17b, q18, xTpchQ5, xTpchQ18, xTpchQ8, xTpchQ7,
    xTpchQ10, xTpchQ6, xTpchQ13, xTpchQ15, xTpchQ17, xTpchQ22)
}
