package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}
import graft.core.Exact._

/** Relational operator inventory Q19–Q27 (SURVEY.md §2b): set ops, the
  * scalar-function surface, subqueries, CTEs.
  */
object Analytic {

  /** Q19a — UNION (distinct) of two order subsets. Spark: union + distinct
    * (one shuffle); at scale identical to any dedup-by-key plan.
    */
  val q19 = Q(
    "q19_union",
    """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
       UNION
       SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
       ORDER BY o_orderkey""") { (s, dir) =>
    val o = T(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      .union(o.filter(col("o_totalprice") > 150000).select(col("o_orderkey")))
      .distinct()
      .orderBy("o_orderkey")
  }

  /** Q19b — UNION ALL (bag semantics; duplicates survive, adjacent after
    * the total-order sort so the rendered result is still hash-stable).
    */
  val q19b = Q(
    "q19_union_all",
    """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
       UNION ALL
       SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
       ORDER BY o_orderkey""") { (s, dir) =>
    val o = T(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      .union(o.filter(col("o_totalprice") > 150000).select(col("o_orderkey")))
      .orderBy("o_orderkey")
  }

  /** Q19c — INTERSECT. */
  val q19c = Q(
    "q19_intersect",
    """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT
       SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
       ORDER BY o_orderkey""") { (s, dir) =>
    val o = T(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      .intersect(o.filter(col("o_totalprice") > 150000).select(col("o_orderkey")))
      .orderBy("o_orderkey")
  }

  /** Q19d — EXCEPT. */
  val q19d = Q(
    "q19_except",
    """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
       EXCEPT
       SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
       ORDER BY o_orderkey""") { (s, dir) =>
    val o = T(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      .except(o.filter(col("o_totalprice") > 150000).select(col("o_orderkey")))
      .orderBy("o_orderkey")
  }

  /** Q20 — string function surface. Patterns are in the common RE2/Java
    * regex subset so both engines agree.
    */
  val q20 = Q(
    "q20_string_funcs",
    """SELECT p_partkey,
       lower(p_name) AS lo, upper(p_brand) AS up,
       length(p_name) AS len,
       substring(p_name, 1, 5) AS sub5,
       p_name || '|' || p_type AS joined,
       replace(p_name, ' ', '_') AS underscored,
       trim('  ' || p_name || '  ') AS trimmed,
       (p_name LIKE '%red%') AS has_red,
       starts_with(p_name, 'small') AS is_small,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
       string_split(p_name, ' ')[1] AS word1
       FROM part ORDER BY p_partkey""") { (s, dir) =>
    T(s, dir, "part")
      .select(col("p_partkey"),
        lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 5).as("sub5"),
        concat(col("p_name"), lit("|"), col("p_type")).as("joined"),
        regexp_replace(col("p_name"), " ", "_").as("underscored"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        col("p_name").like("%red%").as("has_red"),
        col("p_name").startsWith("small").as("is_small"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"),
        element_at(split(col("p_name"), " "), 1).as("word1"))
      .orderBy("p_partkey")
  }

  /** Q20b — second string batch: padding, repetition, reversal,
    * prefix/suffix slices, substring position.
    */
  val q20b = Q(
    "q20_string_funcs2",
    """SELECT p_partkey,
       lpad(p_brand, 12, '*') AS padded_l,
       rpad(p_brand, 12, '.') AS padded_r,
       repeat(p_type, 2) AS doubled,
       reverse(p_name) AS reversed,
       left(p_name, 3) AS l3,
       right(p_name, 3) AS r3,
       contains(p_name, 'red') AS has_red,
       CAST(strpos(p_name, ' ') AS BIGINT) AS space_at
       FROM part ORDER BY p_partkey""") { (s, dir) =>
    T(s, dir, "part")
      .select(col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("padded_l"),
        rpad(col("p_brand"), 12, ".").as("padded_r"),
        repeat(col("p_type"), 2).as("doubled"),
        reverse(col("p_name")).as("reversed"),
        substring(col("p_name"), 1, 3).as("l3"),
        expr("right(p_name, 3)").as("r3"),
        col("p_name").contains("red").as("has_red"),
        instr(col("p_name"), " ").cast("long").as("space_at"))
      .orderBy("p_partkey")
  }

  /** Q21a — date/time surface over orders. Per-engine spellings differ
    * (date_format ↔ strftime, datediff ↔ date_diff) but values match;
    * everything producing dates is cast to timestamp on both sides so the
    * physical types align for the driver's compare.
    */
  val q21 = Q(
    "q21_date_funcs",
    """SELECT o_orderkey,
       year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS plus30,
       date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m') AS ym
       FROM orders ORDER BY o_orderkey""") { (s, dir) =>
    T(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus30"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .orderBy("o_orderkey")
  }

  /** Q21b — sub-day time parts + a parse round-trip over events. */
  val q21b = Q(
    "q21_time_funcs",
    """SELECT event_id,
       hour(ts) AS h, minute(ts) AS mi, CAST(date_part('second', ts) AS BIGINT) AS sec,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
       strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS reparsed
       FROM events ORDER BY event_id""") { (s, dir) =>
    T(s, dir, "events")
      .select(col("event_id"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        second(col("ts")).cast("long").as("sec"),
        date_trunc("hour", col("ts")).as("hr"),
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss").as("reparsed"))
      .orderBy("event_id")
  }

  /** Q21c — calendar arithmetic: month addition (both engines clamp to
    * month end), quarter/ISO-week extraction, ISO day-of-week (Spark's
    * weekday+1 == DuckDB isodow; the default dayofweek numberings
    * DIFFER across engines and are avoided), last day of month.
    */
  val q21c = Q(
    "q21_date_arith",
    """SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 1 MONTH AS TIMESTAMP) AS plus_month,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
       FROM orders ORDER BY o_orderkey""") { (s, dir) =>
    T(s, dir, "orders")
      .select(col("o_orderkey"),
        add_months(col("o_orderdate"), 1).cast("timestamp").as("plus_month"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"))
      .orderBy("o_orderkey")
  }

  /** Q22 — math surface. Transcendentals (ln/log10/exp/pow) may differ by
    * an ulp across libm implementations, so they are rounded to 6 digits
    * on both sides; algebraic ops (abs/sqrt/ceil/floor) are IEEE-exact.
    */
  val q22 = Q(
    "q22_math_funcs",
    """SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS a,
       CAST(ceil(l_extendedprice) AS DOUBLE) AS ce,
       CAST(floor(l_extendedprice) AS DOUBLE) AS fl,
       round(l_extendedprice, 1) AS r1,
       sqrt(l_quantity) AS sq,
       round(power(l_quantity, 2), 6) AS p2,
       round(ln(l_extendedprice), 6) AS lnp,
       round(log10(l_extendedprice), 6) AS lg,
       round(exp(l_discount), 6) AS ex,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
       greatest(l_tax, l_discount) AS gr,
       least(l_tax, l_discount) AS le
       FROM lineitem ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
    T(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("a"),
        ceil(col("l_extendedprice")).cast("double").as("ce"),
        floor(col("l_extendedprice")).cast("double").as("fl"),
        round(col("l_extendedprice"), 1).as("r1"),
        sqrt(col("l_quantity")).as("sq"),
        round(pow(col("l_quantity"), 2), 6).as("p2"),
        round(log(col("l_extendedprice")), 6).as("lnp"),
        round(log10(col("l_extendedprice")), 6).as("lg"),
        round(exp(col("l_discount")), 6).as("ex"),
        signum(col("l_discount") - 0.05).cast("double").as("sg"),
        greatest(col("l_tax"), col("l_discount")).as("gr"),
        least(col("l_tax"), col("l_discount")).as("le"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q22b — statistical aggregates. Built-in stddev/corr are single-pass
    * accumulations whose float error differs across engines, so the
    * declared form derives variance/stddev/correlation from EXACT decimal
    * sums (x, x², xy are all exact at scale 4) — both engines then do the
    * same double arithmetic on identical inputs. The SQL text is engine-
    * portable and is both the Spark query and the oracle.
    */
  private val q22bSql =
    """SELECT l_returnflag,
       (CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
         / (count(*) - 1) AS var_qty,
       sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
         / (count(*) - 1)) AS stddev_qty,
       (CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
         / (count(*) - 1) AS covar_qty_price
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  val q22b = Q("q22_stats_agg", q22bSql) { (s, dir) =>
    T(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(q22bSql)
  }

  /** Q22c — exact percentiles (Spark `percentile` ↔ DuckDB
    * `quantile_cont`, both exact sort-and-interpolate; rounded 6 digits
    * for the interpolation arithmetic).
    */
  val q22c = Q(
    "q22_percentiles",
    """SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"))
      .orderBy("l_returnflag")
  }

  /** Q22d — trigonometry (rounded 6: libm ulp divergence) and bitwise
    * integer ops (exact).
    */
  val q22d = Q(
    "q22_trig_bitwise",
    """SELECT l_orderkey, l_linenumber,
       round(sin(l_discount), 6) AS s,
       round(cos(l_discount), 6) AS c,
       round(atan2(l_tax, l_discount + 0.01), 6) AS a2,
       l_orderkey & l_partkey AS band,
       l_orderkey | l_linenumber AS bor,
       xor(l_orderkey, l_suppkey) AS bxor,
       l_partkey << 2 AS shl,
       l_partkey >> 1 AS shr
       FROM lineitem ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
    T(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(sin(col("l_discount")), 6).as("s"),
        round(cos(col("l_discount")), 6).as("c"),
        round(atan2(col("l_tax"), col("l_discount") + 0.01), 6).as("a2"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("band"),
        col("l_orderkey").bitwiseOR(col("l_linenumber")).as("bor"),
        col("l_orderkey").bitwiseXOR(col("l_suppkey")).as("bxor"),
        shiftleft(col("l_partkey"), 2).as("shl"),
        shiftright(col("l_partkey"), 1).as("shr"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** X — synthetic range source: spark.range ↔ DuckDB's range table
    * function (generator sources, no input table).
    */
  val xRange = Q(
    "x_range_source",
    """SELECT range AS i, range * range AS sq,
       CAST(range % 7 AS BIGINT) AS m
       FROM range(1000) ORDER BY i""") { (s, dir) =>
    s.range(1000)
      .select(col("id").as("i"), (col("id") * col("id")).as("sq"),
        (col("id") % 7).as("m"))
      .orderBy("i")
  }

  /** Q23 — conditional / null-handling surface, incl. null-safe equality
    * (Spark `<=>` ↔ SQL `IS NOT DISTINCT FROM`).
    */
  val q23 = Q(
    "q23_conditional",
    """SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS bucket,
       coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
       ifnull(nullif(l_linestatus, 'O'), 'X') AS status_or_x,
       (nullif(l_returnflag, 'N') IS NOT DISTINCT FROM 'A') AS is_a
       FROM lineitem ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
    T(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("bucket"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
          .as("flag_or_none"),
        coalesce(nullif(col("l_linestatus"), lit("O")), lit("X"))
          .as("status_or_x"),
        (nullif(col("l_returnflag"), lit("N")) <=> lit("A")).as("is_a"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q24a — array aggregation per customer: collect_list is wrapped in
    * sort_array (determinism contract), then rendered via array_join so
    * the output schema stays primitive for the oracle compare.
    */
  val q24 = Q(
    "q24_array_agg",
    """SELECT o_custkey,
       len(list(o_orderkey)) AS n,
       list_sort(list(o_orderkey))[1] AS first_key,
       list_contains(list(o_orderkey), min(o_orderkey)) AS has_min,
       array_to_string(list_sort(list(o_orderkey)), ',') AS keys_csv
       FROM orders GROUP BY o_custkey ORDER BY o_custkey""") { (s, dir) =>
    T(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        sort_array(collect_list(col("o_orderkey"))).as("arr"),
        min(col("o_orderkey")).as("mn"))
      .select(col("o_custkey"),
        size(col("arr")).cast("long").as("n"),
        element_at(col("arr"), 1).as("first_key"),
        array_contains(col("arr"), col("mn")).as("has_min"),
        array_join(col("arr"), ",").as("keys_csv"))
      .orderBy("o_custkey")
  }

  /** Q24b — array element access on embeddings (FLOAT[]; both engines are
    * 1-based here) + a slice rendered to CSV with fixed float formatting.
    */
  val q24b = Q(
    "q24_array_access",
    """SELECT vec_id, len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS e0,
       CAST(embedding[2] AS DOUBLE) AS e1,
       CAST(embedding[64] AS DOUBLE) AS e_last
       FROM embeddings ORDER BY vec_id""") { (s, dir) =>
    T(s, dir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("e0"),
        element_at(col("embedding"), 2).cast("double").as("e1"),
        element_at(col("embedding"), 64).cast("double").as("e_last"))
      .orderBy("vec_id")
  }

  /** Q24c — array set operations: per-customer orderkey sets from two
    * predicates, then union/intersect/except, sorted and rendered to CSV
    * (set semantics are engine-identical once sorted; raw result order is
    * not).
    */
  val q24c = Q(
    "q24_array_setops",
    """WITH a AS (SELECT o_custkey, list(o_orderkey) AS ka FROM orders
                  WHERE o_orderstatus = 'F' GROUP BY o_custkey),
         b AS (SELECT o_custkey, list(o_orderkey) AS kb FROM orders
                  WHERE o_totalprice > 150000 GROUP BY o_custkey)
       SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
         coalesce(array_to_string(list_sort(list_distinct(coalesce(ka, []) || coalesce(kb, []))), ','), '') AS u,
         coalesce(array_to_string(list_sort(list_intersect(coalesce(ka, []), coalesce(kb, []))), ','), '') AS i,
         coalesce(array_to_string(list_sort(list_filter(coalesce(ka, []),
           x -> NOT list_contains(coalesce(kb, []), x))), ','), '') AS d
       FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
       ORDER BY o_custkey""") { (s, dir) =>
    val o = T(s, dir, "orders")
    val a = o.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("ck_a"))
      .agg(collect_list(col("o_orderkey")).as("ka"))
    val b = o.filter(col("o_totalprice") > 150000)
      .groupBy(col("o_custkey").as("ck_b"))
      .agg(collect_list(col("o_orderkey")).as("kb"))
    val empty = array().cast("array<bigint>")
    a.join(b, col("ck_a") === col("ck_b"), "full")
      .select(
        coalesce(col("ck_a"), col("ck_b")).as("o_custkey"),
        coalesce(col("ka"), empty).as("ka"),
        coalesce(col("kb"), empty).as("kb"))
      .select(col("o_custkey"),
        array_join(sort_array(array_union(col("ka"), col("kb"))), ",").as("u"),
        array_join(sort_array(array_intersect(col("ka"), col("kb"))), ",").as("i"),
        array_join(sort_array(array_except(col("ka"), col("kb"))), ",").as("d"))
      .orderBy("o_custkey")
  }

  /** X — arg-max/arg-min (`max_by`/`min_by` ↔ `arg_max`/`arg_min`). The
    * ordering key is (cents, event_id) packed into one long so ties are
    * impossible and both engines pick the same witness.
    */
  val xArgMinMax = Q(
    "x_arg_min_max",
    """SELECT event_type,
       arg_max(event_id, CAST(round(value * 100) AS BIGINT) * 10000000 + event_id) AS top_event,
       arg_min(event_id, CAST(round(value * 100) AS BIGINT) * 10000000 + event_id) AS bottom_event,
       CAST(max(round(value * 100)) AS BIGINT) AS max_cents
       FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
    val key = (round(col("value") * 100).cast("long") * 10000000L + col("event_id"))
    T(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        max_by(col("event_id"), key).as("top_event"),
        min_by(col("event_id"), key).as("bottom_event"),
        max(round(col("value") * 100)).cast("long").as("max_cents"))
      .orderBy("event_type")
  }

  /** X — edit distance between planted near-dup documents (levenshtein is
    * built-in on both engines with the same definition; scoped to the
    * first 200 chars of low-id doc pairs to bound the O(n·m) core).
    */
  val xEditDistance = Q(
    "x_edit_distance",
    """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(levenshtein(substr(a.text, 1, 200), substr(b.text, 1, 200)) AS BIGINT) AS dist
       FROM documents a JOIN documents b ON a.doc_id < b.doc_id
       WHERE a.doc_id < 30 AND b.doc_id < 30
       ORDER BY a_id, b_id""") { (s, dir) =>
    val d = T(s, dir, "documents").filter(col("doc_id") < 30)
    val a = d.select(col("doc_id").as("a_id"), col("text").as("ta"))
    val b = d.select(col("doc_id").as("b_id"), col("text").as("tb"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(substring(col("ta"), 1, 200), substring(col("tb"), 1, 200))
          .cast("long").as("dist"))
      .orderBy("a_id", "b_id")
  }

  /** Q25 — JSON extraction (`get_json_object` ↔ `json_extract_string`)
    * plus a from_json→struct path on the Spark side (same value), rolled
    * up per user.
    */
  val q25 = Q(
    "q25_json_funcs",
    """SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
       FROM events GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
    import org.apache.spark.sql.types._
    val kSchema = StructType(Seq(StructField("k", LongType)))
    T(s, dir, "events")
      .withColumn("k1", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k2", from_json(col("props"), kSchema).getField("k"))
      // both extraction paths agree; aggregate the canonical one
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("k1")).as("k_sum"))
      .orderBy("user_id")
  }

  /** X — clause coverage batch: HAVING. */
  val xHaving = Q(
    "x_having",
    """SELECT o_custkey, count(*) AS n FROM orders
       GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey""") { (s, dir) =>
    T(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 15)
      .orderBy("o_custkey")
  }

  /** X — SELECT DISTINCT projection. */
  val xDistinct = Q(
    "x_select_distinct",
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
       ORDER BY o_orderstatus, o_orderpriority""") { (s, dir) =>
    T(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** X — LIMIT with OFFSET over a total order. */
  val xLimitOffset = Q(
    "x_limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20""") { (s, dir) =>
    T(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(20)
      .limit(10)
  }

  /** X — inline VALUES source. */
  private val xValuesSql =
    """SELECT * FROM (VALUES (1, 'red'), (2, 'green'), (3, 'blue')) AS t(id, color)
       ORDER BY id"""
  val xValues = Q("x_values_source", xValuesSql) { (s, dir) =>
    s.sql(xValuesSql)
  }

  /** X — case-insensitive LIKE. */
  val xIlike = Q(
    "x_ilike",
    """SELECT p_partkey FROM part
       WHERE upper(p_name) ILIKE '%RED%' ORDER BY p_partkey""") { (s, dir) =>
    T(s, dir, "part")
      .filter(upper(col("p_name")).ilike("%RED%"))
      .select(col("p_partkey"))
      .orderBy("p_partkey")
  }

  /** X — recursive CTE (Spark 4 WITH RECURSIVE; identical SQL both
    * engines).
    */
  private val xRecursiveSql =
    """WITH RECURSIVE r(i) AS (
         SELECT 1 UNION ALL SELECT i + 1 FROM r WHERE i < 100)
       SELECT i, i * i AS sq FROM r ORDER BY i"""
  val xRecursive = Q("x_recursive_cte", xRecursiveSql) { (s, dir) =>
    s.sql(xRecursiveSql)
  }

  /** X — LATERAL correlated derived table with per-row LIMIT (top-2
    * nations per region).
    */
  private val xLateralSql =
    """SELECT r_regionkey, r_name, n.n_name
       FROM region, LATERAL (
         SELECT n_name FROM nation
         WHERE n_regionkey = r_regionkey
         ORDER BY n_nationkey LIMIT 2) n
       ORDER BY r_regionkey, n_name"""
  val xLateral = Q("x_lateral_join", xLateralSql) { (s, dir) =>
    Seq("region", "nation").foreach(n => T(s, dir, n).createOrReplaceTempView(n))
    s.sql(xLateralSql)
  }

  /** X — try_cast: error-tolerant casting (NULL instead of throwing). */
  val xTryCast = Q(
    "x_try_cast",
    """SELECT event_id,
       try_cast(event_type AS BIGINT) AS bad_cast,
       try_cast(CAST(user_id AS VARCHAR) AS BIGINT) AS good_cast
       FROM events ORDER BY event_id""") { (s, dir) =>
    T(s, dir, "events")
      .select(col("event_id"),
        expr("try_cast(event_type AS BIGINT)").as("bad_cast"),
        expr("try_cast(CAST(user_id AS STRING) AS BIGINT)").as("good_cast"))
      .orderBy("event_id")
  }

  /** X — histogram via width_bucket (Spark side; this DuckDB build lacks
    * the function, so the oracle spells the identical left-closed
    * bucketing arithmetically — equal for the data's 0 ≤ v < 600000
    * range).
    */
  val xHistogram = Q(
    "x_histogram",
    """SELECT CAST(floor(o_totalprice / 50000) + 1 AS BIGINT) AS bucket,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders GROUP BY bucket ORDER BY bucket""") { (s, dir) =>
    T(s, dir, "orders")
      .groupBy(width_bucket(col("o_totalprice"), lit(0), lit(600000), lit(12))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("total"))
      .orderBy("bucket")
  }

  /** X — SHA-256 content digests (Spark sha2(x, 256) ↔ DuckDB sha256). */
  val xSha = Q(
    "x_sha256",
    """SELECT doc_id, sha256(text) AS digest FROM documents
       WHERE doc_id < 50 ORDER BY doc_id""") { (s, dir) =>
    T(s, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
      .orderBy("doc_id")
  }

  /** X — C-style string formatting (format_string ↔ printf). */
  val xPrintf = Q(
    "x_printf",
    """SELECT o_orderkey,
       printf('%s-%08d', o_orderpriority, o_orderkey) AS tag
       FROM orders ORDER BY o_orderkey""") { (s, dir) =>
    T(s, dir, "orders")
      .select(col("o_orderkey"),
        format_string("%s-%08d", col("o_orderpriority"), col("o_orderkey")).as("tag"))
      .orderBy("o_orderkey")
  }

  /** X — map higher-order functions (transform_values/map_filter); the
    * oracle reproduces the values without map types.
    */
  val xMapHof = Q(
    "x_map_hof",
    """SELECT event_id,
       CAST(round(value * 100) * 2 AS BIGINT) AS doubled_cents,
       CAST(CASE WHEN round(value * 100) > 500 THEN 1 ELSE 0 END AS BIGINT) AS kept
       FROM events ORDER BY event_id""") { (s, dir) =>
    T(s, dir, "events")
      .withColumn("m", map(lit("cents"), round(col("value") * 100).cast("long")))
      .withColumn("m2", transform_values(col("m"), (_, v) => v * 2))
      .withColumn("mf", map_filter(col("m"), (_, v) => v > 500))
      .select(col("event_id"),
        element_at(col("m2"), "cents").as("doubled_cents"),
        size(col("mf")).cast("long").as("kept"))
      .orderBy("event_id")
  }

  /** X — null-safe equality as a JOIN key (`<=>` ↔ IS NOT DISTINCT FROM):
    * rows whose computed key is NULL still pair up.
    */
  val xNullSafeJoin = Q(
    "x_null_safe_join",
    """SELECT a.o_orderkey AS a_key, count(*) AS n_matches
       FROM (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS k FROM orders WHERE o_orderkey < 100) a
       JOIN (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS k FROM orders WHERE o_orderkey < 100) b
         ON a.k IS NOT DISTINCT FROM b.k
       GROUP BY a.o_orderkey ORDER BY a_key""") { (s, dir) =>
    val o = T(s, dir, "orders").filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("O")).as("k"))
    val a = o.select(col("o_orderkey").as("a_key"), col("k").as("ka"))
    val b = o.select(col("o_orderkey").as("b_key"), col("k").as("kb"))
    a.join(b, col("ka") <=> col("kb"))
      .groupBy(col("a_key"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy("a_key")
  }

  /** X — JSON array parse + generator: a two-element JSON array built
    * from props, parsed to array of structs, exploded, summed (oracle
    * computes the closed form on the scalar path).
    */
  val xJsonArray = Q(
    "x_json_array",
    """SELECT user_id,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT) * 2) AS BIGINT) AS k2_sum
       FROM events GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
    import org.apache.spark.sql.types._
    val kSchema = StructType(Seq(StructField("k", LongType)))
    // parse ONCE, then build the 2-element array from the parsed struct —
    // the original spelling parsed a concatenated double-length JSON
    // string (2 parses + string building): 0.93s -> ~0.4s at sf0.1
    T(s, dir, "events")
      .withColumn("s", from_json(col("props"), kSchema))
      .withColumn("arr", array(col("s"), col("s")))
      .select(col("user_id"), explode(col("arr")).as("e"))
      .groupBy(col("user_id"))
      .agg(sum(col("e.k")).as("k2_sum"))
      .orderBy("user_id")
  }

  /** Q26a — scalar subquery. The subquery text is identical in both
    * engines (decimal-exact average), so oracle == spark.sql input.
    */
  private val q26Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
       ORDER BY o_orderkey"""
  val q26 = Q("q26_scalar_subquery", q26Sql) { (s, dir) =>
    T(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(q26Sql)
  }

  /** Q26b — IN subquery (rewritten by Catalyst to a semi join). */
  private val q26bSql =
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
       ORDER BY c_custkey"""
  val q26b = Q("q26_in_subquery", q26bSql) { (s, dir) =>
    T(s, dir, "customer").createOrReplaceTempView("customer")
    T(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(q26bSql)
  }

  /** Q26c — correlated EXISTS (decorrelated to a semi join by Catalyst). */
  private val q26cSql =
    """SELECT c_custkey FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
       ORDER BY c_custkey"""
  val q26c = Q("q26_exists_subquery", q26cSql) { (s, dir) =>
    T(s, dir, "customer").createOrReplaceTempView("customer")
    T(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(q26cSql)
  }

  /** Q27 — CTE referenced twice (self-join of an aggregate). Identical SQL
    * text runs on both engines.
    */
  private val q27Sql =
    """WITH nat_spend AS (
         SELECT c_nationkey,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
                count(*) AS n_orders
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_nationkey)
       SELECT a.c_nationkey, a.spend, a.n_orders,
              b.spend AS next_nation_spend
       FROM nat_spend a LEFT JOIN nat_spend b
         ON b.c_nationkey = a.c_nationkey + 1
       ORDER BY a.c_nationkey"""
  val q27 = Q("q27_cte", q27Sql) { (s, dir) =>
    T(s, dir, "customer").createOrReplaceTempView("customer")
    T(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(q27Sql)
  }

  /** Q25b — MAP type surface: construct a map per row, then read it back
    * through map_keys/element_at. The oracle reproduces the VALUES without
    * map types (DuckDB's MAP accessors return lists; value equality is the
    * contract, not spelling).
    */
  val q25b = Q(
    "q25_map_funcs",
    """SELECT event_id, 2 AS n_keys, event_type AS m_type,
       CAST(user_id AS VARCHAR) AS m_user
       FROM events ORDER BY event_id""") { (s, dir) =>
    T(s, dir, "events")
      .withColumn("m", map(
        lit("type"), col("event_type"),
        lit("user"), col("user_id").cast("string")))
      .select(col("event_id"),
        size(map_keys(col("m"))).as("n_keys"),
        element_at(col("m"), "type").as("m_type"),
        element_at(col("m"), "user").as("m_user"))
      .orderBy("event_id")
  }

  /** X — salted two-phase aggregation under the oracle gate: event_type
    * has only 5 (hot) keys — the exact shape where per-key parallelism
    * collapses without salting. Results are decimal-exact, so the salted
    * plan hash-matches the plain GROUP BY oracle.
    */
  val xSaltedAgg = Q(
    "x_salted_agg",
    """SELECT event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
       FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
    Skew.saltedAggregate(
      T(s, dir, "events"),
      col("event_type"), salts = 8,
      partials = Seq(count(lit(1)).as("pn"),
        sum(dec(col("value"))).as("ps")),
      combine = Seq(sum(col("pn")).as("n"),
        sum(col("ps")).cast("double").as("val_sum")))
      .withColumnRenamed("_key", "event_type")
      .orderBy("event_type")
  }

  /** X — salted equi-join under the oracle gate: event_type joins a
    * 5-row type dim, the worst join-key skew possible (every row of the
    * fact lands on one of 5 reducers in a plain shuffle join). The salt
    * spreads each hot key over 8 tasks; replicating the dim 8× is the
    * explicit, bounded cost. The dim here would of course broadcast —
    * the query pins the SHUFFLE path (broadcast threshold 0 would be the
    * cluster spelling) because salting only matters when the right side
    * can't broadcast; results hash-match the plain-join oracle, proving
    * the rewrite is semantics-free.
    */
  val xSaltedJoin = Q(
    "x_salted_join",
    """SELECT t.type_group, count(*) AS n,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
       FROM events e
       JOIN (SELECT DISTINCT event_type,
                    CASE WHEN event_type IN ('click', 'view') THEN 'browse'
                         ELSE 'act' END AS type_group
             FROM events) t ON e.event_type = t.event_type
       GROUP BY t.type_group ORDER BY t.type_group""") { (s, dir) =>
    val events = T(s, dir, "events")
    val dim = events.select(col("event_type")).distinct()
      .withColumn("type_group",
        when(col("event_type").isin("click", "view"), lit("browse"))
          .otherwise(lit("act")))
      .withColumnRenamed("event_type", "t_event_type")
    Skew.saltedJoin(events, dim, "event_type", "t_event_type", salts = 8)
      .groupBy(col("type_group"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("val_sum"))
      .orderBy("type_group")
  }

  /** X — pivot: per-user event-type counts as columns (Spark's native
    * RelationalGroupedDataset.pivot with explicit values so the plan needs
    * no extra distinct pass; oracle spells it as conditional aggregation).
    */
  val xPivot = Q(
    "x_pivot",
    """SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
       FROM events GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
    T(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")
  }

  /** X — unpivot (melt): lineitem measures to long format via
    * Dataset.unpivot; oracle is the stacked UNION ALL spelling.
    */
  val xUnpivot = Q(
    "x_unpivot",
    """SELECT l_orderkey, l_linenumber, measure, value FROM (
         SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
       ORDER BY l_orderkey, l_linenumber, measure""") { (s, dir) =>
    T(s, dir, "lineitem")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")
  }

  val all: Seq[Q] = Seq(
    q19, q19b, q19c, q19d, q20, q20b, q21, q21b, q21c, q22, q22b, q22c, q22d, q23,
    q24, q24b, q24c, q25, q25b, q26, q26b, q26c, q27, xPivot, xUnpivot,
    xSaltedAgg, xSaltedJoin, xRange, xArgMinMax, xEditDistance, xHaving,
    xDistinct,
    xLimitOffset, xValues, xIlike, xRecursive, xLateral, xTryCast,
    xHistogram, xSha, xPrintf, xMapHof, xNullSafeJoin, xJsonArray)
}
