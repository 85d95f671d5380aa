package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables => T}

/** Round-7 behavioral / event-analytics coverage: funnel conversion,
  * cohort retention, event-type transition mining, exact-order-statistic
  * outlier fences, time-decayed engagement scoring, winsorized robust
  * aggregates, and RFM segmentation. These are the product-analytics
  * query shapes an events-table engine is used for daily (the reference's
  * gold zone stops at daily counts — `data_lake_transformer.py:116-126`;
  * this is the surface a user would grow into next).
  *
  * Scale posture: every query here reduces the raw event stream to a
  * per-user or per-type frame FIRST (one shuffle on the natural key),
  * and all later joins/windows run on that reduced frame — users and
  * event types grow far slower than events, so the expensive passes are
  * single-scan with map-side partial aggregation. The one global-order
  * window family (ntile in x_rfm) runs on the per-user rollup, never on
  * raw events; at true 100 TB user counts the same API swaps ntile for
  * bucketing by pre-computed quantile boundary VALUES — implemented and
  * graded as x_rfm_scaled (exact boundaries from a domain-sized value
  * histogram; assignment is a broadcast comparison, no global-order
  * window over the rollup at all).
  *
  * Determinism: all cross-engine outputs are integers (cents via
  * `CAST(round(value*100) AS BIGINT)`, counts, day offsets) or exact
  * order statistics (a kth-smallest VALUE, never an interpolated
  * percentile), with explicit id tiebreaks on every window order — the
  * same discipline as x_pagerank / x_pmi_terms (no float ever crosses
  * engines).
  */
object EventAnalytics {

  private def cents = expr("CAST(round(value * 100) AS BIGINT)")

  /** X — 3-step conversion funnel (view → click → purchase, each step
    * within 1 hour of the previous): per-user earliest qualifying step
    * times, then one row per step with the surviving-user count. The
    * classic product-analytics query; each stage is a per-user min over
    * a filtered scan joined to the (user-sized) previous stage — shuffle
    * keys are always user_id, and the stage frames are user-count-sized,
    * so a 100 TB event log reduces after one scan per step.
    */
  val xFunnel = Q(
    "x_funnel",
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
       s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
       s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'click' AND e.ts > s1.t1
                AND e.ts <= s1.t1 + INTERVAL 1 HOUR
              GROUP BY e.user_id),
       s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                AND e.ts <= s2.t2 + INTERVAL 1 HOUR
              GROUP BY e.user_id)
       SELECT * FROM (
         SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_type,
                (SELECT count(*) FROM s1) AS n_users
         UNION ALL
         SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s2)
         UNION ALL
         SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s3))
       ORDER BY step""") { (s, dir) =>
    val e = T(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    def nextStep(prev: DataFrame, prevT: String, etype: String, t: String) =
      e.filter(col("event_type") === etype)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevT) &&
          col("ts") <= col(prevT) + expr("INTERVAL 1 HOUR"))
        .groupBy("user_id").agg(min(col("ts")).as(t))
    val s2 = nextStep(s1, "t1", "click", "t2")
    val s3 = nextStep(s2, "t2", "purchase", "t3")
    def stepRow(df: DataFrame, step: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step.toLong).as("step"), lit(name).as("step_type"),
          col("n_users"))
    stepRow(s1, 1, "view")
      .unionAll(stepRow(s2, 2, "click"))
      .unionAll(stepRow(s3, 3, "purchase"))
      .orderBy("step")
  }

  /** X — cohort retention: users grouped by first-active day; for each
    * (cohort, day-offset) the count of cohort members active that day.
    * Day-grain per-user activity is deduped FIRST (the corpus-scale
    * reduction), the cohort frame is user-sized, and the join key is
    * user_id — the canonical retention-triangle plan.
    */
  val xRetention = Q(
    "x_retention",
    """WITH e AS (SELECT user_id,
                         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
                  FROM events),
       du AS (SELECT DISTINCT user_id, d FROM e),
       c AS (SELECT user_id, min(d) AS cohort_day FROM du GROUP BY user_id)
       SELECT c.cohort_day, CAST(datediff('day', c.cohort_day, du.d) AS BIGINT) AS day_offset,
              count(*) AS n_users
       FROM du JOIN c ON du.user_id = c.user_id
       GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
    val du = T(s, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    val c = du.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    du.join(c, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** X — event-type transition matrix (first-order Markov counts): for
    * each user's time-ordered event sequence, count consecutive
    * (from → to) type pairs. One window pass partitioned by user
    * (tiebreak event_id pins the order cross-engine), then a 25-row agg.
    */
  val xTransitions = Q(
    "x_transitions",
    """WITH t AS (SELECT user_id, event_type AS from_type,
                    lead(event_type) OVER (PARTITION BY user_id
                      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
                  FROM events)
       SELECT from_type, to_type, count(*) AS n
       FROM t WHERE to_type IS NOT NULL
       GROUP BY from_type, to_type ORDER BY from_type, to_type""") { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T(s, dir, "events")
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Per-type exact Tukey fences from kth-order statistics, entirely in
    * integer cents: q1 = ceil(n/4)-th smallest, q3 = ceil(3n/4)-th, and
    * the 1.5×IQR comparison doubled through to stay integral
    * (2·x >< 2·q ± 3·IQR). Shared by x_outlier_iqr and x_winsorize's
    * shape; one window pass per type + a type-sized fence table.
    */
  private def typeFences(e: DataFrame, kLo: String, kHi: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("cents"), col("event_id"))
    val wn = Window.partitionBy(col("event_type"))
    e.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("event_type")
      .agg(
        min(when(expr(s"rn = $kLo"), col("cents"))).as("lo"),
        min(when(expr(s"rn = $kHi"), col("cents"))).as("hi"))
  }

  /** X — IQR outlier detection with EXACT integer arithmetic: quartiles
    * are kth-smallest values (never interpolated floats), fences are the
    * doubled-Tukey comparison, so both engines flag the identical rows.
    * The per-type rank pass is the only corpus-scale window; the fence
    * table is |event_type|-sized and broadcast into the final scan.
    */
  val xOutlierIqr = Q(
    "x_outlier_iqr",
    """WITH e AS (SELECT event_id, event_type,
                         CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       r AS (SELECT event_type, cents,
                    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
                    count(*) OVER (PARTITION BY event_type) AS n
             FROM e),
       q AS (SELECT event_type,
                    min(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS lo,
                    min(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS hi
             FROM r GROUP BY event_type)
       SELECT e.event_id, e.event_type, e.cents
       FROM e JOIN q USING (event_type)
       WHERE 2 * e.cents > 2 * q.hi + 3 * (q.hi - q.lo)
          OR 2 * e.cents < 2 * q.lo - 3 * (q.hi - q.lo)
       ORDER BY e.event_id""") { (s, dir) =>
    val e = T(s, dir, "events")
      .select(col("event_id"), col("event_type"), cents.as("cents"))
    val q = typeFences(e, "(n + 3) div 4", "(3 * n + 3) div 4")
    e.join(broadcast(q), Seq("event_type"))
      .filter(lit(2) * col("cents") > lit(2) * col("hi") + lit(3) * (col("hi") - col("lo")) ||
        lit(2) * col("cents") < lit(2) * col("lo") - lit(3) * (col("hi") - col("lo")))
      .select(col("event_id"), col("event_type"), col("cents"))
      .orderBy("event_id")
  }

  /** X — winsorized robust aggregates: per type, cents clamped to the
    * exact [p05, p95] order-statistic values, then exact integer sums.
    * The robust-mean spelling that survives heavy-tailed value columns
    * without trusting a float percentile to agree across engines.
    */
  val xWinsorize = Q(
    "x_winsorize",
    """WITH e AS (SELECT event_id, event_type,
                         CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       r AS (SELECT event_type, cents,
                    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
                    count(*) OVER (PARTITION BY event_type) AS n
             FROM e),
       q AS (SELECT event_type,
                    min(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END) AS lo,
                    min(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END) AS hi
             FROM r GROUP BY event_type)
       SELECT e.event_type, count(*) AS n,
              CAST(sum(least(greatest(e.cents, q.lo), q.hi)) AS BIGINT) AS wsum_cents,
              min(q.lo) AS p05_cents, min(q.hi) AS p95_cents
       FROM e JOIN q USING (event_type)
       GROUP BY e.event_type ORDER BY e.event_type""") { (s, dir) =>
    val e = T(s, dir, "events")
      .select(col("event_id"), col("event_type"), cents.as("cents"))
    val q = typeFences(e, "(5 * n + 99) div 100", "(95 * n + 99) div 100")
    e.join(broadcast(q), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(least(greatest(col("cents"), col("lo")), col("hi"))).as("wsum_cents"),
        min(col("lo")).as("p05_cents"), min(col("hi")).as("p95_cents"))
      .orderBy("event_type")
  }

  /** X — time-decayed engagement score: each event's cents halved per
    * day of age against the corpus's last active day (integer shift —
    * `cents div 2^age` — so decay is exact on both engines; age capped
    * at 30, where the contribution is 0 anyway). The per-user sum is the
    * engagement score a ranking pipeline feeds from; one scan + one
    * user-keyed agg at any scale. The corpus max-day is a 1-row
    * broadcast, like x_pmi_terms's total.
    *
    * ASSUMES cents >= 0: the integer divisions differ on negative
    * operands (Spark `div` truncates toward zero, DuckDB `//` floors),
    * so a dataset with refunds/negative values would diverge between
    * engines — e.g. -3 div 2 = -1 in Spark but -3 // 2 = -2 in DuckDB.
    * The events fixture is all-positive (0.03..327.53); a production
    * variant would clamp (`greatest(cents, 0)`) or decay magnitude and
    * sign separately. Every other `div` in the inventory operates on
    * provably nonnegative quantities (counts, scaled ranks).
    */
  val xDecayScore = Q(
    "x_decay_score",
    """WITH mx AS (SELECT max(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d1
                   FROM events),
       e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
                    least(CAST(datediff('day',
                            CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE),
                            (SELECT d1 FROM mx)) AS BIGINT), 30) AS age
             FROM events)
       SELECT user_id,
              CAST(sum(cents // (CAST(1 AS BIGINT) << age)) AS BIGINT) AS decayed_cents,
              count(*) AS n_events
       FROM e GROUP BY user_id ORDER BY user_id""") { (s, dir) =>
    val ev = T(s, dir, "events")
    val mx = ev.agg(max(col("ts").cast("date")).as("d1"))
    ev.select(col("user_id"), cents.as("cents"), col("ts").cast("date").as("d"))
      .crossJoin(broadcast(mx))
      .select(col("user_id"), col("cents"),
        least(datediff(col("d1"), col("d")).cast("long"), lit(30L)).as("age"))
      .select(col("user_id"),
        expr("cents div shiftleft(CAST(1 AS BIGINT), age)").as("dc"))
      .groupBy("user_id")
      .agg(sum(col("dc")).as("decayed_cents"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** X — RFM segmentation: per-user recency (days since last activity),
    * frequency (events), monetary (exact cents), each quartile-bucketed
    * by ntile over a fully-tiebroken order (identical bucket boundaries
    * on both engines). The ntile windows run on the per-user rollup —
    * users, not events, bound the sort. At real 100 TB user counts the
    * same rollup would be bucketed by precomputed approx-quantile
    * boundaries (a broadcast range lookup, no global sort); ntile is the
    * exact-contract spelling at oracle scale.
    */
  val xRfm = Q(
    "x_rfm",
    """WITH mx AS (SELECT max(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d1
                   FROM events),
       u AS (SELECT user_id,
                    CAST(datediff('day',
                           max(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)),
                           (SELECT d1 FROM mx)) AS BIGINT) AS recency,
                    count(*) AS freq,
                    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary
             FROM events GROUP BY user_id)
       SELECT user_id, recency, freq, monetary,
              CAST(ntile(4) OVER (ORDER BY recency, user_id) AS BIGINT) AS r_bucket,
              CAST(ntile(4) OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS f_bucket,
              CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT) AS m_bucket
       FROM u ORDER BY user_id""") { (s, dir) =>
    val ev = T(s, dir, "events")
    val mx = ev.agg(max(col("ts").cast("date")).as("d1"))
    val u = ev.select(col("user_id"), cents.as("cents"), col("ts").cast("date").as("d"))
      .groupBy("user_id")
      .agg(max(col("d")).as("dmax"), count(lit(1)).as("freq"),
        sum(col("cents")).as("monetary"))
      .crossJoin(broadcast(mx))
      .select(col("user_id"),
        datediff(col("d1"), col("dmax")).cast("long").as("recency"),
        col("freq"), col("monetary"))
    u.select(col("user_id"), col("recency"), col("freq"), col("monetary"),
        ntile(4).over(Window.orderBy(col("recency"), col("user_id")))
          .cast("long").as("r_bucket"),
        ntile(4).over(Window.orderBy(col("freq").desc, col("user_id")))
          .cast("long").as("f_bucket"),
        ntile(4).over(Window.orderBy(col("monetary").desc, col("user_id")))
          .cast("long").as("m_bucket"))
      .orderBy("user_id")
  }

  /** Exact 3 quartile-boundary values (the k_j-th smallest of `m`,
    * k_j = ⌈j·n/4⌉, j = 1..3) from a DOMAIN-sized value histogram:
    * groupBy(value) reduces with map-side combine to one row per
    * distinct value (cents ≤ ~33k values, recency = days, freq = small
    * counts — bounded by the value domain, NOT by user count), and the
    * cumulative window runs over that tiny frame only. Returns a 1-row
    * frame (b1, b2, b3) ready to broadcast.
    */
  private def bounds3(u: DataFrame, m: Column, n: DataFrame): DataFrame = {
    val cum = u.groupBy(m.as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
    cum.crossJoin(broadcast(n)).agg(
      min(when(col("cum") >= expr("(1*n + 3) div 4"), col("v"))).as("b1"),
      min(when(col("cum") >= expr("(2*n + 3) div 4"), col("v"))).as("b2"),
      min(when(col("cum") >= expr("(3*n + 3) div 4"), col("v"))).as("b3"))
  }

  /** X — RFM segmentation, the 100 TB formulation: identical per-user
    * rollup to x_rfm, but quartile membership comes from comparing each
    * metric to its exact quartile boundary VALUES instead of a global
    * ntile sort — r/f/m_bucket = 1 + #{boundaries strictly below the
    * value} (descending metrics negated first, so "bucket 1" is still
    * the best-customers quartile). Ties therefore share a bucket (the
    * defensible semantics ntile's arbitrary tie-split lacks), which is
    * the one deliberate contract difference from x_rfm.
    *
    * Scale posture — the refinement the x_rfm scaladoc promises: the
    * only window runs over a value-DOMAIN-sized histogram (bounds3), the
    * boundaries ride a 1-row broadcast, and assignment is a map-side
    * comparison on the user rollup — no global-order window touches a
    * user-count-sized frame anywhere in the plan. Boundaries are exact
    * order statistics (integer values, integer ranks), so the oracle
    * reproduces them bit-for-bit from row_number over the same rollup.
    */
  val xRfmScaled = Q(
    "x_rfm_scaled",
    """WITH mx AS (SELECT max(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS d1
                   FROM events),
       u AS (SELECT user_id,
                    CAST(datediff('day',
                           max(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)),
                           (SELECT d1 FROM mx)) AS BIGINT) AS recency,
                    count(*) AS freq,
                    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary
             FROM events GROUP BY user_id),
       n AS (SELECT count(*) AS n FROM u),
       br AS (SELECT
                min(CASE WHEN rn = (1*(SELECT n FROM n)+3)//4 THEN v END) AS rb1,
                min(CASE WHEN rn = (2*(SELECT n FROM n)+3)//4 THEN v END) AS rb2,
                min(CASE WHEN rn = (3*(SELECT n FROM n)+3)//4 THEN v END) AS rb3
              FROM (SELECT recency AS v, row_number() OVER (ORDER BY recency) AS rn FROM u)),
       bf AS (SELECT
                min(CASE WHEN rn = (1*(SELECT n FROM n)+3)//4 THEN v END) AS fb1,
                min(CASE WHEN rn = (2*(SELECT n FROM n)+3)//4 THEN v END) AS fb2,
                min(CASE WHEN rn = (3*(SELECT n FROM n)+3)//4 THEN v END) AS fb3
              FROM (SELECT -freq AS v, row_number() OVER (ORDER BY -freq) AS rn FROM u)),
       bm AS (SELECT
                min(CASE WHEN rn = (1*(SELECT n FROM n)+3)//4 THEN v END) AS mb1,
                min(CASE WHEN rn = (2*(SELECT n FROM n)+3)//4 THEN v END) AS mb2,
                min(CASE WHEN rn = (3*(SELECT n FROM n)+3)//4 THEN v END) AS mb3
              FROM (SELECT -monetary AS v, row_number() OVER (ORDER BY -monetary) AS rn FROM u))
       SELECT user_id, recency, freq, monetary,
              CAST(1 + (CASE WHEN recency > rb1 THEN 1 ELSE 0 END)
                     + (CASE WHEN recency > rb2 THEN 1 ELSE 0 END)
                     + (CASE WHEN recency > rb3 THEN 1 ELSE 0 END) AS BIGINT) AS r_bucket,
              CAST(1 + (CASE WHEN -freq > fb1 THEN 1 ELSE 0 END)
                     + (CASE WHEN -freq > fb2 THEN 1 ELSE 0 END)
                     + (CASE WHEN -freq > fb3 THEN 1 ELSE 0 END) AS BIGINT) AS f_bucket,
              CAST(1 + (CASE WHEN -monetary > mb1 THEN 1 ELSE 0 END)
                     + (CASE WHEN -monetary > mb2 THEN 1 ELSE 0 END)
                     + (CASE WHEN -monetary > mb3 THEN 1 ELSE 0 END) AS BIGINT) AS m_bucket
       FROM u, br, bf, bm ORDER BY user_id""") { (s, dir) =>
    val ev = T(s, dir, "events")
    val mx = ev.agg(max(col("ts").cast("date")).as("d1"))
    val u = ev.select(col("user_id"), cents.as("cents"), col("ts").cast("date").as("d"))
      .groupBy("user_id")
      .agg(max(col("d")).as("dmax"), count(lit(1)).as("freq"),
        sum(col("cents")).as("monetary"))
      .crossJoin(broadcast(mx))
      .select(col("user_id"),
        datediff(col("d1"), col("dmax")).cast("long").as("recency"),
        col("freq"), col("monetary"))
      .cache()
    graft.core.CacheBin.swap("evt.rfm_scaled.rollup", u)
    val n = u.agg(count(lit(1)).as("n"))
    val rb = bounds3(u, col("recency"), n)
      .select(col("b1").as("rb1"), col("b2").as("rb2"), col("b3").as("rb3"))
    val fb = bounds3(u, -col("freq"), n)
      .select(col("b1").as("fb1"), col("b2").as("fb2"), col("b3").as("fb3"))
    val mb = bounds3(u, -col("monetary"), n)
      .select(col("b1").as("mb1"), col("b2").as("mb2"), col("b3").as("mb3"))
    def bucket(v: Column, b: String): Column =
      lit(1L) + (v > col(s"${b}1")).cast("long") +
        (v > col(s"${b}2")).cast("long") + (v > col(s"${b}3")).cast("long")
    u.crossJoin(broadcast(rb)).crossJoin(broadcast(fb)).crossJoin(broadcast(mb))
      .select(col("user_id"), col("recency"), col("freq"), col("monetary"),
        bucket(col("recency"), "rb").as("r_bucket"),
        bucket(-col("freq"), "fb").as("f_bucket"),
        bucket(-col("monetary"), "mb").as("m_bucket"))
      .orderBy("user_id")
  }

  /** X — multi-touch revenue attribution: for each purchase, credit its
    * value to the user's preceding touch events (view/click) inside a
    * 7-day lookback, under the two classic models at once:
    *
    *   last-touch — full value to the latest touch (ties on ts broken
    *                by event_id, both engines);
    *   linear     — value split across all touches in the window; the
    *                per-touch share is the exact integer
    *                cents·SCALE // n, SIGN-SPLIT (DuckDB `//` floors
    *                while Spark `div` truncates, so a refund's
    *                negative cents would otherwise diverge by one),
    *                so channel sums are bit-identical cross-engine
    *                with no rational arithmetic.
    *
    * Join shape is the q13 band-join discipline: equi key user_id plus
    * a time-range residual — never a cartesian; per-purchase windows
    * (n, last-touch rank) partition by purchase id, bounded by per-user
    * event counts. Output per channel: touches credited, last-touch
    * cents, linear fixed-point.
    */
  val xAttribution = Q(
    "x_attribution",
    """WITH p AS (SELECT user_id, event_id AS pid, CAST(ts AS TIMESTAMP) AS pts,
              CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'),
       t AS (SELECT user_id, event_id AS tid, CAST(ts AS TIMESTAMP) AS tts,
               event_type AS channel
             FROM events WHERE event_type IN ('view', 'click')),
       pr AS (SELECT p.pid, p.cents, t.tid, t.channel,
                row_number() OVER (PARTITION BY p.pid
                  ORDER BY t.tts DESC, t.tid DESC) AS rn,
                count(*) OVER (PARTITION BY p.pid) AS n
              FROM p JOIN t ON p.user_id = t.user_id
                AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY)
       SELECT channel,
              CAST(count(*) AS BIGINT) AS n_touches,
              CAST(sum(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT) AS last_touch_cents,
              CAST(sum(CASE WHEN cents >= 0 THEN (cents * 1000000) // n
                           ELSE -(((-cents) * 1000000) // n) END)
                AS BIGINT) AS linear_fix
       FROM pr GROUP BY channel ORDER BY channel""") { (s, dir) =>
    val e = T(s, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"),
        round(col("value") * 100).cast("long").as("cents"))
    val t = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("tid"),
        col("ts").as("tts"), col("event_type").as("channel"))
    val pr = p.join(t, Seq("user_id"))
      .filter(col("tts") < col("pts") &&
        col("tts") >= col("pts") - expr("INTERVAL 7 DAY"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("pid"))
        .orderBy(col("tts").desc, col("tid").desc)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("pid"))))
    pr.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("rn") === 1, col("cents")).otherwise(0L))
          .as("last_touch_cents"),
        sum(expr("""CASE WHEN cents >= 0 THEN (cents * 1000000) div n
                    ELSE -(((-cents) * 1000000) div n) END"""))
          .as("linear_fix"))
      .orderBy("channel")
  }

  /** X — A/B experiment readout: the two-proportion significance test
    * every experimentation platform runs, with ZERO float anywhere.
    * Variant = user_id parity (the deterministic bucketing a real
    * assignment service does by hashing), conversion = the user
    * produced ≥14 purchase events (≥1 is degenerate on this lake —
    * every user purchases; 14 splits both arms non-trivially at every
    * SF). The 2×2 contingency table yields the
    * chi-square statistic as an EXACT RATIONAL:
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * and the 95% decision (χ² ≥ 3.841) is the cross-multiplied integer
    * comparison 1000·num ≥ 3841·den — computed in DECIMAL(38,0) on
    * both engines (num ≤ ~10²¹ at planet scale), so the verdict is
    * bit-exact with no fixed-point rounding contract at all.
    *
    * Scale posture: one distinct-user reduction (the corpus-scale
    * shuffle), one 2×2 aggregation, constant-size arithmetic.
    */
  val xAbChisq = Q(
    "x_ab_chisq",
    """WITH u AS (SELECT user_id, user_id % 2 AS variant,
              CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                   THEN 1 ELSE 0 END AS BIGINT) AS conv
            FROM events GROUP BY user_id, user_id % 2),
       t AS (SELECT
               CAST(sum(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN variant = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(sum(CASE WHEN variant = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
             FROM u)
       SELECT a, b, c, d, a * d - b * c AS delta,
              CAST(1000 * CAST(a + b + c + d AS DECIMAL(38,0))
                   * CAST(a * d - b * c AS DECIMAL(38,0))
                   * CAST(a * d - b * c AS DECIMAL(38,0))
                >= 3841 * CAST(a + b AS DECIMAL(38,0)) * CAST(c + d AS DECIMAL(38,0))
                   * CAST(a + c AS DECIMAL(38,0)) * CAST(b + d AS DECIMAL(38,0))
                AS BOOLEAN) AS significant_95
       FROM t""") { (s, dir) =>
    val u = T(s, dir, "events")
      .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 14)
        .cast("long").as("conv"))
    val t = u.agg(
      sum(when(col("variant") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("a"),
      sum(when(col("variant") === 0 && col("conv") === 0, 1L).otherwise(0L)).as("b"),
      sum(when(col("variant") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("c"),
      sum(when(col("variant") === 1 && col("conv") === 0, 1L).otherwise(0L)).as("d"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val delta = col("a") * col("d") - col("b") * col("c")
    t.select(col("a"), col("b"), col("c"), col("d"), delta.as("delta"),
      (lit(1000).cast("decimal(38,0)") *
        dec(col("a") + col("b") + col("c") + col("d")) *
        dec(delta) * dec(delta) >=
        lit(3841).cast("decimal(38,0)") * dec(col("a") + col("b")) *
          dec(col("c") + col("d")) * dec(col("a") + col("c")) *
          dec(col("b") + col("d"))).as("significant_95"))
  }

  /** X — jackknife standard error of the mean document length: the
    * deterministic resampling diagnostic (leave-one-out replicates need
    * no RNG, unlike the bootstrap, so it is exactly replayable). For
    * the MEAN the jackknife SE reduces in closed form to
    *   SE² = Σᵢ(S − n·xᵢ)² / (n³(n−1))
    * (algebraically identical to s/√n — the spec asserts that
    * equivalence numerically), so the whole statistic is one exact
    * integer sum-of-squares. The square sum runs in DECIMAL(38,0) (the
    * x_ab_chisq discipline — (S−n·x)² overflows int64 past ~sf1); the
    * single final sqrt over the exact ratio is the one audited rounding
    * (jackknife-se margin family).
    *
    * Scale posture: two narrow corpus passes (the total, then the
    * centered square sum with the 1-row total broadcast), both
    * map-side-combined aggs. Leave-one-out never materializes n
    * replicates — that closed form IS the point.
    */
  val xJackknifeSe = Q(
    "x_jackknife_se",
    """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS s FROM documents),
       q AS (SELECT CAST(sum(CAST(t.s - t.n * d.n_chars AS DECIMAL(38,0))
                 * CAST(t.s - t.n * d.n_chars AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS ssq
             FROM documents d, t)
       SELECT t.n, t.s AS sum_x,
              (1000 * t.s) // t.n AS mean_milli,
              CAST(round(1000000 * sqrt(CAST(q.ssq AS DOUBLE) /
                (CAST(t.n AS DOUBLE) * t.n * t.n * (t.n - 1))))
                AS BIGINT) AS se_fix
       FROM t, q""") { (s, dir) =>
    def dec38(c: Column) = c.cast("decimal(38,0)")
    val t = T(s, dir, "documents")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
    val q = T(s, dir, "documents")
      .crossJoin(broadcast(t))
      .agg(sum(dec38(col("s") - col("n") * col("n_chars")) *
        dec38(col("s") - col("n") * col("n_chars"))).cast("decimal(38,0)")
        .as("ssq"))
    t.crossJoin(broadcast(q))
      .select(col("n"), col("s").as("sum_x"),
        expr("(1000 * s) div n").as("mean_milli"),
        round(lit(1000000) * sqrt(col("ssq").cast("double") /
          (col("n").cast("double") * col("n") * col("n") * (col("n") - 1))))
          .cast("long").as("se_fix"))
  }

  /** X — session path mining: the top-10 three-step event-type paths
    * across 30-min sessions (the "what do users actually do" sequence
    * report; x_transitions is the 2-step Markov edition, this is the
    * order-3 n-gram over real session boundaries). Steps are ordered by
    * (ts, event_id) inside each session, so the trigram stream is
    * deterministic; counts and ranks are pure integers.
    *
    * Scale posture: sessionization and the two lead() windows partition
    * by (user, session) — per-key frames bounded by session length, no
    * corpus-wide window; the path count is one hash agg with map-side
    * combine and the head is TakeOrderedAndProject(10).
    */
  val xEventPaths = Q(
    "x_event_paths",
    """WITH e AS (SELECT user_id, event_id, event_type,
             CAST(ts AS TIMESTAMP) AS ts FROM events),
       f AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS new_s
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT user_id, event_id, event_type, ts,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS BIGINT) AS session_id FROM f),
       p AS (SELECT event_type || '>' ||
               lead(event_type, 1) OVER w2 || '>' ||
               lead(event_type, 2) OVER w2 AS path
             FROM s WINDOW w2 AS
               (PARTITION BY user_id, session_id ORDER BY ts, event_id)),
       c AS (SELECT path, CAST(count(*) AS BIGINT) AS n
             FROM p WHERE path IS NOT NULL GROUP BY 1)
       SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rank,
              path, n
       FROM c ORDER BY rank LIMIT 10""") { (s, dir) =>
    val sess = graft.ops.Extra.sessionize(
      T(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts")),
      gapMinutes = 30)
    val w2 = Window.partitionBy("user_id", "session_id")
      .orderBy(col("ts"), col("event_id"))
    val paths = sess
      .select(concat(col("event_type"), lit(">"),
        lead(col("event_type"), 1).over(w2), lit(">"),
        lead(col("event_type"), 2).over(w2)).as("path"))
      .filter(col("path").isNotNull)
      .groupBy("path").agg(count(lit(1)).as("n"))
    paths.orderBy(col("n").desc, col("path")).limit(10)
      .select(row_number().over(Window.orderBy(col("n").desc, col("path")))
        .cast("long").as("rank"), col("path"), col("n"))
      .orderBy("rank")
  }

  /** The Wilson lower bound at z = 1.96, written as ONE expression
    * string shared verbatim by both engines: every operation
    * (division, multiply, add, sqrt) is IEEE-correctly-rounded and
    * evaluated in the identical order, so the pre-round double is
    * bit-identical cross-engine; the single rounding to micro units is
    * margin-audited (family "wilson-lb").
    */
  private val wilsonSql =
    """CAST(round(1000000 * (
         (CAST(s AS DOUBLE) / n + 1.9208 / n
          - 1.96 * sqrt((CAST(s AS DOUBLE) / n) * (1.0 - CAST(s AS DOUBLE) / n) / n
                        + 0.9604 / (CAST(n AS DOUBLE) * n)))
         / (1.0 + 3.8416 / n))) AS BIGINT)"""

  /** X — confidence-adjusted rate ranking via the Wilson score lower
    * bound (the canonical "sort by rating" fix: a 3/4 success rate must
    * not outrank a 700/1000 one). Per event type, trials = events and
    * successes = high-value events (value > 50); types rank by the
    * z = 1.96 lower bound, not the raw rate.
    *
    * Scale posture: one corpus hash agg to the |event_type| dimension
    * (map-side combine), then constant-size arithmetic and a 5-row
    * rank window.
    */
  val xCtrWilson = Q(
    "x_ctr_wilson",
    s"""WITH a AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS s
           FROM events GROUP BY 1),
       w AS (SELECT event_type, n, s,
               (1000000 * s) // n AS rate_ppm,
               $wilsonSql AS lb_micro FROM a)
       SELECT CAST(row_number() OVER (ORDER BY lb_micro DESC, event_type)
                AS BIGINT) AS rank,
              event_type, n AS trials, s AS successes, rate_ppm, lb_micro
       FROM w ORDER BY rank""") { (sp, dir) =>
    val a = T(sp, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 50, 1L).otherwise(0L)).as("s"))
    a.select(col("event_type"), col("n"), col("s"),
        expr("(1000000 * s) div n").as("rate_ppm"),
        expr(wilsonSql).as("lb_micro"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("lb_micro").desc, col("event_type"))).cast("long"))
      .select(col("rank"), col("event_type"), col("n").as("trials"),
        col("s").as("successes"), col("rate_ppm"), col("lb_micro"))
      .orderBy("rank")
  }

  /** SPRT hypotheses (P(value > 90)): H0 p = 0.10 vs H1 p = 0.15, and
    * α = β = 0.001 (tight error rates so the walk takes several days
    * to cross at oracle scale — the verdict column genuinely varies).
    * The three model constants — per-success and per-failure
    * log-likelihood increments and the ln((1−β)/α) threshold — are 1e6
    * fixed points (margin family "sprt-llr").
    */
  val SPRT_LS: Long = math.round(1e6 * math.log(0.15 / 0.10))   // success
  val SPRT_LF: Long = math.round(1e6 * math.log(0.85 / 0.90))   // failure
  val SPRT_A: Long = math.round(1e6 * math.log(0.999 / 0.001))  // accept H1
  // accept H0 at -SPRT_A (symmetric alpha = beta)

  /** X — Wald's sequential probability ratio test over the event stream:
    * the ALWAYS-VALID sequential readout an experimentation platform
    * runs daily instead of one fixed-horizon test (peek any day, stop
    * the moment the cumulative log-likelihood ratio crosses a
    * threshold — error rates hold by construction). Trials = events,
    * success = value > 90; the stream is pre-aggregated to per-day
    * (n, k) so the cumulative LLR is a window over the ~30-row DAY
    * domain, never a corpus-wide running sum:
    *   LLR_d = Σ_{≤d} k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0))
    * — pure integer in 1e6 fixed point once the three model constants
    * are fixed. The verdict column reports accept_h1 / accept_h0 /
    * continue per day; on this fixture the empirical rate ≈ 0.135 sits
    * in (p0, p1), so the walk drifts up and H1 is accepted mid-stream —
    * a genuinely varying decision column.
    */
  val xSprtAb = Q(
    "x_sprt_ab",
    s"""WITH d AS (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
               AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value > 90 THEN 1 ELSE 0 END) AS BIGINT) AS k
           FROM events GROUP BY 1),
       c AS (SELECT day, n, k,
               CAST(sum(k * $SPRT_LS + (n - k) * $SPRT_LF)
                 OVER (ORDER BY day) AS BIGINT) AS llr_micro
             FROM d)
       SELECT day, n, k, llr_micro,
              CASE WHEN llr_micro >= $SPRT_A THEN 'accept_h1'
                   WHEN llr_micro <= -$SPRT_A THEN 'accept_h0'
                   ELSE 'continue' END AS verdict
       FROM c ORDER BY day""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    T(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 90, 1L).otherwise(0L)).as("k"))
      .withColumn("llr_micro",
        sum(col("k") * SPRT_LS + (col("n") - col("k")) * SPRT_LF)
          .over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col("n"), col("k"), col("llr_micro"),
        when(col("llr_micro") >= SPRT_A, "accept_h1")
          .when(col("llr_micro") <= -SPRT_A, "accept_h0")
          .otherwise("continue").as("verdict"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(xFunnel, xRetention, xTransitions, xOutlierIqr,
    xWinsorize, xDecayScore, xRfm, xRfmScaled, xAttribution, xAbChisq,
    xJackknifeSe, xEventPaths, xCtrWilson, xSprtAb)
}
