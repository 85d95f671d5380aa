package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables => T}

/** Slowly-changing-dimension (SCD Type 2) coverage: build a versioned
  * dimension from a change stream, then join facts against the version
  * that was current AT THE FACT'S OWN TIME — the point-in-time join that
  * keeps training data free of time-travel leakage (a fact must never
  * see an attribute value from its future).
  *
  * Scale posture: both queries shuffle once on the entity key. The SCD
  * build is two window passes over (user, time) — collapse repeat
  * values, then derive each version's validity interval from its
  * successor with `lead`. The PIT join is a hash join on the entity key
  * with the interval test as a residual — never an interval cross
  * product — and at 100 TB the dimension side (one row per CHANGE, not
  * per event) is orders of magnitude smaller than the fact side, so AQE
  * broadcasts it whenever it fits.
  */
object Scd {

  /** Library form: collapse a change stream (key, ordered by orderCols,
    * carrying attrCol) into SCD2 versions. Emits one row per value
    * change with [effective_from, effective_to) validity (null
    * effective_to = current). The orderCols tail breaks timestamp ties
    * deterministically.
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__prev")
  }

  /** X — SCD2 dimension build from the events change stream: each user's
    * event_type history collapsed to change versions with validity
    * intervals. Consecutive repeats of the same value merge into one
    * version (the defining SCD2 compaction).
    */
  val xScd2Build = Q(
    "x_scd2_build",
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
                  FROM events),
       c AS (SELECT user_id, event_id, ts, event_type,
                    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             FROM e),
       v AS (SELECT user_id, event_id, ts, event_type FROM c
             WHERE prev IS NULL OR prev <> event_type)
       SELECT user_id, event_type AS state, ts AS effective_from,
              lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
              (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
       FROM v
       ORDER BY user_id, effective_from, state""") { (s, dir) =>
    val e = T(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    scd2(e, "user_id", "ts", "event_id", "event_type")
      .select(col("user_id"), col("event_type").as("state"),
        col("effective_from"), col("effective_to"), col("is_current"))
      .orderBy("user_id", "effective_from", "state")
  }

  /** X — point-in-time join: each purchase picks the user activity state
    * (SCD2 built from the user's NON-purchase events) that was in effect
    * AT THE PURCHASE'S OWN TIME (inner: purchases before the user's
    * first version drop out). Equi key + interval residual — a hash
    * join, with at most one matching version per fact because the
    * validity intervals partition each user's timeline.
    */
  val xScd2Pit = Q(
    "x_scd2_pit",
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
                  FROM events WHERE event_type <> 'purchase'),
       c AS (SELECT user_id, event_id, ts, event_type,
                    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             FROM e),
       v AS (SELECT user_id, event_id, ts, event_type FROM c
             WHERE prev IS NULL OR prev <> event_type),
       scd AS (SELECT user_id, event_type AS state, ts AS effective_from,
                      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to
               FROM v)
       SELECT f.event_id AS purchase_id, f.user_id, s.state,
              CAST(f.ts AS TIMESTAMP) AS ts
       FROM events f JOIN scd s
         ON f.user_id = s.user_id
        AND CAST(f.ts AS TIMESTAMP) >= s.effective_from
        AND (s.effective_to IS NULL OR CAST(f.ts AS TIMESTAMP) < s.effective_to)
       WHERE f.event_type = 'purchase'
       ORDER BY purchase_id""") { (s, dir) =>
    val e = T(s, dir, "events")
    val dim = scd2(
      e.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type")),
      "user_id", "ts", "event_id", "event_type")
      .select(col("user_id").as("d_user"), col("event_type").as("state"),
        col("effective_from"), col("effective_to"))
    val f = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    f.join(dim, f("user_id") === dim("d_user")
        && f("ts") >= dim("effective_from")
        && (dim("effective_to").isNull || f("ts") < dim("effective_to")))
      .select(col("purchase_id"), col("user_id"), col("state"), col("ts"))
      .orderBy("purchase_id")
  }

  /** X — full CDC batch application: a change set with INSERT / UPDATE /
    * DELETE ops and per-key sequence numbers applied to a base table —
    * latest change per key wins (here the seq-2 update must override
    * seq-1), deletes REMOVE the row (the clause x_upsert / x_stream_upsert
    * don't exercise), inserts add new keys. The Delta/Iceberg
    * MERGE-with-delete semantics as a deterministic query.
    *
    * Plan shape: the winner-per-key window partitions by key over the
    * CHANGE BATCH only (batch-sized, not table-sized), then ONE full
    * outer join applies it to the base — at scale the join shuffles on
    * the upsert key exactly once, and the change batch is usually
    * broadcast-sized. All money flows as integer cents.
    */
  val xCdcApply = Q(
    "x_cdc_apply",
    """WITH base AS (SELECT o_orderkey AS k,
            CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
       ch AS (
         SELECT o_orderkey AS k, 1 AS seq, 'U' AS op,
                CAST(round(o_totalprice * 100) AS BIGINT) + 50000 AS cents
         FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 11 <> 0
         UNION ALL
         SELECT o_orderkey, 2, 'U',
                CAST(round(o_totalprice * 100) AS BIGINT) + 100000
         FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 11 <> 0
         UNION ALL
         SELECT o_orderkey, 1, 'D', CAST(0 AS BIGINT)
         FROM orders WHERE o_orderkey % 11 = 0
         UNION ALL SELECT -1, 1, 'I', CAST(11111 AS BIGINT)
         UNION ALL SELECT -2, 1, 'I', CAST(22222 AS BIGINT)),
       last AS (SELECT k, op, cents FROM (
                  SELECT k, op, cents,
                         row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
                  FROM ch) WHERE rn = 1)
       SELECT coalesce(base.k, last.k) AS o_orderkey,
              CASE WHEN last.k IS NOT NULL THEN last.cents
                   ELSE base.cents END AS cents
       FROM base FULL JOIN last ON base.k = last.k
       WHERE last.op IS NULL OR last.op <> 'D'
       ORDER BY o_orderkey""") { (s, dir) =>
    val base = T(s, dir, "orders").select(col("o_orderkey").as("k"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val o = T(s, dir, "orders")
    val upd = o.filter(col("o_orderkey") % 13 === 0 && col("o_orderkey") % 11 =!= 0)
    val ch = upd.select(col("o_orderkey").as("k"), lit(1).as("seq"), lit("U").as("op"),
        (expr("CAST(round(o_totalprice * 100) AS BIGINT)") + 50000L).as("cents"))
      .unionAll(upd.select(col("o_orderkey").as("k"), lit(2).as("seq"), lit("U").as("op"),
        (expr("CAST(round(o_totalprice * 100) AS BIGINT)") + 100000L).as("cents")))
      .unionAll(o.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey").as("k"), lit(1).as("seq"), lit("D").as("op"),
          lit(0L).as("cents")))
      .unionAll(s.range(1, 3).select((-col("id")).cast("long").as("k"),
        lit(1).as("seq"), lit("I").as("op"),
        (col("id") * 11111L).as("cents")))
    val w = Window.partitionBy(col("k")).orderBy(col("seq").desc)
    val last = ch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("k"), col("op"), col("cents").as("c2"))
    base.join(last, Seq("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("k").as("o_orderkey"),
        when(col("op").isNotNull, col("c2")).otherwise(col("cents")).as("cents"))
      .orderBy("o_orderkey")
  }

  val all: Seq[Q] = Seq(xScd2Build, xScd2Pit, xCdcApply)
}
