package graft.plans

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Oracle-checked query for the custom as-of operator — same semantics
  * (and oracle SQL) as the window spelling q14_asof_join, but executed by
  * AsOfJoinExec.
  */
object AsOfQueries {

  val q14b = Q(
    "q14_asof_custom",
    """SELECT c.event_id AS click_id, c.user_id,
              CAST(c.ts AS TIMESTAMP) AS click_ts, e.event_id AS error_id
       FROM (SELECT * FROM events WHERE event_type = 'click') c
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
         ON c.user_id = e.user_id AND c.ts >= e.ts
       ORDER BY click_id""") { (s, dir) =>
    val e = T(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_uid"),
        col("ts").as("e_ts"))
    AsOf.join(clicks, errors, "user_id", "ts", "e_uid", "e_ts")
      .select(col("click_id"), col("user_id"), col("ts").as("click_ts"),
        col("error_id"))
      .orderBy("click_id")
  }

  val all: Seq[Q] = Seq(q14b)
}
