package graft.llmops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Preference-pair construction — the data-prep step for DPO/RLHF
  * reward training: within each prompt group, pair the best-scored
  * response (chosen) with the worst (rejected), keeping only pairs
  * whose score gap clears a margin (near-ties teach nothing and add
  * label noise).
  *
  * Fixture mapping: (lang, source) plays the prompt group, `n_chars`
  * the reward score. Determinism: ties break toward the smaller doc_id
  * on both ends.
  *
  * Scale posture: ONE hash aggregation — chosen is max(struct(score,
  * −doc_id)), rejected is min(struct(score, doc_id)) — so the per-group
  * state is two structs regardless of group size, with full map-side
  * combine. No window, no per-group sort (the window spelling is the
  * oracle's job, not the engine's). At 100 TB a prompt group is a
  * handful of sampled responses; the group count is what grows, which
  * is exactly what a hash agg shards.
  */
object Preference {

  /** Minimum chosen-vs-rejected score gap for a trainable pair. */
  val DPO_MARGIN = 50L

  val xDpoPairs = Q(
    "x_dpo_pairs",
    s"""WITH r AS (SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY lang, source
               ORDER BY n_chars DESC, doc_id) AS rb,
             row_number() OVER (PARTITION BY lang, source
               ORDER BY n_chars ASC, doc_id) AS rw
           FROM documents),
       ch AS (SELECT lang, source, doc_id AS chosen_id,
                n_chars AS chosen_score FROM r WHERE rb = 1),
       rj AS (SELECT lang, source, doc_id AS rejected_id,
                n_chars AS rejected_score FROM r WHERE rw = 1)
       SELECT ch.lang, ch.source, chosen_id, chosen_score,
              rejected_id, rejected_score,
              chosen_score - rejected_score AS gap
       FROM ch JOIN rj USING (lang, source)
       WHERE chosen_score - rejected_score >= $DPO_MARGIN
       ORDER BY lang, source""") { (s, dir) =>
    T(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(
        max(struct(col("n_chars"), (-col("doc_id")).as("nd"))).as("mx"),
        min(struct(col("n_chars"), col("doc_id"))).as("mn"))
      .select(col("lang"), col("source"),
        (-col("mx.nd")).as("chosen_id"),
        col("mx.n_chars").as("chosen_score"),
        col("mn.doc_id").as("rejected_id"),
        col("mn.n_chars").as("rejected_score"),
        (col("mx.n_chars") - col("mn.n_chars")).as("gap"))
      .filter(col("gap") >= DPO_MARGIN)
      .orderBy("lang", "source")
  }

  /** Fixed-point scale for the Bradley-Terry MM solve: ratings live at
    * ~10^6, intermediate products stay under 2^63 for any fixture where
    * wins ≤ ~10^6 per player (this lake: ≤ 2×10^3).
    */
  val BT_K = 1000000000000L

  /** Initial rating (the BT scale is arbitrary; only ratios matter). */
  val BT_INIT = 1000000L

  /** MM iterations — enough for rank stability on a k=5 player domain
    * (Round13Spec replicates the full fixed-point solve driver-side and
    * asserts the engine's ratings are bit-identical).
    */
  val BT_ITERS = 5

  /** X — Bradley-Terry strength ratings from pairwise contests: the
    * arena-style ranking op (Chatbot-Arena / reward-model eval boards
    * run exactly this on human preference votes). Players are the
    * event_type domain; one CONTEST per (user, type-pair): i beats j
    * for a user iff the user fired strictly more i-events than
    * j-events, over users who fired both types (the "both played"
    * contract keeps the comparison well-defined and join-natural).
    *
    * Solver: Hunter's MM update π_i ← W_i / Σ_j N_ij/(π_i+π_j)
    * (W_i = total wins, N_ij = games vs j), BT_ITERS iterations
    * unrolled, in FIXED-POINT integer arithmetic: every division is a
    * BIGINT floor-div at scale BT_K, spelled identically in both
    * engines — zero floats, bit-identical ratings. A winless player's
    * rating floors at 1 (greatest(·,1)) instead of reaching 0, which
    * keeps every later denominator positive regardless of fixture.
    *
    * Scale posture: the corpus-scale work is ONE hash agg (per-user
    * type counts, map-side combined) plus a per-user k² comparison
    * (k = |players|, a model roster — single digits); the win matrix is
    * k² rows, collected (model-roster-bounded — the
    * FullCuration.mixInputCounts boundedness argument) and MM-solved
    * driver-side in the same Long floor-division arithmetic —
    * corpus-independent. At 100 TB of votes only the first agg grows.
    * (Round 16: the solve used to be BT_ITERS unrolled in-engine
    * iterations, each referencing the previous ratings twice, so the
    * lazy plan and its broadcast jobs doubled per iteration — ~1.4-2.3 s
    * of pure planning/broadcast floor for 25 rows.)
    */
  val xBtRating = Q(
    "x_bt_rating", {
      val iters = (1 to BT_ITERS).map { t =>
        val prev = if (t == 1) "r0" else s"r${t - 1}"
        s"""r$t AS (SELECT w.i,
             greatest((w.wins * $BT_K) // d.d, 1) AS pi
           FROM wins w JOIN (
             SELECT m.i,
               CAST(sum((m.n_games * $BT_K) // (ra.pi + rb.pi)) AS BIGINT) AS d
             FROM m JOIN $prev ra ON ra.i = m.i
                    JOIN $prev rb ON rb.i = m.j
             GROUP BY 1) d ON d.i = w.i)"""
      }.mkString(",\n       ")
      s"""WITH uc AS (SELECT user_id, event_type,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
       w0 AS (SELECT a.event_type AS i, b.event_type AS j,
                CAST(sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_ij
              FROM uc a JOIN uc b ON a.user_id = b.user_id
                AND a.event_type <> b.event_type
              GROUP BY 1, 2),
       m AS (SELECT a.i, a.j, a.n_ij, a.n_ij + b.n_ij AS n_games
             FROM w0 a JOIN w0 b ON a.i = b.j AND a.j = b.i),
       wins AS (SELECT i, CAST(sum(n_ij) AS BIGINT) AS wins,
                  CAST(sum(n_games) AS BIGINT) AS games
                FROM m GROUP BY 1),
       r0 AS (SELECT i, CAST($BT_INIT AS BIGINT) AS pi FROM wins),
       $iters
       SELECT wins.i AS event_type, wins.games, wins.wins,
              r$BT_ITERS.pi AS pi_fix,
              CAST(row_number() OVER (ORDER BY r$BT_ITERS.pi DESC, wins.i)
                AS BIGINT) AS rnk
       FROM wins JOIN r$BT_ITERS ON r$BT_ITERS.i = wins.i
       ORDER BY rnk"""
    }) { (s, dir) =>
    val uc = T(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val w0 = uc.as("a").join(uc.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") =!= col("b.event_type"))
      .groupBy(col("a.event_type").as("i"), col("b.event_type").as("j"))
      .agg(sum(when(col("a.c") > col("b.c"), 1L).otherwise(0L)).as("n_ij"))
    val m = w0.as("a").join(w0.as("b"),
        col("a.i") === col("b.j") && col("a.j") === col("b.i"))
      .select(col("a.i"), col("a.j"), col("a.n_ij"),
        (col("a.n_ij") + col("b.n_ij")).as("n_games"))
    // The corpus-scale work ends here: uc is the one map-side-combined
    // agg over the votes, w0/m the k²-row win matrix. The MM solve
    // itself runs DRIVER-SIDE on the collected matrix — k = |players|
    // is a model roster (single digits) by the operator's own contract,
    // the same boundedness argument as FullCuration.mixInputCounts.
    // The previous in-engine unrolling nested 5 lazy iterations, each
    // referencing the previous ratings TWICE (two broadcasts), so the
    // plan tree and its broadcast jobs doubled per iteration — measured
    // ~1.4-2.3 s of planning/broadcast floor for 25 rows of data. The
    // arithmetic is bit-identical: Long floor-division of positive
    // operands is exactly BIGINT `div` at every step.
    val mRows = m.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val players = mRows.map(_._1).distinct.sorted
    val winsOf = players.map(i =>
      i -> mRows.filter(_._1 == i).map(_._3).sum).toMap
    val gamesOf = players.map(i =>
      i -> mRows.filter(_._1 == i).map(_._4).sum).toMap
    var pi = players.map(_ -> BT_INIT).toMap
    for (_ <- 1 to BT_ITERS) {
      val d = players.map { i =>
        i -> mRows.filter(_._1 == i)
          .map { case (_, j, _, nGames) => nGames * BT_K / (pi(i) + pi(j)) }
          .sum
      }.toMap
      // d(i)=0 is reachable when every per-opponent term floors to zero
      // (pi(i)+pi(j) > nGames*BT_K). The in-engine spelling this replaced
      // used non-ANSI `div` (NULL on zero divisor) + greatest(NULL, 1) = 1;
      // preserve that: zero denominator pins the rating at the floor.
      pi = players.map(i =>
        i -> (if (d(i) == 0L) 1L else math.max(winsOf(i) * BT_K / d(i), 1L))).toMap
    }
    val ranked = players
      .map(i => (i, gamesOf(i), winsOf(i), pi(i)))
      .sortBy { case (i, _, _, p) => (-p, i) }
      .zipWithIndex
      .map { case ((i, g, w, p), idx) => (i, g, w, p, (idx + 1).toLong) }
    import s.implicits._
    ranked.toSeq.toDF("event_type", "games", "wins", "pi_fix", "rnk")
      .orderBy("rnk")
  }

  val all: Seq[Q] = Seq(xDpoPairs, xBtRating)
}
