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

  val all: Seq[Q] = Seq(xDpoPairs)
}
