package graft.llmops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Dataset drift monitoring — the QA gate a production corpus pipeline
  * runs on every ingest batch: has the incoming data's distribution
  * moved against the standing reference?
  *
  * x_psi_drift computes the Population Stability Index over the
  * document token-length distribution between the standing corpus
  * (below the 80% id watermark — the reference slice every incremental
  * operator in this suite uses) and the new batch (above it):
  *
  *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
  *
  * with add-one smoothing over the occupied bins (a bin empty on one
  * side must not produce ±∞). PSI < 0.1 is the usual "no action"
  * threshold, 0.1–0.25 "investigate", > 0.25 "shift".
  *
  * Cross-engine float discipline (the x_dsir_weights pattern): ln runs
  * once per OCCUPIED BIN (≤ ~40 values), immediately rounded to a 1e6
  * fixed-point integer w_b; the graded per-bin contribution is then the
  * exact integer ((a_b+1)·(B+K) − (b_b+1)·(A+K)) · w_b — the (p − q)
  * factor multiplied through by the positive denominators, which
  * preserves sign and order-independence without ever comparing floats.
  * (A, B = slice totals; K = occupied-bin count; the true PSI is the
  * contribution sum divided by (A+K)(B+K)·1e6 — monotone rescaling, so
  * thresholding works on the integer directly.)
  *
  * Scale posture: two filtered aggregations on the bin key (≤ dozens of
  * groups) over one narrow projection of the corpus; the bin table is
  * broadcast-sized; zero windows, zero driver state beyond the 1-row
  * totals frame.
  */
object Drift {

  /** Token-count bin width (data-independent fixed grid). */
  val PSI_BIN = 16L
  val PSI_SCALE = 1000000L

  val xPsiDrift = Q(
    "x_psi_drift",
    s"""WITH t AS (SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) // $PSI_BIN AS bin,
           doc_id <= (SELECT CAST(floor(0.8 * max(doc_id)) AS BIGINT) FROM documents) AS ref
         FROM documents),
       h AS (SELECT bin,
               CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN ref THEN 0 ELSE 1 END) AS BIGINT) AS b
             FROM t GROUP BY bin),
       tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
                      CAST(count(*) AS BIGINT) AS k FROM h)
       SELECT bin, a AS n_ref, b AS n_new,
              CAST(round($PSI_SCALE * ln((CAST(a + 1 AS DOUBLE) / (ta + k)) /
                                         (CAST(b + 1 AS DOUBLE) / (tb + k)))) AS BIGINT) AS w_fix,
              CAST(((a + 1) * (tb + k) - (b + 1) * (ta + k)) *
                   CAST(round($PSI_SCALE * ln((CAST(a + 1 AS DOUBLE) / (ta + k)) /
                                              (CAST(b + 1 AS DOUBLE) / (tb + k)))) AS BIGINT) AS BIGINT) AS contrib_fix
       FROM h, tot ORDER BY bin""") { (s, dir) =>
    val docs = T(s, dir, "documents")
    val cut = Incremental.cutoffValue(docs)
    val t = docs.select(
      expr(s"size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
        .cast("long").as("n_tok"),
      (col("doc_id") <= cut).as("ref"))
      .select(expr(s"n_tok div $PSI_BIN").as("bin"), col("ref"))
    val h = t.groupBy("bin").agg(
      sum(when(col("ref"), 1L).otherwise(0L)).as("a"),
      sum(when(col("ref"), 0L).otherwise(1L)).as("b"))
    val tot = h.agg(sum("a").as("ta"), sum("b").as("tb"),
      count(lit(1)).as("k"))
    val w = round(lit(PSI_SCALE.toDouble) *
      log(((col("a") + 1).cast("double") / (col("ta") + col("k"))) /
          ((col("b") + 1).cast("double") / (col("tb") + col("k")))))
      .cast("long")
    h.crossJoin(broadcast(tot))
      .select(col("bin"), col("a").as("n_ref"), col("b").as("n_new"),
        w.as("w_fix"),
        (((col("a") + 1) * (col("tb") + col("k")) -
          (col("b") + 1) * (col("ta") + col("k"))) * w).as("contrib_fix"))
      .orderBy("bin")
  }

  val all: Seq[Q] = Seq(xPsiDrift)
}
