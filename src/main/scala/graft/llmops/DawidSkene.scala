package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Dawid–Skene label aggregation (the one-coin model) — the standard
  * crowd/RLHF answer to "three imperfect labelers disagree; what's the
  * label, and who do I trust?" Majority vote weighs every annotator
  * equally; DS jointly estimates per-annotator ACCURACY and per-item
  * posteriors by EM, so a noisy labeler gets discounted exactly as much
  * as the data says it deserves (Dawid & Skene 1979; the aggregation
  * behind most preference-data QA stacks).
  *
  * Model/EM, all in 10⁶ fixed-point BIGINT (the x_bt_rating
  * discipline — both engines run the identical integer program, so the
  * learned accuracies are bit-equal):
  *   init  q_i = mean vote (majority posterior)
  *   M     p_a = Σ_i [vote_ai ? q_i : 1−q_i] / n
  *   E     q_i = w1/(w1+w0), w1 = Π_a (vote_ai ? p_a : 1−p_a),
  *                           w0 = Π_a (vote_ai ? 1−p_a : p_a)
  * Two EM rounds unrolled. With 3 annotators the E-step products are
  * ≤ 10¹⁸ < 2⁶³ — no overflow; annotator count beyond ~3 switches the
  * product to log-space fixed point (noted, not needed here).
  *
  * Fixture annotators (deterministic, planted reliability order):
  *   a1 = n_chars ≥ 300 (the reference signal)
  *   a2 = word count ≥ 55 (correlated but independent errors)
  *   a3 = a1 with a 25% md5-coin vote flip (the noisy labeler DS must
  *        learn to discount: the graded row asserts pa3 < pa1 in data)
  *
  * Scale posture: the M step is one hash agg over items per annotator
  * (annotator domain is a roster — single digits); the E step is a
  * row-wise projection with the 3 learned accuracies broadcast as a
  * 1-row frame. EM rounds are fixed and unrolled: 2 passes over the
  * items, nothing iterative in the driver, no corpus-sized state.
  */
object DawidSkene {

  /** Fixed-point scale. */
  val DS_S = 1000000L

  private def w(v: String, p: String): String =
    s"(CASE WHEN $v = 1 THEN $p ELSE ${DS_S} - $p END)"
  private def wNeg(v: String, p: String): String =
    s"(CASE WHEN $v = 1 THEN ${DS_S} - $p ELSE $p END)"

  /** One EM round as SQL text over a votes relation `vt(doc_id, v1, v2,
    * v3, q)` → (p1, p2, p3 scalars; new q per item). Shared verbatim by
    * both engines.
    */
  /** Integer floor-div spelled per engine (`//` DuckDB, `div` Spark) —
    * the one token the otherwise-verbatim EM text can't share.
    */
  private def mStep(qRel: String, fdiv: String): String =
    s"""SELECT
         CAST(sum(CASE WHEN v1 = 1 THEN q ELSE ${DS_S} - q END)
           $fdiv count(*) AS BIGINT) AS p1,
         CAST(sum(CASE WHEN v2 = 1 THEN q ELSE ${DS_S} - q END)
           $fdiv count(*) AS BIGINT) AS p2,
         CAST(sum(CASE WHEN v3 = 1 THEN q ELSE ${DS_S} - q END)
           $fdiv count(*) AS BIGINT) AS p3
       FROM $qRel"""

  /** q = w1·S/(w1+w0) restructured as w1 / ((w1+w0)/S): keeps every
    * intermediate ≤ 2·10¹⁸ (w products are ≤ 10¹⁸; the naive w1·S would
    * overflow BIGINT). Denominator ≥ (5·10⁴)³·2/S — never zero while
    * accuracies stay inside (0,1), which the M step guarantees on any
    * non-degenerate vote table.
    */
  private def eStep(qRel: String, pRel: String, fdiv: String): String =
    s"""SELECT doc_id, v1, v2, v3,
         (${w("v1", "p1")} * ${w("v2", "p2")} * ${w("v3", "p3")}) $fdiv
         ((${w("v1", "p1")} * ${w("v2", "p2")} * ${w("v3", "p3")} +
           ${wNeg("v1", "p1")} * ${wNeg("v2", "p2")} * ${wNeg("v3", "p3")})
           $fdiv $DS_S)
           AS q
       FROM $qRel, $pRel"""

  val xDawidSkene = Q(
    "x_dawid_skene", {
      val votes =
        s"""SELECT doc_id,
             CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS v1,
             CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1 ELSE 0 END
               AS v2,
             CASE WHEN (('0x' || substr(md5('ds:' ||
                 CAST(doc_id AS VARCHAR)), 1, 1))::BIGINT % 4) = 0
               THEN 1 - (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
               ELSE (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) END AS v3
           FROM documents"""
      s"""WITH vt AS ($votes),
         q0 AS (SELECT doc_id, v1, v2, v3,
                  ((v1 + v2 + v3) * $DS_S) // 3 AS q FROM vt),
         p1t AS (${mStep("q0", "//")}),
         q1 AS (${eStep("q0", "p1t", "//")}),
         p2t AS (${mStep("q1", "//")}),
         q2 AS (${eStep("q1", "p2t", "//")})
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM q2) AS n_items,
                p2t.p1 AS pa1_fix, p2t.p2 AS pa2_fix, p2t.p3 AS pa3_fix,
                (SELECT CAST(sum(CASE WHEN q * 2 >= $DS_S THEN 1 ELSE 0 END)
                   AS BIGINT) FROM q2) AS n_pos,
                (SELECT CAST(sum(CASE WHEN (q * 2 >= $DS_S) =
                    (v1 + v2 + v3 >= 2) THEN 1 ELSE 0 END) AS BIGINT)
                 FROM q2) AS n_majority_agree,
                (p2t.p3 < p2t.p1) AS noisy_discounted
         FROM p2t"""
    }) { (s, dir) =>
    val vt = T(s, dir, "documents").select(col("doc_id"),
      when(col("n_chars") >= 300, 1L).otherwise(0L).as("v1"),
      when(size(split(col("text"), " ")) >= 55, 1L).otherwise(0L).as("v2"),
      when(expr(
          """cast(conv(substring(md5(concat('ds:', cast(doc_id as string))),
             1, 1), 16, 10) as bigint) % 4 = 0"""),
        lit(1L) - when(col("n_chars") >= 300, 1L).otherwise(0L))
        .otherwise(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("v3"))
      .localCheckpoint() // votes feed 4 unrolled EM passes

    def m(q: DataFrame): DataFrame = q.agg(
      expr(s"CAST(sum(CASE WHEN v1 = 1 THEN q ELSE $DS_S - q END) " +
        "div count(*) AS BIGINT)").as("p1"),
      expr(s"CAST(sum(CASE WHEN v2 = 1 THEN q ELSE $DS_S - q END) " +
        "div count(*) AS BIGINT)").as("p2"),
      expr(s"CAST(sum(CASE WHEN v3 = 1 THEN q ELSE $DS_S - q END) " +
        "div count(*) AS BIGINT)").as("p3"))
    def e(q: DataFrame, p: DataFrame): DataFrame =
      q.crossJoin(broadcast(p)).select(col("doc_id"),
        col("v1"), col("v2"), col("v3"),
        expr(s"""(${w("v1", "p1")} * ${w("v2", "p2")} * ${w("v3", "p3")}) div
                ((${w("v1", "p1")} * ${w("v2", "p2")} * ${w("v3", "p3")} +
                  ${wNeg("v1", "p1")} * ${wNeg("v2", "p2")} *
                  ${wNeg("v3", "p3")}) div $DS_S)""").as("q"))

    val q0 = vt.withColumn("q", expr(s"((v1 + v2 + v3) * $DS_S) div 3"))
    val p1t = m(q0)
    val q1 = e(q0, p1t)
    val p2t = m(q1)
    val q2 = e(q1, p2t)

    val facts = q2.agg(count(lit(1)).as("n_items"),
      sum(when(col("q") * 2 >= DS_S, 1L).otherwise(0L)).as("n_pos"),
      sum(when((col("q") * 2 >= DS_S) ===
        (col("v1") + col("v2") + col("v3") >= 2L), 1L).otherwise(0L))
        .as("n_majority_agree"))
    facts.crossJoin(p2t)
      .select(col("n_items"),
        col("p1").as("pa1_fix"), col("p2").as("pa2_fix"),
        col("p3").as("pa3_fix"), col("n_pos"), col("n_majority_agree"),
        (col("p3") < col("p1")).as("noisy_discounted"))
  }

  val all: Seq[Q] = Seq(xDawidSkene)
}
