package graft.llmops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Q

/** Retrieval evaluation — the IR-metrics harness a pipeline runs to
  * decide whether a retriever is good enough to ship (and the missing
  * third leg beside the retrievers themselves — q34/x_ivfpq/x_bm25 —
  * and their fusion x_rrf_fusion): per query, against a ground-truth
  * relevance set, grade the ranked list.
  *
  * Relevance here is the label column of the embeddings table (the
  * x_knn_label convention: same label = relevant, self excluded);
  * the ranked list is the exact cosine top-K (q34's scorer). Metrics
  * per probe, all exact integers:
  *
  *   n_rel          — relevant candidates in the corpus
  *   hits_at_k      — relevant results inside the top-K
  *   first_rel_rank — rank of the first relevant result (0 = none)
  *   rr_fix         — reciprocal rank as the exact integer
  *                    RR_SCALE // first_rel_rank (0 = none); mean
  *                    over probes = MRR, computable downstream
  *
  * Scale posture: the probe set is fixed and broadcast; ranking is the
  * q34 shape (per-probe TakeOrdered, similarity never output); metric
  * aggregation is per-probe counts over K rows. The eval NEVER needs a
  * corpus-wide window.
  */
object RetrievalEval {

  val NPROBE = 10
  val TOPK = 10
  val RR_SCALE = 1000000L

  val xRetrievalEval = Q(
    "x_retrieval_eval",
    s"""WITH ranked AS (SELECT probe_id, p_label, vec_id, label, rn FROM (
           SELECT p.vec_id AS probe_id, p.label AS p_label,
                  e.vec_id AS vec_id, e.label,
                  row_number() OVER (PARTITION BY p.vec_id
                    ORDER BY round(list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]),
                        CAST(p.embedding AS DOUBLE[])), 6) DESC,
                      e.vec_id) AS rn
           FROM embeddings e
           CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < $NPROBE) p
           WHERE e.vec_id <> p.vec_id)
         WHERE rn <= $TOPK),
       rel AS (SELECT p.vec_id AS probe_id, CAST(count(*) AS BIGINT) AS n_rel
               FROM embeddings e
               JOIN (SELECT * FROM embeddings WHERE vec_id < $NPROBE) p
                 ON e.label = p.label AND e.vec_id <> p.vec_id
               GROUP BY 1),
       m AS (SELECT probe_id,
               CAST(sum(CASE WHEN label = p_label THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_k,
               CAST(coalesce(min(CASE WHEN label = p_label THEN rn END), 0) AS BIGINT) AS first_rel_rank
             FROM ranked GROUP BY 1)
       SELECT m.probe_id AS probe_id, rel.n_rel, m.hits_at_k, m.first_rel_rank,
              CASE WHEN m.first_rel_rank > 0
                   THEN $RR_SCALE // m.first_rel_rank ELSE 0 END AS rr_fix
       FROM m JOIN rel ON m.probe_id = rel.probe_id
       ORDER BY probe_id""") { (s, dir) =>
    val e = VectorSearch.embeddingsBase(s, dir)
      .select("vec_id", "label", "n_emb")
    val probes = e.filter(col("vec_id") < NPROBE)
      .select(col("vec_id").as("probe_id"), col("label").as("p_label"),
        col("n_emb").as("p_emb"))
    val ranked = e.join(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("p_label"), col("vec_id"), col("label"),
        round(VectorSearch.dot(col("n_emb"), col("p_emb")), 6).as("sim"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rn") <= TOPK)
    val rel = e.join(broadcast(probes), col("label") === col("p_label"))
      .filter(col("vec_id") =!= col("probe_id"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_rel"))
    val m = ranked.groupBy(col("probe_id"))
      .agg(
        sum(when(col("label") === col("p_label"), 1L).otherwise(0L))
          .as("hits_at_k"),
        coalesce(min(when(col("label") === col("p_label"), col("rn"))), lit(0))
          .cast("long").as("first_rel_rank"))
    m.join(rel, "probe_id")
      .select(col("probe_id"), col("n_rel"), col("hits_at_k"),
        col("first_rel_rank"),
        when(col("first_rel_rank") > 0,
          expr(s"$RR_SCALE div first_rel_rank")).otherwise(0L).as("rr_fix"))
      .orderBy("probe_id")
  }

  /** X — ranking-quality AUC: the full-ranking complement to
    * x_retrieval_eval's set-at-k metrics. Per probe, every candidate is
    * ranked by the q34 scorer (round(cos, 6) DESC, vec_id — a
    * deterministic TOTAL order, so ranks are distinct integers and the
    * Mann-Whitney U statistic needs no tie convention):
    *
    *   U = Σ_{relevant} rank_asc − n₁(n₁+1)/2,  AUC = U / (n₁·n₂)
    *
    * with rank_asc counted from the WORST end so larger U = better
    * ranking; U is an exact integer and AUC ships as the exact floor
    * fixed-point (1e6·U) // (n₁·n₂). Same relevance convention as
    * x_retrieval_eval / x_knn_label (same label, self excluded).
    *
    * Scale posture: ranking is one per-probe window over the broadcast
    * probe set; U is a filtered sum — no pairwise positive×negative
    * comparison ever materializes (that product is what U *counts*,
    * not what it computes).
    */
  val xAucEval = Q(
    "x_auc_eval",
    s"""WITH ranked AS (
           SELECT p.vec_id AS probe_id,
                  CAST(e.label = p.label AS INTEGER) AS rel,
                  row_number() OVER (PARTITION BY p.vec_id
                    ORDER BY round(list_cosine_similarity(
                        CAST(e.embedding AS DOUBLE[]),
                        CAST(p.embedding AS DOUBLE[])), 6) ASC,
                      e.vec_id DESC) AS rank_asc
           FROM embeddings e
           CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < $NPROBE) p
           WHERE e.vec_id <> p.vec_id),
       m AS (SELECT probe_id,
               CAST(sum(rel) AS BIGINT) AS n_pos,
               CAST(count(*) - sum(rel) AS BIGINT) AS n_neg,
               CAST(sum(CASE WHEN rel = 1 THEN rank_asc ELSE 0 END)
                 AS BIGINT) AS rank_sum
             FROM ranked GROUP BY probe_id)
       SELECT probe_id, n_pos, n_neg,
              rank_sum - n_pos * (n_pos + 1) // 2 AS u_stat,
              (1000000 * (rank_sum - n_pos * (n_pos + 1) // 2))
                // (n_pos * n_neg) AS auc_fix
       FROM m ORDER BY probe_id""") { (s, dir) =>
    val e = VectorSearch.embeddingsBase(s, dir)
      .select("vec_id", "label", "n_emb")
    val probes = e.filter(col("vec_id") < NPROBE)
      .select(col("vec_id").as("probe_id"), col("label").as("p_label"),
        col("n_emb").as("p_emb"))
    val ranked = e.join(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"),
        (col("label") === col("p_label")).cast("int").as("rel"),
        round(VectorSearch.dot(col("n_emb"), col("p_emb")), 6).as("sim"),
        col("vec_id"))
      .withColumn("rank_asc", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("sim").asc, col("vec_id").desc)))
    ranked.groupBy(col("probe_id"))
      .agg(sum(col("rel")).cast("long").as("n_pos"),
        (count(lit(1)) - sum(col("rel"))).cast("long").as("n_neg"),
        sum(when(col("rel") === 1, col("rank_asc")).otherwise(0L))
          .cast("long").as("rank_sum"))
      .select(col("probe_id"), col("n_pos"), col("n_neg"),
        expr("rank_sum - n_pos * (n_pos + 1) div 2").as("u_stat"),
        expr("(1000000 * (rank_sum - n_pos * (n_pos + 1) div 2)) div (n_pos * n_neg)")
          .as("auc_fix"))
      .orderBy("probe_id")
  }

  val all: Seq[Q] = Seq(xRetrievalEval, xAucEval)
}
