package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Q

/** Scalar quantization (SQ8) vector search — the memory-bandwidth
  * workhorse of billion-vector serving: each dimension of the unit
  * vector is mapped to a signed 8-bit code q_d = round(127·x_d / m_d)
  * (m_d = per-dimension max |x_d|, the trained codebook — D floats of
  * model state, vs PQ's k·D). Search scans INTEGER dot products over
  * the codes (4 bytes/dim → 1), takes a candidate pool, then re-ranks
  * only the pool with exact float similarity.
  *
  * x_sq8_search is the recall audit for that layout (the x_pq_recall
  * pattern): SQ8 top-CAND → exact re-rank → top-10, compared against
  * the exact top-10; the graded fact is recall ≥ 0.9 per probe, the
  * derived-fact oracle a DuckDB engine can check. The spec additionally
  * measures the raw code/candidate overlap so the gate is not
  * trivially-true (quantization must actually be lossy).
  *
  * Scale posture: codebook = D values of driver state (the IVF-centroid
  * acceptance class). Candidate selection is a bounded-heap TopKByScore
  * aggregation — map-side partials keep the shuffle at ≤ CAND rows per
  * probe per partition, never a corpus-wide window. At 100 TB the
  * integer-dot scan is embarrassingly parallel over code shards; the
  * exact ground-truth arm exists only because this is an audit.
  */
object Quantize {

  /** SQ candidate pool per probe (re-ranked exactly). */
  val CAND = 50

  /** Graded neighbors per probe. */
  val TOPK = 10

  /** Exact-sim fixed point used for deterministic ranking. */
  val SIM_SCALE = 1000000000L

  /** (vec_id, n_emb, q): unit vectors plus their int8 code arrays. */
  private[llmops] def codes(s: SparkSession, dir: String): DataFrame =
    codesFrom(VectorSearch.embeddingsBase(s, dir).select("vec_id", "n_emb"))

  private[graft] def codesFrom(base: DataFrame): DataFrame = {
    // per-dimension max|x|: D-bounded driver state (codebook)
    val m = base
      .select(posexplode(col("n_emb")).as(Seq("d", "x")))
      .groupBy("d").agg(max(abs(col("x"))).as("mx"))
      .orderBy("d").select("mx")
      .collect().map(_.getDouble(0)).toSeq
    val mlit = typedLit(m)
    base.withColumn("q",
      transform(col("n_emb"), (x, i) =>
        round(lit(127.0) * x / element_at(mlit, (i + 1).cast("int")))
          .cast("int")))
  }

  val xSq8Search = Q(
    "x_sq8_search",
    """SELECT vec_id AS probe_id, TRUE AS recall_ok
       FROM embeddings WHERE vec_id < 5 ORDER BY probe_id""") { (s, dir) =>
    val c = codes(s, dir)
    val probes = c.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"),
        col("n_emb").as("p_emb"), col("q").as("pq"))
    val scored = c.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"), col("n_emb"), col("p_emb"),
        expr("""aggregate(zip_with(q, pq, (a, b) -> cast(a as bigint) * b),
                0L, (acc, v) -> acc + v)""").as("iscore"),
        (round(VectorSearch.dot(col("n_emb"), col("p_emb")) * SIM_SCALE))
          .cast("long").as("fsim"))
    val topC = graft.functions.TopKByScore.topK(CAND)
    val top10 = graft.functions.TopKByScore.topK(TOPK)
    // SQ path: integer-dot candidates, then exact re-rank of the pool
    val cand = scored.groupBy("probe_id")
      .agg(topC(col("iscore"), col("vec_id")).as("top"))
      .select(col("probe_id"), explode(col("top.id")).as("vec_id"))
    val sq = cand
      .join(scored.select("probe_id", "vec_id", "fsim"),
        Seq("probe_id", "vec_id"))
      .groupBy("probe_id")
      .agg(top10(col("fsim"), col("vec_id")).as("t"))
      .select(col("probe_id"), col("t.id").as("sq_ids"))
    // ground truth: exact top-10 over the full corpus
    val exact = scored.groupBy("probe_id")
      .agg(top10(col("fsim"), col("vec_id")).as("t"))
      .select(col("probe_id"), col("t.id").as("exact_ids"))
    sq.join(exact, "probe_id")
      .select(col("probe_id"),
        (size(array_intersect(col("sq_ids"), col("exact_ids"))) >= 9)
          .as("recall_ok"))
      .orderBy("probe_id")
  }

  val all: Seq[Q] = Seq(xSq8Search)
}
