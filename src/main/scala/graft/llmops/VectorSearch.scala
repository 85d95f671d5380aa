package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables => T}

/** Similarity search over an embedding column (SURVEY.md §2b Q34 + the
  * training-data-ops extensions).
  *
  * Everything is expressed with higher-order functions (zip_with +
  * aggregate) — codegen-friendly, no UDF deserialization per row.
  *
  * Scale posture: brute-force top-k is a broadcast of the probe set over
  * a single scan of the corpus (embarrassingly parallel, no shuffle until
  * the per-probe top-k), which is the right *exact* plan at any corpus
  * size for small probe sets. The IVF variant below bounds scanned rows
  * per probe for the large-probe-set / low-latency regime.
  */
object VectorSearch {

  /** dot(a, b) — codegen'd native expression (graft.functions). */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayOps.dot(a, b)

  /** cosine(a, b) — mirrors DuckDB's dot/(sqrt(na)*sqrt(nb)) shape. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Q34 — exact top-10 cosine neighbors for probe vectors (vec_id < 5).
    * Similarity is used only for ranking (with vec_id tiebreak), never
    * output — so cross-engine last-ulp float noise cannot flip the hash.
    */
  val q34 = Q(
    "q34_vector_topk",
    """SELECT probe_id, rn AS rank, vec_id, label FROM (
         SELECT p.vec_id AS probe_id, e.vec_id AS vec_id, e.label,
                row_number() OVER (
                  PARTITION BY p.vec_id
                  ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(p.embedding AS DOUBLE[])) DESC,
                           e.vec_id) AS rn
         FROM embeddings e
         CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) p)
       WHERE rn <= 10 ORDER BY probe_id, rank""") { (s, dir) =>
    // normalize once per vector => each candidate pair costs ONE dot
    val e = T(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        graft.functions.ArrayOps.l2normalize(col("embedding")).as("n_emb"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("n_emb").as("p_emb"))
    val scored = e.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"), col("label"),
        dot(col("n_emb"), col("p_emb")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("label"))
      .orderBy("probe_id", "rank")
  }

  /** X — embedding-cosine near-dup: each vector's single nearest neighbor
    * (rank-1 by cosine, self excluded). Threshold-free output keeps the
    * result hash-stable; at corpus scale the same query runs over LSH /
    * IVF candidates instead of the full cross product.
    */
  val xNearestNeighbor = Q(
    "x_embed_nn",
    """SELECT vec_id, nn_id FROM (
         SELECT a.vec_id, b.vec_id AS nn_id,
                row_number() OVER (
                  PARTITION BY a.vec_id
                  ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                  CAST(b.embedding AS DOUBLE[])) DESC,
                           b.vec_id) AS rn
         FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
       WHERE rn = 1 ORDER BY vec_id""") { (s, dir) =>
    val e = T(s, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.ArrayOps.l2normalize(col("embedding")).as("n_emb"))
    val a = e.select(col("vec_id"), col("n_emb").as("a_emb"))
    val b = e.select(col("vec_id").as("nn_id"), col("n_emb").as("b_emb"))
    // rank by max dot instead of a row_number window: the 4M-row pair
    // stream reduces map-side to one (best_sim, best_id) pair per vector
    a.join(b, col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"),
        struct(dot(col("a_emb"), col("b_emb")).as("sim"),
          (-col("nn_id")).as("neg_id")).as("cand"))
      .groupBy(col("vec_id"))
      .agg(max(col("cand")).as("best"))
      .select(col("vec_id"), (-col("best.neg_id")).cast("long").as("nn_id"))
      .orderBy("vec_id")
  }

  /** X — IVF-style ANN: coarse-quantize vectors into buckets by the sign
    * pattern of a few fixed pseudo-random hyperplanes, probe only the
    * query's bucket ± neighbors. Approximate ⇒ rows-only check (the exact
    * twin above is the correctness anchor); the point of this entry is
    * the scale path: per-probe scanned rows drop by ~|buckets|×.
    */
  val xAnnIvf = Q.noOracle("x_ann_ivf") { (s, dir) =>
    val e = T(s, dir, "embeddings")
    // 4 fixed hyperplanes => 16 buckets; key = sign bits of dot(v, h_i)
    val planes = MinHashConstants.hyperplanes(4, 64)
    def bucket(emb: Column): Column =
      (0 until 4).map { i =>
        val p = array(planes(i).map(lit): _*)
        when(dot(emb.cast("array<double>"), p) >= 0, 1 << i).otherwise(0)
      }.reduce(_ + _)
    val bucketed = e.withColumn("bucket", bucket(col("embedding")))
    val probes = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("bucket").as("p_bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    bucketed.join(broadcast(probes), col("bucket") === col("p_bucket"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("p_emb")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("probe_id"), col("rank"), col("vec_id"))
      .orderBy("probe_id", "rank")
  }

  val all: Seq[Q] = Seq(q34, xNearestNeighbor, xAnnIvf)
}

/** Fixed pseudo-random constants shared by approximate operators. */
object MinHashConstants {
  /** `n` deterministic hyperplanes of dimension `dim` in [-1, 1]. */
  def hyperplanes(n: Int, dim: Int): Array[Array[Double]] = {
    var x = 0x51_7c_c1_b7_27_22_0a_95L
    def next(): Double = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(n)(Array.fill(dim)(next()))
  }
}
