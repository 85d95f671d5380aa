package graft.llmops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Q

/** Cluster-quality audit: the silhouette coefficient of the label
  * partition over embedding cosine distance — the standard "is this
  * grouping geometrically real?" number (Rousseeuw 1987). For point i
  * with intra-group mean distance a(i) and nearest-other-group mean
  * distance b(i), sil(i) = (b−a)/max(a,b) ∈ [−1, 1]; ~0 means the
  * partition is geometrically arbitrary — which is exactly what this
  * fixture's labels are (measured 1-NN label agreement 0.096,
  * LabelPropSpec), so the audit's job here is to REPORT that honestly.
  *
  * Exactness is TOTAL: pair similarities are 1e6 fixed-point cosines
  * (silhouette-grid margin family); per-(point, group) sums are exact
  * integers; with distance d = (1e6 − s)/1e6, sil reduces to the
  * integer rational
  *     num = sa·nb − sb·na,   den = na·nb·1e6 − min(sa·nb, sb·na)
  * (sa/na = own-group mean similarity over na = |own|−1 points,
  * sb/nb = best other-group mean) and ships as a sign-split 1e6
  * quotient. The b-group SELECTION ranks the ≤|labels| candidate means
  * by one exact IEEE division of identical integers (bit-identical
  * cross-engine, label tiebreak) — no libm anywhere.
  *
  * Scale posture: one all-pairs fixsim grid (the audit-sized candidate
  * generator — at corpus scale per-group means come from
  * centroid/sketch summaries, not dense pairs) → (point, group) hash
  * agg → per-point argmax over ≤|labels| rows. No corpus-wide window.
  */
object Silhouette {

  val xClusterSilhouette = Q(
    "x_cluster_silhouette",
    """WITH e AS MATERIALIZED (SELECT vec_id, label,
             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       g AS MATERIALIZED (SELECT a.vec_id AS i, a.label AS own, b.label AS grp,
               CAST(sum(CAST(round(1000000 * list_cosine_similarity(a.v, b.v))
                 AS BIGINT)) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
             FROM e a JOIN e b ON a.vec_id <> b.vec_id
             GROUP BY 1, 2, 3),
       own AS (SELECT i, own, s AS sa, n AS na FROM g WHERE grp = own),
       oth AS (SELECT i, grp AS b_label, s AS sb, n AS nb FROM (
               SELECT i, grp, s, n,
                      row_number() OVER (PARTITION BY i
                        ORDER BY CAST(s AS DOUBLE) / n DESC, grp) AS rr
               FROM g WHERE grp <> own)
             WHERE rr = 1)
       SELECT own.i AS vec_id, own.own AS label, oth.b_label,
              sa, na, sb, nb,
              sa * nb - sb * na AS sil_num,
              na * nb * 1000000 - least(sa * nb, sb * na) AS sil_den,
              CASE WHEN sa * nb - sb * na < 0
                   THEN -((1000000 * -(sa * nb - sb * na))
                          // (na * nb * 1000000 - least(sa * nb, sb * na)))
                   ELSE (1000000 * (sa * nb - sb * na))
                        // (na * nb * 1000000 - least(sa * nb, sb * na)) END
                AS sil_fix
       FROM own JOIN oth ON own.i = oth.i
       ORDER BY vec_id""") { (s, dir) =>
    val e = VectorSearch.embeddingsBase(s, dir)
      .select("vec_id", "label", "n_emb")
    val g = e.select(col("vec_id").as("i"), col("label").as("own"),
        col("n_emb").as("ei"))
      .join(e.select(col("vec_id").as("j"), col("label").as("grp"),
        col("n_emb").as("ej")), col("i") =!= col("j"))
      .select(col("i"), col("own"), col("grp"),
        round(VectorSearch.dot(col("ei"), col("ej")) * 1000000L)
          .cast("long").as("sij"))
      .groupBy("i", "own", "grp")
      .agg(sum(col("sij")).as("s"), count(lit(1)).as("n"))
    val own = g.filter(col("grp") === col("own"))
      .select(col("i"), col("own").as("label"),
        col("s").as("sa"), col("n").as("na"))
    val oth = g.filter(col("grp") =!= col("own"))
      .withColumn("rr", row_number().over(Window.partitionBy(col("i"))
        .orderBy((col("s").cast("double") / col("n")).desc, col("grp"))))
      .filter(col("rr") === 1)
      .select(col("i"), col("grp").as("b_label"),
        col("s").as("sb"), col("n").as("nb"))
    own.join(oth, "i")
      .select(col("i").as("vec_id"), col("label"), col("b_label"),
        col("sa"), col("na"), col("sb"), col("nb"),
        (col("sa") * col("nb") - col("sb") * col("na")).as("sil_num"),
        (col("na") * col("nb") * 1000000L -
          least(col("sa") * col("nb"), col("sb") * col("na"))).as("sil_den"))
      .withColumn("sil_fix",
        when(col("sil_num") < 0, -expr("(1000000 * -sil_num) div sil_den"))
          .otherwise(expr("(1000000 * sil_num) div sil_den")))
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(xClusterSilhouette)
}
