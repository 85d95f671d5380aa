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
    // the stream side inherits the cached base's single input partition,
    // which ran the whole O(n²) dot grid in ONE task (profiled: a lone
    // 2.5 s single-task stage = the query wall) — spread the point rows
    // over the task slots; the grid work parallelizes embarrassingly.
    // (A broadcast collect_list + explode spelling was tried and
    // reverted: Generate + struct-field extraction measured ~5× more CPU
    // per pair than the nested-loop join's row machinery.)
    val g = e.select(col("vec_id").as("i"), col("label").as("own"),
        col("n_emb").as("ei"))
      .repartition(s.sparkContext.defaultParallelism)
      .join(e.select(col("vec_id").as("j"), col("label").as("grp"),
        col("n_emb").as("ej")), col("i") =!= col("j"))
      .select(col("i"), col("own"), col("grp"),
        round(VectorSearch.dot(col("ei"), col("ej")) * 1000000L)
          .cast("long").as("sij"))
      .groupBy("i", "own", "grp")
      .agg(sum(col("sij")).as("s"), count(lit(1)).as("n"))
    // ONE aggregation over the (i, grp) rows extracts the own-group pair
    // (sa, na) and the argmax other group at once. The two-arm
    // filter/join spelling evaluated the ENTIRE pair grid twice (one
    // broadcast-hash pass for grp = own, one nested-loop pass for
    // grp ≠ own) and re-joined the arms through a sort-merge + window;
    // this runs the dot grid once and drops the join and the window.
    // The b-group selection is unchanged: min(struct(-s/n, grp, ...))
    // ranks by the identical IEEE double ratio descending with the same
    // grp tiebreak. Points whose own group has no other member (no
    // grp = own row) still drop, as the inner join dropped them.
    g.groupBy(col("i"))
      .agg(
        max(when(col("grp") === col("own"),
          struct(col("own").as("l"), col("s").as("sa"), col("n").as("na"))))
          .as("o"),
        min(when(col("grp") =!= col("own"),
          struct((-(col("s").cast("double") / col("n"))).as("negr"),
            col("grp").as("g"), col("s").as("sb"), col("n").as("nb"))))
          .as("b"))
      .filter(col("o").isNotNull && col("b").isNotNull)
      .select(col("i").as("vec_id"), col("o.l").as("label"),
        col("b.g").as("b_label"),
        col("o.sa").as("sa"), col("o.na").as("na"),
        col("b.sb").as("sb"), col("b.nb").as("nb"))
      .select(col("vec_id"), col("label"), col("b_label"),
        col("sa"), col("na"), col("sb"), col("nb"),
        (col("sa") * col("nb") - col("sb") * col("na")).as("sil_num"),
        (col("na") * col("nb") * 1000000L -
          least(col("sa") * col("nb"), col("sb") * col("na"))).as("sil_den"))
      .withColumn("sil_fix",
        when(col("sil_num") < 0, -expr("(1000000 * -sil_num) div sil_den"))
          .otherwise(expr("(1000000 * sil_num) div sil_den")))
      .orderBy("vec_id")
  }

  /** X — the CORPUS-SCALE silhouette twin (the spelling
    * xClusterSilhouette's scaladoc promises): the simplified silhouette
    * of Hruschka et al. — a(i) = distance to the OWN-group centroid,
    * b(i) = distance to the nearest OTHER-group centroid — which
    * replaces the dense n² pair grid with an n×k centroid grid, the
    * x_common_neighbors_capped discipline of shipping the bounded
    * spelling beside the exact audit.
    *
    * Exactness without a float centroid: per-point components are 1e6
    * fixed-point integers; group centroids are the ELEMENT-WISE
    * sign-split integer-division means of those (exact, order-free
    * integer sums; the quantization is part of the operator's
    * definition, identical in both engines). Every dot product
    * (x·m, x·x, m·m) is then an exact BIGINT (|component| ≤ 6·10⁵ at
    * unit-ish norm, 64 dims → ≤ 2.3·10¹³ — int64 headroom to ~10⁹-dim
    * vectors), and the only float step is
    * cos_fix = round(1e6 · x·m / (√(x·x)·√(m·m))) — multiply, two
    * correctly-rounded sqrts, one divide, one round, all on IDENTICAL
    * integer inputs, hence bit-identical cross-engine (the q33/fixsim
    * precedent; margins audited in RoundingMarginSpec's
    * silhouette-centroid family). From there everything is integer:
    * a = 1e6 − cos_own, b over the ≤k−1 other groups (max cos, label
    * tiebreak), sil = 1e6·(b−a) DIV max(a,b), sign-split.
    *
    * Scale posture: one narrow quantization pass, one (label, dim)
    * hash agg for the k centroids (k·dim driver-free rows), a
    * broadcast of the k-row centroid table, and per-point work that is
    * O(k·dim) — no pair grid, no corpus-wide window (the per-point
    * argmax ranks ≤k broadcast rows). This is the spelling that runs
    * at 100 TB; the dense xClusterSilhouette stays as the audit-sized
    * exact variant.
    */
  val xSilhouetteScaled = Q(
    "x_silhouette_scaled",
    """WITH e AS MATERIALIZED (
         SELECT vec_id, label,
                list_transform(CAST(embedding AS DOUBLE[]),
                  c -> CAST(round(1000000 * c) AS BIGINT)) AS x
         FROM embeddings),
       ex AS MATERIALIZED (
         SELECT vec_id, label, unnest(x) AS v,
                unnest(generate_series(1, len(x))) AS i
         FROM e),
       ci AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS sv,
                CAST(count(*) AS BIGINT) AS n
              FROM ex GROUP BY 1, 2),
       cm AS MATERIALIZED (
         SELECT label AS grp, i,
                CASE WHEN sv < 0 THEN -((-sv) // n) ELSE sv // n END AS mv
         FROM ci),
       xx AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS dxx
              FROM ex GROUP BY 1),
       mm AS (SELECT grp, CAST(sum(mv * mv) AS BIGINT) AS dmm
              FROM cm GROUP BY 1),
       pg AS (SELECT ex.vec_id, ex.label, cm.grp,
                CAST(sum(ex.v * cm.mv) AS BIGINT) AS dxm
              FROM ex JOIN cm ON ex.i = cm.i
              GROUP BY 1, 2, 3),
       cosg AS MATERIALIZED (
         SELECT p.vec_id, p.label, p.grp,
                CAST(round(1000000 * (CAST(p.dxm AS DOUBLE) /
                  (sqrt(CAST(xx.dxx AS DOUBLE)) * sqrt(CAST(mm.dmm AS DOUBLE)))))
                  AS BIGINT) AS cf
         FROM pg p JOIN xx USING (vec_id) JOIN mm USING (grp)),
       own AS (SELECT vec_id, label, 1000000 - cf AS a_fix
               FROM cosg WHERE grp = label),
       oth AS (SELECT vec_id, grp AS b_label, 1000000 - cf AS b_fix FROM (
                 SELECT vec_id, grp, cf,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY cf DESC, grp) AS rr
                 FROM cosg WHERE grp <> label) WHERE rr = 1)
       SELECT own.vec_id, own.label, oth.b_label, a_fix, b_fix,
              b_fix - a_fix AS sil_num,
              greatest(a_fix, b_fix) AS sil_den,
              CASE WHEN b_fix - a_fix < 0
                   THEN -((1000000 * (a_fix - b_fix)) // greatest(a_fix, b_fix))
                   ELSE (1000000 * (b_fix - a_fix)) // greatest(a_fix, b_fix) END
                AS sil_fix
       FROM own JOIN oth USING (vec_id)
       ORDER BY vec_id""") { (s, dir) =>
    simplifiedSilhouette(VectorSearch.embeddingsBase(s, dir)
      .select(col("vec_id"), col("label"), col("emb")))
  }

  /** The simplified-silhouette DAG over (vec_id, label, emb) — exposed
    * so the SCALE-SIL probe can run it on replicated corpora.
    */
  private[graft] def simplifiedSilhouette(
      emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
      expr("transform(emb, c -> cast(round(1000000 * c) as bigint))").as("x"))
    val ex = e.select(col("vec_id"), col("label"),
        posexplode(col("x")).as(Seq("p", "v")))
      .select(col("vec_id"), col("label"), (col("p") + 1).as("i"), col("v"))
    val cm = ex.groupBy(col("label"), col("i"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .select(col("label").as("grp"), col("i"),
        expr("CASE WHEN sv < 0 THEN -((-sv) div n) ELSE sv div n END")
          .as("mv"))
    // k-row centroid table, re-assembled as arrays for the codegen'd dots
    val cent = cm.groupBy(col("grp"))
      .agg(expr("transform(array_sort(collect_list(struct(i, mv))), s -> s.mv)")
        .as("m"))
      .withColumn("dmm",
        expr("aggregate(transform(m, a -> a * a), 0L, (acc, t) -> acc + t)"))
    val pts = e.withColumn("dxx",
      expr("aggregate(transform(x, a -> a * a), 0L, (acc, t) -> acc + t)"))
    val cosg = pts.crossJoin(broadcast(cent))
      .withColumn("dxm",
        expr("aggregate(zip_with(x, m, (a, b) -> a * b), 0L, (acc, t) -> acc + t)"))
      .select(col("vec_id"), col("label"), col("grp"),
        expr("""cast(round(1000000 * (cast(dxm as double) /
                (sqrt(cast(dxx as double)) * sqrt(cast(dmm as double)))))
                as bigint)""").as("cf"))
    // ONE aggregation extracts a and the argmin-b from the n×k grid:
    // min over (d, grp) structs = smallest distance, label tiebreak —
    // no window, no self-join, and the centroid subtree is evaluated
    // once (the two-arm filter/join spelling re-planned the whole
    // centroid aggregation per arm)
    cosg.groupBy(col("vec_id"), col("label"))
      .agg(
        max(when(col("grp") === col("label"), lit(1000000L) - col("cf")))
          .as("a_fix"),
        min(when(col("grp") =!= col("label"),
          struct((lit(1000000L) - col("cf")).as("d"), col("grp").as("g"))))
          .as("bb"))
      .select(col("vec_id"), col("label"), col("bb.g").as("b_label"),
        col("a_fix"), col("bb.d").as("b_fix"))
      .select(col("vec_id"), col("label"), col("b_label"),
        col("a_fix"), col("b_fix"),
        (col("b_fix") - col("a_fix")).as("sil_num"),
        greatest(col("a_fix"), col("b_fix")).as("sil_den"))
      .withColumn("sil_fix",
        when(col("sil_num") < 0,
          -expr("(1000000 * -sil_num) div sil_den"))
          .otherwise(expr("(1000000 * sil_num) div sil_den")))
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(xClusterSilhouette, xSilhouetteScaled)
}
