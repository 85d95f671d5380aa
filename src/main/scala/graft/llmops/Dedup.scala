package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables => T}

/** Exact deduplication + document fingerprinting for training-data
  * pipelines (SURVEY.md §2b Q32).
  *
  * Scale posture: exact dedup is a single hash shuffle on the content
  * digest — the 100 TB-safe plan (digest once per doc, shuffle digests,
  * never the full text twice). The deterministic survivor rule
  * (min doc_id per digest) makes reruns idempotent.
  */
object Dedup {

  /** Q32 — exact dedup on md5(text), keeping the lowest doc_id per digest. */
  val q32 = Q(
    "q32_exact_dedup",
    """SELECT doc_id, lang, n_chars, md5(text) AS digest FROM (
         SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         FROM documents) WHERE rn = 1
       ORDER BY doc_id""") { (s, dir) =>
    val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
    T(s, dir, "documents")
      .withColumn("digest", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("digest"))
      .orderBy("doc_id")
  }

  /** X-fingerprint — content-defined document fingerprint: the minimum
    * md5 over the document's 3-word shingles (a winnowing-style sketch;
    * robust to small edits unlike a whole-doc hash). One narrow pass +
    * one agg shuffle; no pairwise work.
    */
  val xFingerprint = Q(
    "x_doc_fingerprint",
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3)
       SELECT doc_id, min(md5(sh)) AS fingerprint
       FROM sh GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
    // distinct=false: min() is dup-insensitive, so the dedup shuffle
    // would be pure waste
    Shingles.wordShingles(T(s, dir, "documents"), 3, distinct = false)
      .groupBy(col("doc_id"))
      .agg(min(md5(col("sh"))).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Winnowing window (consecutive gram hashes per window). */
  val WINNOW_W = 4

  /** X — winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the
    * MOSS local-similarity algorithm): hash every 3-word shingle, then
    * in every window of WINNOW_W consecutive shingle hashes select the
    * minimum — the per-doc fingerprint SET. Guarantees (unlike
    * x_doc_fingerprint's single global min): any shared run of
    * ≥ w+k−1 = 6 words yields a shared fingerprint (detection), and at
    * most ~2/(w+1) of positions are selected (density) — sparse
    * fingerprints that still localize matches, which is why plagiarism
    * and license-scan pipelines use exactly this sketch.
    *
    * Per doc: distinct selected fingerprints and how many of them are
    * shared with ≥1 other document. All window work is per-doc
    * partitioned (ROWS frames over shingle positions); the only
    * corpus-wide step is one agg on selected digests. Both engines
    * spell the identical frame (CURRENT ROW .. w−1 FOLLOWING, clipped
    * at the doc tail the same way), so the sets hash-match.
    */
  val xWinnow = Q(
    "x_winnow_fingerprint",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       g AS (SELECT doc_id, i, md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS h
             FROM words, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
             WHERE len(t) >= 3),
       wmin AS (SELECT doc_id,
                  min(h) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND ${WINNOW_W - 1} FOLLOWING) AS fp
                FROM g),
       sel AS (SELECT DISTINCT doc_id, fp FROM wmin),
       shared AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) >= 2)
       SELECT sel.doc_id,
              CAST(count(*) AS BIGINT) AS n_fps,
              CAST(sum(CASE WHEN shared.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
       FROM sel LEFT JOIN shared ON sel.fp = shared.fp
       GROUP BY sel.doc_id ORDER BY sel.doc_id""") { (s, dir) =>
    val sel = winnowSelect(T(s, dir, "documents"))
    val shared = sel.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("fp")).withColumn("isrep", lit(1))
    sel.join(shared, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"),
        sum(when(col("isrep").isNotNull, 1L).otherwise(0L)).as("n_shared"))
      .orderBy("doc_id")
  }

  /** Distinct winnowing fingerprint set per doc — shared with the spec's
    * detection/density property tests. The whole select runs inside the
    * codegen'd [[graft.functions.WinnowFingerprints]] expression: a
    * narrow per-row map (no exploded gram stream, no doc-keyed exchange,
    * no per-doc window sort), then one explode of the already-distinct
    * per-doc sets. The spec checks this against the explode+window
    * spelling it replaced.
    */
  def winnowSelect(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.ArrayOps.winnowFingerprints(
        col("text"), 3, WINNOW_W)).as("fp"))

  /** The explode+window spelling winnowSelect replaced — kept as the ONE
    * reference implementation (Round9Spec equality check, SCALE-WINNOW
    * agree flag), so a change to WINNOW_W or the gram shape cannot drift
    * between hand copies.
    */
  def winnowSelectWindowed(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wspec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        WINNOW_W - 1)
    val words = split(col("text"), " ")
    docs.select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("w")) - 3),
          i => md5(concat_ws(" ", element_at(col("w"), i + 1),
            element_at(col("w"), i + 2), element_at(col("w"), i + 3))))))
      .select(col("doc_id"), col("pos").as("i"), col("col").as("h"))
      .withColumn("fp", min(col("h")).over(wspec))
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** X — cross-SOURCE overlap matrix: for every source pair, the count
    * of shared word-3-shingles and the containment ratio against the
    * smaller side — the mixture-design table that answers "how much of
    * source A is already in source B" BEFORE weights are assigned
    * (upweighting two heavily-overlapping sources double-counts their
    * shared text; the per-document dedup operators find the pairs, this
    * finds the structural redundancy between whole collections).
    *
    * Pure integers: distinct (source, shingle) sets, pairwise
    * intersection counts, containment = 1e6·|A∩B| DIV min(|A|,|B|).
    * Spark shuffles 8-byte shingle DIGESTS, the oracle joins shingle
    * strings — counts agree modulo 2⁻⁶⁴-probability collisions (the q33
    * verify precedent).
    *
    * Scale posture: one distinct over (source, gram-digest) — the same
    * stream every dedup pass already materializes — then a self-join
    * whose per-key fan-out is bounded by |sources| (≤ 20 here; a corpus
    * has tens of sources, not millions), group domain |sources|²/2. At
    * 100 TB the same table can be estimated from the per-source KMV
    * sketches (x_kmv_union's machinery) without the exact join; this is
    * the exact spelling, feasible because fan-out is source-bounded.
    */
  val xSourceOverlap = Q(
    "x_source_overlap",
    """WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS t
              FROM documents),
       sh AS (SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT source, CAST(count(*) AS BIGINT) AS c
                FROM sh GROUP BY source),
       inter AS (SELECT a.source AS sa, b.source AS sb,
                   CAST(count(*) AS BIGINT) AS shared
                 FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
                 GROUP BY 1, 2)
       SELECT sa, sb, shared, ca.c AS na, cb.c AS nb,
              (1000000 * shared) // least(ca.c, cb.c) AS containment_ppm
       FROM inter
       JOIN card ca ON ca.source = sa
       JOIN card cb ON cb.source = sb
       ORDER BY sa, sb""") { (s, dir) =>
    val docs = T(s, dir, "documents")
    val sh = docs.select(col("source"),
        explode(graft.functions.ArrayOps.wordShingleHashes(col("text"), 3))
          .as("sh"))
      .distinct()
    val card = sh.groupBy(col("source")).agg(count(lit(1)).as("c"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("shared"))
    inter
      .join(card.select(col("source").as("sa"), col("c").as("na")), "sa")
      .join(card.select(col("source").as("sb"), col("c").as("nb")), "sb")
      .select(col("sa"), col("sb"), col("shared"), col("na"), col("nb"),
        expr("(1000000 * shared) div least(na, nb)").as("containment_ppm"))
      .orderBy("sa", "sb")
  }

  val all: Seq[Q] = Seq(q32, xFingerprint, xWinnow, xSourceOverlap)
}
