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

  val all: Seq[Q] = Seq(q32, xFingerprint)
}
