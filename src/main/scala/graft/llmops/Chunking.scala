package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables => T}

/** Training-data document preparation: chunking and stratified sampling.
  *
  * Chunking splits each document into fixed-size overlapping character
  * windows — the unit a tokenizer/packing stage consumes downstream.
  * Stratified sampling draws an equal-size, deterministic sample per
  * stratum (language) — the class-balancing primitive for eval-set
  * construction.
  *
  * Scale posture: chunking is a pure per-row explode (narrow, no
  * shuffle; output partitioning inherits the scan). Stratified sampling
  * is one window per stratum — at 100 TB a rank over lang-partitioned
  * data is a single shuffle by the stratum key, and the hash-ordered
  * rank makes the sample reproducible under any repartitioning, unlike
  * rand()-based sampling.
  */
object Chunking {

  val CHUNK = 200   // window size (chars)
  val STRIDE = 150  // step between window starts (50-char overlap)

  /** X — overlapping character-window chunks per document. Offsets
    * 0, STRIDE, 2·STRIDE, … while < length; every doc (even empty)
    * yields at least one chunk. Chunk text is carried as md5 so the
    * output stays narrow; n_chars shows the ragged tail.
    */
  val xDocChunk = Q(
    "x_doc_chunk",
    s"""SELECT doc_id, CAST(off AS BIGINT) AS chunk_start,
              CAST(length(substr(text, off + 1, $CHUNK)) AS BIGINT) AS n_chars,
              md5(substr(text, off + 1, $CHUNK)) AS digest
       FROM documents,
            LATERAL (SELECT unnest(generate_series(0, greatest(length(text) - 1, 0), $STRIDE)) AS off)
       ORDER BY doc_id, chunk_start""") { (s, dir) =>
    T(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          greatest(length(col("text")) - 1, lit(0)), lit(STRIDE))).as("off"))
      .select(col("doc_id"),
        col("off").cast("long").as("chunk_start"),
        length(expr(s"substring(text, off + 1, $CHUNK)")).cast("long").as("n_chars"),
        md5(expr(s"substring(text, off + 1, $CHUNK)")).as("digest"))
      .orderBy("doc_id", "chunk_start")
  }

  /** X — equal-size stratified sample: the first N docs per language in
    * md5-of-id order (a deterministic shuffle). Same sample on every
    * engine, every rerun, any partitioning.
    */
  val SAMPLE_PER_STRATUM = 40

  val xStratifiedSample = Q(
    "x_stratified_sample",
    s"""SELECT doc_id, lang FROM (
         SELECT doc_id, lang,
                row_number() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM documents)
       WHERE rn <= $SAMPLE_PER_STRATUM ORDER BY doc_id""") { (s, dir) =>
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    T(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SAMPLE_PER_STRATUM)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** X — sequence packing: assign docs to training context windows by
    * running token count (greedy contiguous packing — concatenate in
    * doc order, cut every BUDGET tokens — the standard pretraining
    * packing discipline). bin = floor(tokens-before-this-doc / BUDGET),
    * computed as one window cumsum per language shard; packing per shard
    * (not globally) is exactly how this parallelizes at corpus scale —
    * a global pack order would serialize on one partition.
    */
  val PACK_BUDGET = 2048

  val xPackSequences = Q(
    "x_pack_sequences",
    s"""WITH t AS (SELECT doc_id, lang,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
         FROM documents),
       p AS (SELECT doc_id, lang, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $PACK_BUDGET) AS BIGINT) AS bin
         FROM t)
       SELECT doc_id, lang, n_tokens, bin FROM p ORDER BY doc_id""") { (s, dir) =>
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    T(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
          .cast("long").as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / PACK_BUDGET))
      .orderBy("doc_id")
  }

  /** X — C4-style span-level dedup: cut every document into fixed
    * non-overlapping spans, keep only the FIRST occurrence of each span
    * corpus-wide ((doc_id, offset) order), and report per doc how much
    * survives. This is the line/paragraph dedup stage of a crawl
    * pipeline (C4 removed duplicate three-sentence spans the same way).
    *
    * Scale posture: ONE shuffle keyed on the span digest (the window
    * partition), then a per-doc re-aggregation — the span stream is
    * narrow (doc_id, offset, 16-byte digest), never the full text, and
    * the hot key is a span duplicated millions of times, which the
    * digest partitioning spreads no worse than the dedup groupBy any
    * exact-dedup pipeline runs.
    */
  val SPAN = 40

  val xSpanDedup = Q(
    "x_span_dedup",
    s"""WITH chunks AS (
         SELECT doc_id, off, md5(substr(text, off + 1, $SPAN)) AS d
         FROM documents,
              LATERAL (SELECT unnest(generate_series(0, greatest(length(text) - 1, 0), $SPAN)) AS off)),
       r AS (SELECT doc_id,
                    row_number() OVER (PARTITION BY d ORDER BY doc_id, off) AS rn
             FROM chunks)
       SELECT doc_id, count(*) AS n_spans,
              CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       FROM r GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
    val w = Window.partitionBy(col("d")).orderBy(col("doc_id"), col("off"))
    T(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          greatest(length(col("text")) - 1, lit(0)), lit(SPAN))).as("off"))
      .select(col("doc_id"), col("off"),
        md5(expr(s"substring(text, off + 1, $SPAN)")).as("d"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(xDocChunk, xStratifiedSample, xPackSequences, xSpanDedup)
}
