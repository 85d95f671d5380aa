package graft.llmops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Incremental / cross-set dedup — the shapes a CONTINUOUSLY-INGESTING
  * training-data pipeline runs, where the corpus already exists and each
  * operation is "new batch (or holdout split) versus the standing corpus"
  * rather than all-pairs over everything:
  *
  *   - x_incremental_neardup: a new batch's LSH band keys joined against
  *     the corpus' stored band INDEX — the per-batch cost is proportional
  *     to the batch, never to corpus², and the corpus signatures are
  *     computed once (here from the same table split by an id watermark;
  *     in production the index is a persisted table keyed (band, bh)).
  *   - x_split_leakage: train/holdout contamination detection — near-dup
  *     pairs that STRADDLE a deterministic hash split. The question every
  *     eval pipeline must answer before trusting held-out loss: is the
  *     holdout actually disjoint from training data up to near-duplicates?
  *   - x_bloom_dedup: exact-dup screening of a new batch against the
  *     corpus through a bloom-filter prefilter — definite-negatives pass
  *     without touching the corpus (the common case at 100 TB: most
  *     documents are new); only bloom-POSITIVES pay the exact anti-join.
  *     False positives cost work, never correctness.
  *
  * All three are hash-checked against brute-force DuckDB oracles.
  */
object Incremental {

  /** The last 20% of doc_ids play the "new batch"; the first 80% the
    * standing corpus. floor() spelled explicitly on both engines (DuckDB
    * CAST(double AS BIGINT) rounds; Spark's cast truncates). The cutoff
    * is ALWAYS computed over the full documents table — computing it from
    * a filtered derivative (e.g. the band frame, which drops <k-word
    * docs) would silently diverge from the oracle whenever the highest-id
    * document is short.
    */
  private val cutoffSql =
    "SELECT CAST(floor(0.8 * max(doc_id)) AS BIGINT) AS c FROM documents"

  /** One-row (cut) frame over the FULL documents table. */
  def cutoffFrame(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.agg(floor(max(col("doc_id")) * lit(0.8)).cast("long").as("cut"))

  /** The cutoff as a driver scalar — one tiny max() job, bounded driver
    * state (the k-means-centroid discipline). Every batch consumer uses
    * this too, not just streaming: as a LITERAL the id-watermark filters
    * push down to the parquet scan (`PushedFilters: [GreaterThanOrEqual
    * (doc_id, ...)]`), where the cross-joined scalar-subquery column form
    * was unpushable AND re-derived the full-table max once per plan
    * branch — x_bloom_dedup's old plan carried 18 corpus scans for this.
    */
  def cutoffValue(docs: org.apache.spark.sql.DataFrame): Long =
    cutoffFrame(docs).first().getLong(0)

  /** Deterministic ~10% holdout split used by x_split_leakage and
    * x_ngram_contamination — the engine-agnostic md5-prefix recipe
    * (same as x_sample_hash). One spelling, shared.
    */
  val holdoutSqlPred = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'"
  def holdoutColumn: org.apache.spark.sql.Column =
    substring(md5(col("doc_id").cast("string")), 1, 2) <= "19"

  /** The brute-force cross-watermark near-dup oracle, shared verbatim by
    * x_incremental_neardup and its streaming twin x_stream_neardup (the
    * replay-equivalence contract demands one spelling).
    */
  val crossSetNeardupOracle: String =
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       cut AS ($cutoffSql),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a_id, b_id, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
       FROM inter
       JOIN card ca ON ca.doc_id = a_id
       JOIN card cb ON cb.doc_id = b_id, cut
       WHERE a_id < cut.c AND b_id >= cut.c
         AND CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= ${MinHashLSH.TAU}
       ORDER BY a_id, b_id"""

  val xIncrementalNeardup = Q(
    "x_incremental_neardup", crossSetNeardupOracle) { (s, dir) =>
    val docs = T(s, dir, "documents")
    // the SHARED word-3-gram set base (one cached shingle pass per dir) —
    // not a private wordSets().cache() that only coincided with q33's via
    // CacheManager plan collision
    val sets = MinHashLSH.wordSetsBase(s, dir)
    // cutoff from the FULL table (the band frame excludes <3-word docs —
    // deriving the watermark from it would diverge from the oracle when
    // the max-id document is short)
    val cut = cutoffValue(docs)
    val bands = MinHashLSH.bandKeys(MinHashLSH.signaturesFromSets(sets))
    // "stored index" side: corpus band keys, keyed (band, bh)
    val index = bands.filter(col("doc_id") < cut)
      .select(col("band"), col("bh"), col("doc_id").as("a_id"))
    // incoming batch side: only ITS bands are computed per batch
    val incoming = bands.filter(col("doc_id") >= cut)
      .select(col("band"), col("bh"), col("doc_id").as("b_id"))
    val cand = index.join(incoming, Seq("band", "bh"))
      .select(col("a_id"), col("b_id")).distinct()
    MinHashLSH.exactJaccardFromSets(cand, sets)
      .filter(col("jaccard") >= MinHashLSH.TAU)
      .orderBy("a_id", "b_id")
  }


  val xSplitLeakage = Q(
    "x_split_leakage",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       split AS (SELECT doc_id, $holdoutSqlPred AS holdout FROM documents),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a_id, b_id, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
       FROM inter
       JOIN card ca ON ca.doc_id = a_id
       JOIN card cb ON cb.doc_id = b_id
       JOIN split sa ON sa.doc_id = a_id
       JOIN split sb ON sb.doc_id = b_id
       WHERE sa.holdout <> sb.holdout
         AND CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= ${MinHashLSH.TAU}
       ORDER BY a_id, b_id""") { (s, dir) =>
    val sets = MinHashLSH.wordSetsBase(s, dir)
    val bands = MinHashLSH.bandKeys(MinHashLSH.signaturesFromSets(sets))
      .withColumn("holdout", holdoutColumn)
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") < col("y.doc_id") &&
        col("x.holdout") =!= col("y.holdout"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    MinHashLSH.exactJaccardFromSets(cand, sets)
      .filter(col("jaccard") >= MinHashLSH.TAU)
      .orderBy("a_id", "b_id")
  }

  val xBloomDedup = Q(
    "x_bloom_dedup",
    """WITH cut AS (SELECT CAST(floor(0.8 * max(doc_id)) AS BIGINT) AS c FROM documents)
       SELECT d.doc_id FROM documents d, cut
       WHERE d.doc_id >= cut.c
         AND NOT EXISTS (SELECT 1 FROM documents o, cut
                         WHERE o.doc_id < cut.c AND o.text = d.text)
       ORDER BY d.doc_id""") { (s, dir) =>
    val docs = T(s, dir, "documents")
    val cut = cutoffValue(docs)
    val split = docs.withColumn("h", xxhash64(col("text")))
    val corpus = split.filter(col("doc_id") < cut)
    val batch = split.filter(col("doc_id") >= cut)
    // corpus digest sketch: ONE aggregate row (bytes, not the digest set),
    // wired into the probe as a scalar subquery — native expressions,
    // codegen'd, the same plan shape Spark's runtime row filtering injects
    val bloom = corpus
      .agg(graft.functions.Bloom.bloomAgg(col("h"), 100000L, 8L * 1024 * 1024)
        .as("bf"))
    // coalesce(false): BloomFilterAggregate over an EMPTY corpus yields a
    // NULL sketch and might_contain propagates the NULL — without the
    // default both branches below would drop every batch row and the
    // query would silently return nothing instead of "everything is new"
    val probed = batch
      .withColumn("maybe", coalesce(
        graft.functions.Bloom.mightContain(bloom, col("h")), lit(false)))
    // definite-negatives pass without ever touching the corpus rows;
    // bloom-positives (true dups + bounded false positives) pay the exact
    // anti-join — exactness never depends on the filter's FP rate
    val negatives = probed.filter(!col("maybe")).select(col("doc_id"))
    val positives = probed.filter(col("maybe"))
      .join(corpus.select(col("text")), Seq("text"), "left_anti")
      .select(col("doc_id"))
    negatives.union(positives).orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(xIncrementalNeardup, xSplitLeakage, xBloomDedup)
}
