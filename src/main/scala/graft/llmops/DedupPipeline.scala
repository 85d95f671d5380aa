package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed training-data curation pipeline: the order-of-operations a
  * real corpus clean-up runs, each stage shuffle-bounded:
  *
  *   1. exact dedup      — digest hash, keep lowest doc_id
  *   2. near-dup removal — MinHash LSH candidates, exact-Jaccard verify,
  *                         drop the higher doc_id of every pair ≥ τ
  *                         (union-find-free because survivors-by-min-id is
  *                         idempotent: re-running removes nothing new)
  *   3. quality filter   — token-count floor and stopword-ratio band
  *
  * Returns the surviving documents with their audit columns.
  */
object DedupPipeline {

  def run(
      documents: DataFrame,
      minTokens: Int = 10,
      tau: Double = MinHashLSH.TAU,
      maxBucket: Int = 10000,
      sharedSets: Option[DataFrame] = None): DataFrame = {

    // 1. exact — cache the digest-window LOSERS (rows beyond the min-id
    // survivor), not the survivors: the losers are the SMALL side (only
    // duplicates), and with them cached the md5 window over the corpus
    // runs ONCE even though the survivor frame feeds several consumers
    // below (each consumer is then a cheap anti join against the cached
    // loser ids instead of a fresh corpus-wide window shuffle).
    val wDigest = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
    val exactLosers = documents
      .withColumn("digest", md5(col("text")))
      .withColumn("rn", row_number().over(wDigest))
      .filter(col("rn") > 1)
      .select("doc_id").cache()
    graft.core.CacheBin.swap("dedup_pipeline.exact_losers", exactLosers)
    val exact = documents.join(exactLosers, Seq("doc_id"), "left_anti")

    // 2. near-dup: kill the b-side (higher id) of every verified pair.
    // Banding runs AFTER exact dedup (stage 1 collapsed identical
    // boilerplate, the main source of giant LSH buckets) and with a
    // hot-bucket cap so one templated family can never go quadratic
    // inside a single shuffle key — see cappedCandidates' scaladoc.
    // The shingle pass is the pipeline's most expensive narrow stage;
    // when the caller already holds the corpus-wide condensed set base
    // (MinHashLSH.wordSetsBase), restrict it to stage-1 survivors with an
    // anti join on the cached loser ids instead of re-hashing the deduped
    // text — the condensed rows move, the text is never touched twice.
    val sets = sharedSets match {
      case Some(base) =>
        base.join(exactLosers, Seq("doc_id"), "left_anti")
      case None =>
        val s = MinHashLSH.wordSets(exact, 3).cache()
        graft.core.CacheBin.swap("dedup_pipeline.sets", s)
        s
    }
    val cand = MinHashLSH.cappedCandidates(
      MinHashLSH.bandKeys(MinHashLSH.signaturesFromSets(sets)), maxBucket)
    val losers = MinHashLSH.exactJaccardFromSets(cand, sets)
      .filter(col("jaccard") >= tau)
      .select(col("b_id").as("doc_id"))
      .distinct()
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")

    // 3. quality
    val words = split(col("text"), " ")
    nearDeduped
      .withColumn("n_tokens", size(words).cast("long"))
      .filter(col("n_tokens") >= minTokens)
  }

  /** X — the composed pipeline under the oracle gate: all three stages
    * (exact dedup → capped-LSH near-dup removal → token floor) in one
    * driver-contract query, oracle-replicated stage by stage in SQL
    * (brute-force Jaccard stands in for LSH: exact verification makes
    * banding a cost knob, so both spell the same answer). This is the
    * query a corpus clean-up actually runs; the pieces are graded
    * individually elsewhere (q32/q33/x_dedup_*), this grades their
    * composition order.
    */
  val xPipeline = graft.core.Q(
    "x_curation_pipeline",
    s"""WITH exact AS (
         SELECT doc_id, text, lang FROM (
           SELECT doc_id, text, lang,
                  row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
           FROM documents) WHERE rn = 1),
       words AS (SELECT doc_id, string_split(text, ' ') AS t FROM exact),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       losers AS (SELECT DISTINCT b_id AS doc_id FROM inter
                  JOIN card ca ON ca.doc_id = a_id
                  JOIN card cb ON cb.doc_id = b_id
                  WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= ${MinHashLSH.TAU})
       SELECT e.doc_id, e.lang,
              CAST(len(string_split(e.text, ' ')) AS BIGINT) AS n_tokens
       FROM exact e LEFT JOIN losers l ON l.doc_id = e.doc_id
       WHERE l.doc_id IS NULL
         AND len(string_split(e.text, ' ')) >= 10
       ORDER BY e.doc_id""") { (s, dir) =>
    run(graft.core.Tables(s, dir, "documents"),
        sharedSets = Some(MinHashLSH.wordSetsBase(s, dir)))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy("doc_id")
  }

  val all: Seq[graft.core.Q] = Seq(xPipeline)
}
