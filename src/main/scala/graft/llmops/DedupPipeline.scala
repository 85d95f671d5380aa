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
      maxBucket: Int = 10000): DataFrame = {

    // 1. exact
    val wDigest = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
    val exact = documents
      .withColumn("digest", md5(col("text")))
      .withColumn("rn", row_number().over(wDigest))
      .filter(col("rn") === 1)
      .drop("rn")

    // 2. near-dup: kill the b-side (higher id) of every verified pair.
    // Banding runs AFTER exact dedup (stage 1 collapsed identical
    // boilerplate, the main source of giant LSH buckets) and with a
    // hot-bucket cap so one templated family can never go quadratic
    // inside a single shuffle key — see cappedCandidates' scaladoc.
    val sets = MinHashLSH.wordSets(exact, 3).cache()
    graft.core.CacheBin.swap("dedup_pipeline.sets", sets)
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
}
