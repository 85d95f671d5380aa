package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared shingling primitives for near-dup / fingerprint operators.
  * Pure higher-order-function expressions (transform/sequence/slice) so
  * everything stays inside whole-stage codegen — no UDFs in the hot path.
  */
object Shingles {

  /** k-word shingles per document: (doc_id, sh). Distinct by default
    * (set semantics for Jaccard); `distinct = false` keeps every
    * occurrence (bag semantics, e.g. repetition scoring).
    */
  def wordShingles(documents: DataFrame, k: Int, distinct: Boolean = true): DataFrame = {
    val words = split(col("text"), " ")
    val exploded = documents
      .select(col("doc_id"), words.as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("w")) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(col("w"), i + j + 1)): _*)
        )).as("sh"))
    if (distinct) exploded.distinct() else exploded
  }

}
