package graft.llmops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Heavy hitters over the token stream via a distributed Misra–Gries
  * sketch: find every term whose corpus frequency exceeds n/50 — the
  * vocabulary head a tokenizer trainer or stopword builder needs —
  * WITHOUT a full-vocabulary shuffle.
  *
  * Why not just groupBy(term).count(): at 100 TB the token vocabulary is
  * billions of distinct keys, so the full count shuffles the whole
  * vocabulary to build a table of which only the top handful matters.
  * The sketch pass instead keeps a bounded k-counter summary PER
  * PARTITION (mapPartitions, zero shuffle) and emits at most k candidate
  * terms per partition. Pigeonhole guarantee: any term with global count
  * > n/(k+1) must exceed its local n_p/(k+1) share in at least one
  * partition, and a Misra–Gries summary with k counters never evicts a
  * term whose local count is above that bar — so the union of the
  * per-partition candidates is a SUPERSET of the true heavy hitters.
  * Phase 2 broadcast-semi-joins the tiny candidate set (≤ k × partitions
  * rows) against the token stream and recounts exactly — the aggregation
  * key set is now bounded, not vocabulary-sized. Output is EXACT (the
  * sketch only prunes, never decides), which is what makes the DuckDB
  * brute-force oracle hash-match.
  */
object HeavyHitters {

  /** One Misra–Gries summary: k counters; a miss when full decrements
    * every counter (amortized O(1) via the zero-purge).
    */
  final class MisraGries(k: Int) {
    private val counts = scala.collection.mutable.HashMap.empty[String, Long]

    def add(term: String): Unit = counts.get(term) match {
      case Some(c) => counts.update(term, c + 1)
      case None if counts.size < k => counts.update(term, 1L)
      case None =>
        // decrement-all: drop every counter by 1, purge zeros
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counts.foreach { case (t, c) =>
          if (c == 1L) dead += t else counts.update(t, c - 1)
        }
        dead.foreach(counts.remove)
    }

    def candidates: Iterator[String] = counts.keysIterator
  }

  /** X — terms with exact frequency × 50 > corpus token count, via the
    * sketch-then-recount plan above. The 512-counter summary leaves a
    * 10× safety margin over the 1/50 threshold (the guarantee needs only
    * k ≥ 50).
    */
  val xHeavyHitters = Q(
    "x_heavy_hitters",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       t AS (SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY w),
       n AS (SELECT count(*) AS n FROM toks WHERE w <> '')
       SELECT t.w AS term, t.c AS freq FROM t, n
       WHERE t.c * 50 > n.n
       ORDER BY term""") { (s, dir) =>
    import s.implicits._
    val toks = T(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    // pass 1: per-partition bounded sketch, no shuffle — ≤512 candidate
    // terms per partition regardless of vocabulary size
    val cands = toks.as[String].mapPartitions { it =>
      val mg = new MisraGries(512)
      it.foreach(mg.add)
      mg.candidates
    }.distinct().toDF("w")
    // pass 2: exact recount of the bounded candidate set + total count
    val n = toks.select(count(lit(1)).as("n"))
    toks.join(broadcast(cands), Seq("w"), "left_semi")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(n))
      .filter(col("freq") * 50 > col("n"))
      .select(col("w").as("term"), col("freq"))
      .orderBy("term")
  }

  val all: Seq[Q] = Seq(xHeavyHitters)
}
