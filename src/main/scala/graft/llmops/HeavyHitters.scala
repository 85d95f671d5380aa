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

  /** X — Count-Min point-frequency estimates for a bounded probe set
    * (the distinct terms of doc 0), without a vocabulary-sized shuffle.
    *
    * The complement of the Misra–Gries pass above: MG answers "which
    * terms are heavy", CMS answers "how often does THIS term occur" for
    * any term — the shape a blocklist auditor or stopword tuner needs
    * when the probe terms are known up front. The sketch is a fixed
    * w×d counter grid (here 27×10 longs ≈ 2 KB), built in ONE pass with
    * map-side partials (counter grids sum cell-wise, so the merge is
    * commutative and deterministic) — at 100 TB the driver state is
    * still 2 KB, vs a billions-of-keys groupBy for the exact table.
    *
    * Graded facts, all deterministic given the fixed seed: the exact
    * probe counts (recounted over a broadcast-bounded key set, same plan
    * as the MG recount), `no_underestimate` (a structural CMS guarantee
    * — min over rows of summed counters can only overcount), and
    * `within_eps` (est ≤ exact + εN; probabilistic per seed, verified
    * stable at sf0.001/0.01/0.1 — the width 27 is deliberately SMALLER
    * than the ~40-term vocabulary so collisions are real and the test
    * is non-vacuous). Oracle computes the exact counts and the trivially
    * true flags, like q07_approx_hll's derived-fact split.
    */
  val xCountMin = Q(
    "x_count_min",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       probes AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
                  FROM documents WHERE doc_id = 0),
       t AS (SELECT toks.w, count(*) AS freq FROM toks
             JOIN probes ON toks.w = probes.w WHERE toks.w <> '' GROUP BY toks.w)
       SELECT w AS term, freq, TRUE AS no_underestimate, TRUE AS within_eps
       FROM t ORDER BY term""") { (s, dir) =>
    val toks = T(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    // one distributed pass; ~2 KB of driver state (the counter grid)
    val sketch = toks.stat.countMinSketch("w", CMS_EPS, CMS_CONF, CMS_SEED)
    val bc = s.sparkContext.broadcast(sketch)
    val est = udf((w: String) => bc.value.estimateCount(w))
    val probes = T(s, dir, "documents")
      .filter(col("doc_id") === 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val n = toks.select(count(lit(1)).as("n"))
    toks.join(broadcast(probes), Seq("w"), "left_semi")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(n))
      .select(col("w").as("term"), col("freq"),
        (est(col("w")) >= col("freq")).as("no_underestimate"),
        (est(col("w")) <= col("freq") + ceil(lit(CMS_EPS) * col("n")))
          .as("within_eps"))
      .orderBy("term")
  }

  /** x_count_min sketch parameters — public so the spec validates the
    * SHIPPED sketch, not a hand-copied one: ε sets width = ceil(2/ε) =
    * 27 cells/row (deliberately narrower than the vocabulary so
    * collisions are real), confidence sets depth, and the fixed seed is
    * what makes the probabilistic within-ε bound a deterministic fact of
    * this corpus.
    */
  val CMS_EPS = 0.075
  val CMS_CONF = 0.999
  /** Fixed sketch seed. The oracle hardcodes `within_eps = TRUE`, which is
    * a per-seed probabilistic fact VERIFIED at sf0.001 / sf0.01 / sf0.1
    * (this list). A new scale factor draws a fresh collision pattern, so
    * before trusting the gate at any other SF, re-check the bound there
    * (run x_count_min once and inspect the est−freq margins) — a
    * violation would surface as a whole-query hash mismatch, not a
    * flagged estimate regression.
    */
  val CMS_SEED = 42

  /** X — exact distinct rollup via mergeable bitmaps
    * ([[graft.functions.BitmapFns]]): monthly active-customer bitsets OR
    * up to EXACT quarterly distinct counts without rescanning the detail
    * rows — the third sketch in the family (Misra–Gries prunes, CMS
    * bounds, bitmaps are exact over a dense-id domain). The output pairs
    * the naive Σ-of-month-distincts with the true quarterly distinct, so
    * the double-count (`overlap`) the bitmap rollup avoids is visible in
    * the result.
    *
    * Scale posture: one (quarter, month) hash agg whose per-group state
    * is a domain-bounded bitset (custkey/8 bytes; dictionary-encode via
    * x_dense_ids first at corpus scale), then a 3-rows-per-quarter
    * re-agg of binary blobs. Both stages partial-aggregate map-side;
    * exactness is order-independent because OR is commutative. The
    * oracle recounts both levels with COUNT(DISTINCT).
    */
  val xBitmapDistinct = Q(
    "x_bitmap_distinct",
    """WITH m AS (SELECT date_trunc('quarter', o_orderdate) AS quarter,
             date_trunc('month', o_orderdate) AS mo,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS md
           FROM orders GROUP BY 1, 2),
       qd AS (SELECT date_trunc('quarter', o_orderdate) AS quarter,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS q_distinct
              FROM orders GROUP BY 1)
       SELECT quarter, CAST(count(*) AS BIGINT) AS n_months,
              CAST(sum(md) AS BIGINT) AS sum_month_distinct, q_distinct,
              CAST(sum(md) AS BIGINT) - q_distinct AS overlap
       FROM m JOIN qd USING (quarter)
       GROUP BY quarter, q_distinct ORDER BY quarter""") { (s, dir) =>
    val bm = graft.functions.BitmapFns.bitmapAgg
    val ru = graft.functions.BitmapFns.bitmapRollup
    val m = T(s, dir, "orders")
      .groupBy(trunc(col("o_orderdate"), "quarter").as("quarter"),
        trunc(col("o_orderdate"), "month").as("mo"))
      .agg(bm(col("o_custkey")).as("bmp"))
    m.groupBy("quarter")
      .agg(count(lit(1)).as("n_months"), ru(col("bmp")).as("r"))
      .select(col("quarter"), col("n_months"),
        col("r._2").as("sum_month_distinct"), col("r._1").as("q_distinct"),
        (col("r._2") - col("r._1")).as("overlap"))
      .orderBy("quarter")
  }

  val all: Seq[Q] = Seq(xHeavyHitters, xCountMin, xBitmapDistinct)
}
