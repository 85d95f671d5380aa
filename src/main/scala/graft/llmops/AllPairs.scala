package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Weighted-cosine all-pairs similarity join over sparse TERM-FREQUENCY
  * vectors — the bag-of-words companion to the inventory's three other
  * pairwise-similarity spellings, covering the case they each miss:
  *
  *   - x_setsim_join (exact prefix filtering) is BINARY — a doc that
  *     repeats a term 50× and one that mentions it once look identical;
  *   - q33/x_dedup_families (MinHash) estimates binary Jaccard, with
  *     banding recall < 1;
  *   - x_embed_nn / x_semdedup run on DENSE learned embeddings, not on
  *     the text itself.
  *
  * Weighted cosine on raw tf counts is what near-dup mining uses when
  * repetition structure matters (template spam with stuffed keywords,
  * boilerplate with a changed entity count) and no embedding model is in
  * the loop: cos(a,b) = Σ ca·cb / √(Σca²·Σcb²) over the shared-term
  * dot product.
  *
  * The term universe is the 5-word shingle with BAG semantics (every
  * occurrence counted) — one step longer than the q33/x_setsim_join
  * 3-gram universe, because the tf WEIGHTS need terms sparse enough
  * that document frequency is discriminative: this fixture's 31-word
  * vocabulary makes every unigram (df ≥ 25) and most 3-grams hubs,
  * while 5-grams are shared essentially only by true near-dups — the
  * same reason production n-gram dedup (ccnet, Gopher) runs at n = 5+.
  *
  * Candidate contract (mirrored verbatim in the oracle): a pair is
  * considered iff it shares at least one term with document frequency
  * ≤ DF_CAP — the inverted-index posting-list cap, the same contract
  * class as the LSH hot-bucket cap (MinHashLSH.scala:188-204) and the
  * reason a 10^9-doc corpus can run this at all: hub terms ("the",
  * boilerplate) would each contribute df² candidate pairs while
  * contributing ~nothing to discrimination. Unlike the binary case —
  * where x_setsim_join's prefix bound restores exactness for free — the
  * exact weighted prefix filter needs per-term max-weight bookkeeping
  * (Bayardo et al. WWW'07 §3.2); the posting cap is the spelling
  * production systems actually deploy first, and the contract is honest:
  * pairs whose ONLY shared vocabulary is hub terms are out of scope by
  * declaration, not silently dropped. VERIFICATION is exact and
  * uncapped: the dot product for a surviving candidate runs over ALL
  * shared terms, hub or not, so reported similarities are true cosines.
  *
  * Determinism: counts are integers, so dot, na2 = Σca², nb2 = Σcb² are
  * exact BIGINTs and the τ = 0.8 gate is the cross-multiplication
  * 25·dot² ≥ 16·na2·nb2 — zero floats cross engines. (Bounds: a 10k-term
  * doc with max count 2^10 keeps 25·dot² under 2^63; the fixture is
  * orders below that.)
  *
  * Scale posture: tokenize+count is one narrow map + hash agg keyed by
  * (doc, term); the df dictionary is a term-keyed agg; candidate
  * generation joins postings ONLY for sub-cap terms (bounded df² per
  * term); verification joins the candidate pairs — a sliver of the
  * corpus — back to the two count vectors on (doc, term). Nothing
  * all-pairs, no driver state.
  */
object AllPairs {

  /** Posting-list document-frequency cap for candidate generation. */
  val DF_CAP = 20

  /** Cosine threshold 4/5, applied as 25·dot² ≥ 16·na2·nb2. */
  val COS_NUM = 4
  val COS_DEN = 5

  /** Shingle length of the term universe. */
  val NGRAM = 5

  /** (doc_id, w, c): 5-gram term-frequency triples of the documents.
    * The term key is the 48-bit md5 prefix of the shingle, NOT the
    * string: every downstream shuffle (the count agg, the df
    * dictionary, the postings self-join, the verify joins) then moves
    * 8-byte longs instead of ~30-byte strings — measured at 2.5× on the
    * whole query. Collisions perturb a count with probability
    * ~|terms|²/2⁴⁸ per document pair — the q33 hash contract
    * (MinHashLSH.scala:211-214); the string-keyed oracle staying green
    * at both SFs is the per-round evidence the contract holds.
    */
  private def termCounts(s: SparkSession, dir: String): DataFrame =
    Shingles.wordShingles(
        T(s, dir, "documents").select(col("doc_id"), col("text")),
        NGRAM, distinct = false)
      .select(col("doc_id"),
        conv(substring(md5(col("sh")), 1, 12), 16, 10).cast("long").as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))

  val xAllpairsCosine = Q(
    "x_allpairs_cosine",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM documents),
       tok AS (SELECT doc_id,
                 t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                   t[i+3] || ' ' || t[i+4] AS w
               FROM words, LATERAL (SELECT unnest(generate_series(1,
                 greatest(len(t) - ${NGRAM - 1}, 1))) AS i)
               WHERE len(t) >= $NGRAM),
       cnt AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
               FROM tok GROUP BY 1, 2),
       nrm AS (SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS n2
               FROM cnt GROUP BY 1),
       df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM cnt GROUP BY 1),
       rare AS (SELECT doc_id, w FROM cnt JOIN df USING (w)
                WHERE df <= $DF_CAP),
       cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
                FROM rare x JOIN rare y
                  ON x.w = y.w AND x.doc_id < y.doc_id),
       dot AS (SELECT cand.a_id, cand.b_id,
                 CAST(sum(xa.c * xb.c) AS BIGINT) AS dot
               FROM cand
               JOIN cnt xa ON xa.doc_id = cand.a_id
               JOIN cnt xb ON xb.doc_id = cand.b_id AND xb.w = xa.w
               GROUP BY 1, 2)
       SELECT dot.a_id, dot.b_id, dot.dot,
              na.n2 AS na2, nb.n2 AS nb2
       FROM dot
       JOIN nrm na ON na.doc_id = dot.a_id
       JOIN nrm nb ON nb.doc_id = dot.b_id
       WHERE ${COS_DEN * COS_DEN} * dot.dot * dot.dot
             >= ${COS_NUM * COS_NUM} * na.n2 * nb.n2
       ORDER BY a_id, b_id""") { (s, dir) =>
    val cnt = termCounts(s, dir).cache()
    graft.core.CacheBin.swap("allpairs_cnt", cnt)
    val nrm = cnt.groupBy("doc_id").agg(sum(col("c") * col("c")).as("n2"))
    val dfTab = cnt.groupBy("w").agg(count(lit(1)).as("df"))
    val rare = cnt.join(dfTab.filter(col("df") <= DF_CAP), Seq("w"))
      .select(col("doc_id"), col("w"))
    val cand = rare.as("x").join(rare.as("y"),
        col("x.w") === col("y.w") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val dot = cand
      .join(cnt.select(col("doc_id").as("a_id"), col("w"),
        col("c").as("ca")), Seq("a_id"))
      .join(cnt.select(col("doc_id").as("b_id"), col("w"),
        col("c").as("cb")), Seq("b_id", "w"))
      .groupBy("a_id", "b_id").agg(sum(col("ca") * col("cb")).as("dot"))
    dot
      .join(nrm.select(col("doc_id").as("a_id"), col("n2").as("na2")), "a_id")
      .join(nrm.select(col("doc_id").as("b_id"), col("n2").as("nb2")), "b_id")
      .filter(lit(COS_DEN * COS_DEN) * col("dot") * col("dot")
        >= lit(COS_NUM * COS_NUM) * col("na2") * col("nb2"))
      .select(col("a_id"), col("b_id"), col("dot"), col("na2"), col("nb2"))
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Q] = Seq(xAllpairsCosine)
}
