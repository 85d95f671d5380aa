package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** Near-duplicate detection via MinHash + LSH banding (SURVEY.md §2b Q33).
  *
  * Pipeline (all shuffle-bounded; never O(n²) in the corpus):
  *   1. per-doc sorted distinct shingle-hash SET, computed per row by a
  *      native expression (no shingle strings, no explode, NO shuffle —
  *      see wordSets below)
  *   2. NUM_HASHES remixes min-folded into a signature by a second
  *      native single-pass expression
  *   3. BANDS band keys per doc; equi-self-join on (band, band_hash)
  *      emits candidate pairs — the only join, and it's on a key whose
  *      groups are tiny (docs sharing a band are near-dups; see
  *      cappedCandidates for the hot-bucket guard)
  *   4. candidates are verified with EXACT Jaccard over the shingle sets,
  *      so LSH recall/precision never changes the answer — it only
  *      bounds the work. With 8 bands × 4 rows, P(miss) at the corpus'
  *      planted J≥0.97 is (1 − 0.97⁴)⁸ ≈ 3e-8 — every LSH path in the
  *      engine shares this one parameterization.
  *
  * At 100 TB: the whole sets+signature stage is a narrow map over the
  * corpus (the pre-round-4 explode + groupBy spelling shuffled the
  * shingle stream, the pipeline's largest intermediate); the band join
  * shuffles only (band_hash, doc_id) pairs, and verification moves one
  * sorted hash array per candidate side.
  */
object MinHashLSH {

  // 32 hashes = 8 bands × 4 rows — the single LSH parameterization for
  // every near-dup path (q33, char n-gram, dedup families, pipeline):
  // P(miss) ≈ 3e-8 at the corpus' planted J≥0.97, half the signature cost
  // of the 64-wide family, and exact verification makes recall a cost
  // knob, never a correctness one.
  val NUM_HASHES = 32
  val BANDS = 8
  val ROWS_PER_BAND: Int = NUM_HASHES / BANDS
  val TAU = 0.5

  /** MinHash signature columns m0..m{k-1} per doc_id. The (variable-width)
    * shingle string is hashed ONCE; the k families then re-mix the fixed
    * 8-byte result with xxhash64(i, h) — k-1 fewer string traversals per
    * shingle, no ANSI overflow concerns, all inside whole-stage codegen.
    */
  /** Per-doc condensed shingle sets: (doc_id, sorted xxhash64 array,
    * cardinality). Everything downstream — signatures, banding, exact
    * verification — derives from this ONE pass over the (heavy) shingle
    * stream; cache it when feeding multiple consumers. Dedup happens
    * INSIDE the aggregation (collect_set), so callers should pass the
    * raw shingle stream — a separate distinct() would add a full extra
    * shuffle of the largest intermediate for nothing.
    */
  def hashSets(shingles: DataFrame): DataFrame =
    shingles.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(xxhash64(col("sh")))).as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("c"))

  /** The SHUFFLE-FREE spelling of hashSets: each document's sorted
    * distinct shingle-hash set computed per row by a native expression
    * (graft.functions.WordShingleHashes / CharShingleHashes) that hashes
    * the original text bytes — no shingle strings allocated, no explode,
    * and crucially NO groupBy shuffle of the shingle stream (the largest
    * intermediate of every LSH query). Produces bit-identical sets to
    * hashSets(wordShingles(...)) — asserted in LlmOpsSpec — so the two
    * spellings interoperate; the exploded form remains for consumers that
    * need cross-document shingle rows (TF-IDF, fingerprint positions).
    */
  /** Shared per-doc word-3-gram hash-set base over the full `documents`
    * table: computed and cached ONCE per data dir, reused by every
    * full-corpus consumer (q33, x_dedup_families, x_dedup_survivors).
    * The storage was already de-duplicated by CacheManager plan
    * collisions (each consumer spelled the identical plan); the memo
    * makes the sharing deliberate, so a respelling on one side can't
    * silently fork the cache. At scale this is the corpus' one condensed
    * shingle pass — the most expensive narrow stage of every LSH query.
    */
  private val wordSetsBases =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  def wordSetsBase(s: SparkSession, dir: String): DataFrame = {
    // same discipline as VectorSearch.embeddingsBase: sweep stopped
    // sessions' entries, eq-check the served frame's session, and scope
    // the bin key to the session so parallel live sessions sharing one
    // CacheManager never unpersist each other's generation
    wordSetsBases.filterInPlace(
      (_, df) => !df.sparkSession.sparkContext.isStopped)
    val key = (System.identityHashCode(s), dir)
    wordSetsBases.get(key).filter(_.sparkSession eq s).getOrElse {
      val sets = wordSets(T(s, dir, "documents"), 3).cache()
      graft.core.CacheBin.swap(
        s"lsh.wordsets:${System.identityHashCode(s)}:$dir", sets)
      wordSetsBases.put(key, sets)
      sets
    }
  }

  def wordSets(documents: DataFrame, k: Int): DataFrame =
    documents
      .select(col("doc_id"),
        graft.functions.ArrayOps.wordShingleHashes(col("text"), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("c"))

  def charSets(documents: DataFrame, k: Int): DataFrame =
    documents
      .select(col("doc_id"),
        graft.functions.ArrayOps.charShingleHashes(col("text"), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("c"))

  def signatures(shingles: DataFrame, numHashes: Int = NUM_HASHES): DataFrame =
    signaturesFromSets(hashSets(shingles), numHashes)

  /** MinHash signatures from condensed sets: the shingle hash re-mixed
    * per family — fixed-width hashing only.
    *
    * One native single-pass expression per doc (graft.functions
    * .MinHashSignature): no explode + re-aggregate, so the (largest)
    * shingle intermediate is never shuffled a second time, and no
    * nested higher-order functions, which Spark evaluates interpreted
    * (ArrayTransform is CodegenFallback) — that HOF spelling was the
    * hot path of every LSH query.
    */
  def signaturesFromSets(sets: DataFrame, numHashes: Int = NUM_HASHES): DataFrame = {
    val withSig = sets.select(col("doc_id"),
      graft.functions.ArrayOps.minhashSignature(col("hs"), numHashes).as("sig"))
    withSig.select(col("doc_id") +:
      (0 until numHashes).map(i => col("sig")(i).as(s"m$i")): _*)
  }

  /** THE band-hash spelling: (band, bh) structs over signature minhash
    * values addressed by index. Every producer of band keys — batch
    * (bandKeys) or per-row streaming (x_stream_neardup) — goes through
    * this one definition; a private copy that drifted (different hash,
    * band layout, or column order) would silently empty the (band, bh)
    * equi-join and report zero near-dups.
    */
  def bandStructs(minhashAt: Int => org.apache.spark.sql.Column,
      bands: Int = BANDS, rowsPerBand: Int = ROWS_PER_BAND): Seq[org.apache.spark.sql.Column] =
    (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => minhashAt(b * rowsPerBand + r))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }

  /** (doc_id, band, bh) — one row per band key. */
  def bandKeys(sig: DataFrame, bands: Int = BANDS,
      rowsPerBand: Int = ROWS_PER_BAND): DataFrame =
    sig.select(col("doc_id"),
        explode(array(bandStructs(i => col(s"m$i"), bands, rowsPerBand): _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))

  /** Band INDEX for cross-set probing: each doc's band keys joined with
    * its shingle-hash set and cardinality (doc_id, band, bh, hs, c), so a
    * candidate emerging from the (band, bh) join can be exact-verified
    * in place with no further lookup. The shared shape behind
    * x_incremental_neardup's stored corpus side, x_stream_neardup's
    * static side, and the SCALE-INC probe.
    */
  def bandIndex(sets: DataFrame): DataFrame =
    bandKeys(signaturesFromSets(sets)).join(sets, "doc_id")

  /** Candidate pairs (a_id < b_id) from LSH banding. */
  def candidates(bands: DataFrame): DataFrame =
    bands.as("x").join(bands.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()

  /** candidates() with HOT-BUCKET protection — the web-corpus failure
    * mode banding meets at real scale: boilerplate-heavy text (license
    * headers, templated pages) lands thousands of docs in one (band, bh)
    * bucket, and a bucket of size s emits s(s−1)/2 pairs — 10⁵ docs in
    * one bucket is 5×10⁹ pairs from a single key, a straight quadratic
    * blowup inside one shuffle partition.
    *
    * Buckets larger than `maxBucket` are excluded from pair generation.
    * This is an explicit RECALL trade documented at the call site, not a
    * silent one — pair it with `oversizedBuckets` to route the excluded
    * families to the right tool (exact dedup first collapses identical
    * boilerplate; a giant NEAR-identical family can be re-processed by
    * itself, where its quadratic cost is isolated from the main job).
    * DedupPipeline.run applies exact dedup BEFORE banding for exactly
    * this reason.
    */
  def cappedCandidates(bands: DataFrame, maxBucket: Int): DataFrame = {
    val sized = bands.withColumn("bsz",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bh"))))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    candidates(sized)
  }

  /** Audit side of cappedCandidates: the (band, bh, size) buckets that
    * were excluded — a pipeline alerts on this instead of silently
    * dropping recall.
    */
  def oversizedBuckets(bands: DataFrame, maxBucket: Int): DataFrame =
    bands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("size"))
      .filter(col("size") > maxBucket)

  /** Exact Jaccard over shingle sets, restricted to candidate pairs.
    *
    * Each doc's distinct shingle set is condensed ONCE into a sorted
    * xxhash64 array; a candidate pair then costs one codegen'd merge scan
    * (SortedLongArrayIntersect) instead of a join on shingle equality
    * whose output is |candidates| × |shingles-per-doc| rows. Hash
    * collisions perturb a count with probability ~|A||B|/2^64 per pair —
    * vanishing against the τ margin.
    */
  def exactJaccard(cand: DataFrame, shingles: DataFrame): DataFrame =
    exactJaccardFromSets(cand, hashSets(shingles))

  def exactJaccardFromSets(cand: DataFrame, sets: DataFrame): DataFrame = {
    cand
      .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha"),
        col("c").as("ca")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb"),
        col("c").as("cb")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.functions.ArrayOps.sortedIntersectCount(col("ha"), col("hb"))
          .as("inter"), col("ca"), col("cb"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          (col("ca") + col("cb") - col("inter"))).as("jaccard"))
  }

  /** Q33 — the full near-dup pair query. Oracle is a brute-force shared-
    * shingle Jaccard in DuckDB (sound at oracle scale; the engine's LSH
    * path exists to avoid exactly that O(n²) at real scale).
    */
  val q33 = Q(
    "q33_minhash_neardup",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a_id, b_id, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
       FROM inter
       JOIN card ca ON ca.doc_id = a_id
       JOIN card cb ON cb.doc_id = b_id
       WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= $TAU
       ORDER BY a_id, b_id""") { (s, dir) =>
    val sets = wordSetsBase(s, dir)
    val cand = candidates(bandKeys(signaturesFromSets(sets)))
    exactJaccardFromSets(cand, sets)
      .filter(col("jaccard") >= TAU)
      .orderBy("a_id", "b_id")
  }

  /** X — character 5-gram Jaccard near-dup (the n-gram spelling of Q33:
    * same LSH+exact-verify machinery over char shingles instead of word
    * shingles; robust to tokenization differences).
    */
  val xCharNgram = Q(
    "x_char_ngram_jaccard",
    s"""WITH sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
              FROM documents,
                   LATERAL (SELECT unnest(generate_series(1, greatest(len(text)-4, 1))) AS i)
              WHERE len(text) >= 5),
       card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a_id, b_id, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
       FROM inter
       JOIN card ca ON ca.doc_id = a_id
       JOIN card cb ON cb.doc_id = b_id
       WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= $TAU
       ORDER BY a_id, b_id""") { (s, dir) =>
    val sets = charSets(T(s, dir, "documents"), 5).cache()
    graft.core.CacheBin.swap("x_char_ngram.sets", sets)
    val cand = candidates(bandKeys(signaturesFromSets(sets)))
    exactJaccardFromSets(cand, sets)
      .filter(col("jaccard") >= TAU)
      .orderBy("a_id", "b_id")
  }

  /** Error bound for x_minhash_est: |sig-estimate − exact Jaccard| must
    * stay under this for every reported pair (32 hashes → σ ≈ 0.09 at
    * J = 0.5; 0.3 ≈ 3.4σ, and the fixed hash family makes the check a
    * deterministic fact of the corpus, not a coin flip).
    */
  val EST_BOUND = 0.3

  /** X — the sketch-accuracy audit: for every near-dup pair q33 reports,
    * compare the MinHash SIGNATURE estimate of Jaccard (fraction of the
    * 32 components that agree — the number LSH banding actually acts
    * on) against the exact set Jaccard, and assert the textbook error
    * bound holds. This is the derived-fact pattern of q07_approx_hll
    * applied to the near-dup sketch: the oracle recomputes the exact
    * integers (intersection, union — brute force at its scale) and the
    * trivially-true flag; a signature-family or banding regression that
    * degrades estimates flips the flag red even while the verified pair
    * SET stays correct.
    */
  val xMinhashEst = Q(
    "x_minhash_est",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a_id, b_id, CAST(i AS BIGINT) AS inter,
              CAST(ca.c + cb.c - i AS BIGINT) AS uni,
              TRUE AS sig_within
       FROM inter
       JOIN card ca ON ca.doc_id = a_id
       JOIN card cb ON cb.doc_id = b_id
       WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= $TAU
       ORDER BY a_id, b_id""") { (s, dir) =>
    val sets = wordSetsBase(s, dir)
    val cand = candidates(bandKeys(signaturesFromSets(sets)))
    val sig = sets.select(col("doc_id"),
      graft.functions.ArrayOps.minhashSignature(col("hs"), NUM_HASHES).as("sig"))
    val withIU = cand
      .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha"),
        col("c").as("ca")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb"),
        col("c").as("cb")), "b_id")
      .withColumn("inter",
        graft.functions.ArrayOps.sortedIntersectCount(col("ha"), col("hb")))
      .withColumn("uni", col("ca") + col("cb") - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= TAU)
    withIU
      .join(sig.select(col("doc_id").as("a_id"), col("sig").as("sa")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"), col("sig").as("sb")), "b_id")
      .withColumn("n_match", expr(
        "aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"))
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"),
        (abs(col("n_match") / lit(NUM_HASHES.toDouble) -
          col("inter").cast("double") / col("uni")) <= EST_BOUND)
          .as("sig_within"))
      .orderBy("a_id", "b_id")
  }

  /** Fixed-point multiply at 1e6 scale with round-half-up — one integer
    * expression, identical text on both engines modulo the div token.
    */
  private def fpmul(a: String, b: String, div: String): String =
    s"((($a) * ($b) + 500000) $div 1000000)"

  /** x^(2^k)-style power by repeated squaring, unrolled as expression
    * text (k ≤ 4 ⇒ tiny trees). `e` must be a power of two.
    */
  private def fppow(x: String, e: Int, div: String): String = {
    require(e > 0 && (e & (e - 1)) == 0, s"fppow: $e not a power of two")
    if (e == 1) x
    else { val h = fppow(x, e / 2, div); fpmul(h, h, div) }
  }

  /** The tuned configs: (bands, rowsPerBand) with bands·rows = 32 —
    * the SHIPPED signature length. First entry IS the shipped config.
    */
  val TUNE_CONFIGS: Seq[(Int, Int)] = Seq((BANDS, ROWS_PER_BAND), (16, 2), (4, 8))

  /** X — LSH band tuning: the S-curve P(candidate | s) = 1 − (1 − s^r)^b
    * for the SHIPPED 8×4 banding and its two 32-hash alternatives — the
    * design table every LSH deployment writes down before picking b and
    * r (wide bands catch low-similarity pairs but flood the verifier;
    * narrow bands are precise but miss borderline near-dups). Anchored
    * to the shipped q33 constants by construction
    * (TUNE_CONFIGS.head == (BANDS, ROWS_PER_BAND), compile-checked).
    *
    * Exactness: the curve is evaluated in 1e6 FIXED POINT with
    * round-half-up after every squaring (s^r and (1−s^r)^b unroll as
    * power-of-two squaring chains), so both engines execute the
    * identical integer op sequence — the value is a deterministic
    * quantization of the true curve (per-step error ≤ 5e-7, ≤ 9 steps),
    * and the table is bit-exact by construction, not margin-audited.
    *
    * Scale posture: model-sized compute (9 rows × 3 configs); the value
    * at 100 TB is what it PREDICTS — expected verifier load and
    * false-negative rate per config — before a corpus-wide re-banding
    * is paid for.
    */
  val xLshBandTuning = Q(
    "x_lsh_band_tuning", {
      val div = "//"
      val cols = TUNE_CONFIGS.map { case (b, r) =>
        val q = s"(1000000 - ${fppow("sfix", r, div)})"
        s"1000000 - ${fppow(q, b, div)} AS p_b${b}r${r}_ppm"
      }.mkString(",\n              ")
      s"""WITH s AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT)
               * 100000 AS sfix)
       SELECT sfix AS s_ppm,
              $cols
       FROM s ORDER BY s_ppm"""
    }) { (s, dir) =>
    val div = "DIV"
    val cols = TUNE_CONFIGS.map { case (b, r) =>
      val q = s"(1000000 - ${fppow("sfix", r, div)})"
      expr(s"1000000 - ${fppow(q, b, div)}").as(s"p_b${b}r${r}_ppm")
    }
    s.range(1, 10)
      .select((col("id") * 100000L).as("sfix"))
      .select((col("sfix").as("s_ppm") +: cols): _*)
      .orderBy("s_ppm")
  }

  // ---- auto-tuned banding -------------------------------------------

  /** Every (bands, rowsPerBand) factorization of the 32-hash budget with
    * power-of-two rows (the fppow squaring-chain domain).
    */
  val AUTOTUNE_CONFIGS: Seq[(Int, Int)] =
    Seq((1, 32), (2, 16), (4, 8), (8, 4), (16, 2), (32, 1))

  /** The autotune design point: true near-dups must be caught with
    * P ≥ R_MIN at similarity S_HI (the corpus' planted-dup regime), and
    * among qualifying configs the one flooding the verifier least at
    * noise similarity S_LO wins. All 1e6 fixed point.
    */
  val S_HI_PPM = 900000L
  val S_LO_PPM = 200000L
  val R_MIN_PPM = 990000L

  /** Driver-side mirror of the SQL fixed-point S-curve (IDENTICAL
    * integer op sequence: round-half-up after every squaring; operands
    * are nonnegative so Scala's truncating / equals the SQL div).
    */
  private[graft] def fpMulL(a: Long, b: Long): Long =
    (a * b + 500000L) / 1000000L
  private[graft] def fpPowL(x: Long, e: Int): Long = {
    require(e > 0 && (e & (e - 1)) == 0, s"fpPowL: $e not a power of two")
    if (e == 1) x else { val h = fpPowL(x, e / 2); fpMulL(h, h) }
  }
  /** P(candidate | s) = 1 − (1 − s^r)^b in 1e6 fixed point. */
  private[graft] def sCurvePpm(b: Int, r: Int, sPpm: Long): Long =
    1000000L - fpPowL(1000000L - fpPowL(sPpm, r), b)

  /** CHOOSE (b, r) from the design targets instead of hard-coding it:
    * recall floor at S_HI, then minimize the S_LO candidate rate
    * (verifier load), bands tiebreak. Pure integer — both engines and
    * the driver compute the identical table, so the choice is
    * deterministic and auditable (x_lsh_autotune IS that audit).
    */
  def chooseBanding(rMinPpm: Long = R_MIN_PPM, sHiPpm: Long = S_HI_PPM,
      sLoPpm: Long = S_LO_PPM): (Int, Int) = {
    val ok = AUTOTUNE_CONFIGS.filter { case (b, r) =>
      sCurvePpm(b, r, sHiPpm) >= rMinPpm }
    require(ok.nonEmpty, s"no banding of 32 hashes reaches recall " +
      s"$rMinPpm ppm at s=$sHiPpm ppm — widen the budget")
    ok.minBy { case (b, r) => (sCurvePpm(b, r, sLoPpm), b) }
  }

  /** X — LSH banding AUTOTUNE: the operator that PICKS (b, r) from a
    * target (τ-regime recall, verifier-load minimization) rather than
    * shipping a hard-coded banding. One row per factorization of the
    * 32-hash budget: the fixed-point S-curve at the design points
    * S_HI (planted-dup similarity 0.9) and S_LO (noise 0.2), the recall
    * qualifier P(S_HI) ≥ 0.99, and the chosen flag — argmin P(S_LO)
    * among qualifiers. The result DERIVES the shipped 8×4: (4,8) and
    * narrower miss the recall floor (P(0.9) = 0.894 at (4,8)); (16,2),
    * (32,1) qualify but flood the verifier at 38×/79× the (8,4) noise
    * rate. x_neardup_tuned then runs the actual join under the chosen
    * banding — the choice is exercised, not just printed.
    *
    * Exactness: the same 1e6 fixed-point squaring chains as
    * x_lsh_band_tuning (round-half-up per squaring, identical op
    * sequence in Scala/Spark/DuckDB — bit-exact by construction).
    *
    * Scale posture: model-sized (6 rows); what it buys at 100 TB is
    * picking the banding BEFORE paying a corpus-wide signature +
    * re-banding pass for the wrong one.
    */
  val xLshAutotune = Q(
    "x_lsh_autotune", {
      val div = "//"
      def chain(sPpm: Long, b: Int, r: Int): String = {
        // BIGINT seed: DuckDB types a bare 900000 as INT32 and the
        // squaring chain overflows it
        val q = s"(1000000 - ${fppow(s"CAST($sPpm AS BIGINT)", r, div)})"
        s"1000000 - ${fppow(q, b, div)}"
      }
      val rows = AUTOTUNE_CONFIGS.map { case (b, r) =>
        s"""SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r,
            CAST(${chain(S_HI_PPM, b, r)} AS BIGINT) AS p_hi_ppm,
            CAST(${chain(S_LO_PPM, b, r)} AS BIGINT) AS p_lo_ppm"""
      }.mkString("\n       UNION ALL\n       ")
      s"""WITH cfg AS ($rows),
       q AS (SELECT b, r, p_hi_ppm, p_lo_ppm,
               p_hi_ppm >= $R_MIN_PPM AS qualifies FROM cfg),
       ch AS (SELECT b AS cb FROM q WHERE qualifies
              ORDER BY p_lo_ppm, b LIMIT 1)
       SELECT q.b, q.r, q.p_hi_ppm, q.p_lo_ppm, q.qualifies,
              q.b = ch.cb AS chosen
       FROM q, ch ORDER BY q.b"""
    }) { (s, dir) =>
    // the curve is computed BY THE ENGINE (the same unrolled fixed-point
    // squaring chains the oracle runs — Catalyst constant-folds them,
    // which is the point: identical integer op sequence, zero runtime
    // cost); only the argmin choice is driver logic, and the spec pins
    // it to the engine table
    def chain(sPpm: Long, b: Int, r: Int): String = {
      val q = s"(1000000 - ${fppow(s"CAST($sPpm AS BIGINT)", r, "DIV")})"
      s"1000000 - ${fppow(q, b, "DIV")}"
    }
    val rows = AUTOTUNE_CONFIGS.map { case (b, r) =>
      s"""SELECT CAST($b AS BIGINT) AS b, CAST($r AS BIGINT) AS r,
          CAST(${chain(S_HI_PPM, b, r)} AS BIGINT) AS p_hi_ppm,
          CAST(${chain(S_LO_PPM, b, r)} AS BIGINT) AS p_lo_ppm"""
    }.mkString(" UNION ALL ")
    val (cb, _) = chooseBanding()
    s.sql(rows)
      .withColumn("qualifies", col("p_hi_ppm") >= R_MIN_PPM)
      .withColumn("chosen", col("b") === cb.toLong)
      .orderBy("b")
  }

  /** X — the near-dup join under the AUTOTUNED banding: q33's exact
    * machinery with (b, r) = chooseBanding() instead of the hard-coded
    * constants, against the same brute-force oracle — proving the
    * derived banding loses no τ-pair on this corpus. (The chooser
    * derives 8×4 here, so this doubles as a regression pin: if the
    * design constants drift, either this query's banding changes and
    * the oracle re-proves it, or the recall floor trips loudly.)
    */
  val xNeardupTuned = Q(
    "x_neardup_tuned",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2)
       SELECT a_id, b_id, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
       FROM inter
       JOIN card ca ON ca.doc_id = a_id
       JOIN card cb ON cb.doc_id = b_id
       WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= $TAU
       ORDER BY a_id, b_id""") { (s, dir) =>
    val (b, r) = chooseBanding()
    val sets = wordSetsBase(s, dir)
    val cand = candidates(bandKeys(signaturesFromSets(sets), b, r))
    exactJaccardFromSets(cand, sets)
      .filter(col("jaccard") >= TAU)
      .orderBy("a_id", "b_id")
  }

  /** X — the dedup-threshold OPERATING CURVE: what each candidate τ
    * would actually do to this corpus — pair count, documents dropped
    * (higher id of any qualifying pair, the stage-5 greedy), and corpus
    * retention — for τ ∈ {0.5 … 0.9}, all from ONE pair computation
    * (every row of the curve is a cumulative slice of the τ=0.5 pair
    * set, which q33's green oracle proves banding captures exhaustively
    * on this corpus). x_lsh_autotune picks the banding from the S-curve
    * MODEL; this picks τ from the CORPUS — the two tables a dedup
    * deployment writes down before shipping either knob.
    *
    * Exact: J ≥ τ spelled cross-multiplied (10·inter ≥ t10·union) — no
    * division; retention is the 1e6 integer quotient.
    *
    * Scale posture: the pair set is the capped-LSH candidate stream
    * (never all-pairs); the ×5 threshold expansion multiplies PAIRS
    * (already a sliver of the corpus), and the curve's group domain is
    * 5 rows. The corpus-size scalar is one count.
    *
    * Measured finding on THIS lake (asserted in LlmOpsSpec): the curve
    * is nearly flat — ≥96% of near-dup pairs sit at J ≥ 0.9 (27/28 at
    * sf0.001, 25/25 at sf0.01: the fixture plants full-text variants
    * with almost no mid-similarity tail), so the τ knob is close to
    * free here. That is the kind of fact the table exists to surface:
    * on a real web corpus the retention column falls as τ drops and
    * the curve prices the trade.
    */
  val xDedupThresholdCurve = Q(
    "x_dedup_threshold_curve",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id,
                   CAST(count(*) AS BIGINT) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       pairs AS (SELECT a_id, b_id, i, ca.c + cb.c - i AS u
                 FROM inter
                 JOIN card ca ON ca.doc_id = a_id
                 JOIN card cb ON cb.doc_id = b_id
                 WHERE 10 * i >= 5 * (ca.c + cb.c - i)),
       taus AS (SELECT CAST(unnest(generate_series(5, 9)) AS BIGINT) AS tau_x10),
       hit AS (SELECT tau_x10, a_id, b_id FROM pairs, taus
               WHERE 10 * i >= tau_x10 * u),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
       SELECT tau_x10, CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(count(DISTINCT b_id) AS BIGINT) AS n_losers,
              (1000000 * (tot.n - count(DISTINCT b_id))) // tot.n
                AS retention_ppm
       FROM hit, tot GROUP BY tau_x10, tot.n ORDER BY tau_x10""") { (s, dir) =>
    val docs = T(s, dir, "documents")
    val sets = wordSetsBase(s, dir)
    // capped, like the incremental path: the scale-posture claim above
    // ("the pair set is the capped-LSH candidate stream") is only true
    // if the hot-bucket cap is actually applied (round-12 advice)
    val cand = cappedCandidates(bandKeys(signaturesFromSets(sets)),
      FullCuration.MAX_BUCKET)
    val pairs = cand
      .join(sets.select(col("doc_id").as("a_id"), col("hs").as("ha"),
        col("c").as("ca")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("hs").as("hb"),
        col("c").as("cb")), "b_id")
      .select(col("a_id"), col("b_id"),
        graft.functions.ArrayOps.sortedIntersectCount(col("ha"), col("hb"))
          .as("i"), col("ca"), col("cb"))
      .select(col("a_id"), col("b_id"), col("i"),
        (col("ca") + col("cb") - col("i")).as("u"))
      .filter(lit(10L) * col("i") >= lit(5L) * col("u"))
    val taus = s.range(5, 10).select(col("id").as("tau_x10"))
    val n = docs.count()
    pairs.crossJoin(broadcast(taus))
      .filter(lit(10L) * col("i") >= col("tau_x10") * col("u"))
      .groupBy(col("tau_x10"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("b_id")).as("n_losers"))
      .select(col("tau_x10"), col("n_pairs"), col("n_losers"),
        expr(s"(1000000 * (${n}L - n_losers)) div ${n}L")
          .as("retention_ppm"))
      .orderBy("tau_x10")
  }

  /** Sample modulus: a doc is sampled iff its md5-derived 40-bit hash is
    * ≡0 (mod 2) — inclusion probability p = 1/2, so a PAIR survives with
    * p² = 1/4 and the unbiased pair-count estimator is 4·observed.
    */
  val SMP_MOD = 2L

  /** X — dedup SIZING by pair-sampled estimation: the measurement a
    * pipeline runs BEFORE paying for corpus-wide dedup. Sample docs by a
    * deterministic hash coin (p = 1/2), run the near-dup join INSIDE the
    * sample only — cost scales as p² of the full job since both shingle
    * volume and bucket sizes shrink — and scale the observed pair count
    * by 1/p². Both endpoints are graded: observed/est_pairs from the
    * sample-only pipeline, true_pairs from the full pipeline beside it
    * (the audit twin, same dense/scaled contract as
    * x_common_neighbors). est vs true here: 24 vs 25 at sf0.01, 324 vs
    * 256 at sf0.1 — honest sampling variance (pairs are rare events;
    * the estimator is unbiased, not low-variance at tiny counts), which
    * is exactly what the table teaches: size the sample to the decision,
    * not to a point estimate.
    *
    * Determinism: the coin is the md5-40bit integer mod 2 — no RNG; all
    * counts exact. The pair predicate is q33's τ = 1/2 exact-Jaccard
    * verify over capped-LSH candidates (banding exhaustiveness on this
    * corpus is q33's proven contract; it holds a fortiori inside the
    * sample, whose buckets are subsets).
    */
  val xDedupSampleEstimate = Q(
    "x_dedup_sample_estimate",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       card AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id,
                   CAST(count(*) AS BIGINT) AS i
                 FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       pairs AS (SELECT a_id, b_id FROM inter
                 JOIN card ca ON ca.doc_id = a_id
                 JOIN card cb ON cb.doc_id = b_id
                 WHERE 10 * i >= 5 * (ca.c + cb.c - i)),
       smp AS (SELECT doc_id FROM documents
               WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT
                 % $SMP_MOD = 0)
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
              (SELECT CAST(count(*) AS BIGINT) FROM smp) AS n_sample,
              (SELECT CAST(count(*) AS BIGINT) FROM pairs
               WHERE a_id IN (SELECT doc_id FROM smp)
                 AND b_id IN (SELECT doc_id FROM smp)) AS observed_pairs,
              ${SMP_MOD * SMP_MOD} * (SELECT CAST(count(*) AS BIGINT) FROM pairs
               WHERE a_id IN (SELECT doc_id FROM smp)
                 AND b_id IN (SELECT doc_id FROM smp)) AS est_pairs,
              (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS true_pairs""") {
    (s, dir) =>
    val docs = T(s, dir, "documents")
    val sets = wordSetsBase(s, dir)
    val smpCond = expr(
      s"""cast(conv(substring(md5(cast(doc_id as string)), 1, 10), 16, 10)
          as bigint) % $SMP_MOD = 0""")

    def pairCount(ss: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val cand = cappedCandidates(bandKeys(signaturesFromSets(ss)),
        FullCuration.MAX_BUCKET)
      cand
        .join(ss.select(col("doc_id").as("a_id"), col("hs").as("ha"),
          col("c").as("ca")), "a_id")
        .join(ss.select(col("doc_id").as("b_id"), col("hs").as("hb"),
          col("c").as("cb")), "b_id")
        .select(graft.functions.ArrayOps.sortedIntersectCount(
          col("ha"), col("hb")).as("i"), col("ca"), col("cb"))
        .filter(lit(10L) * col("i") >=
          lit(5L) * (col("ca") + col("cb") - col("i")))
        .agg(count(lit(1)).as("n"))
    }

    val observed = pairCount(sets.filter(smpCond))
      .select(col("n").as("observed_pairs"))
    val full = pairCount(sets).select(col("n").as("true_pairs"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val nSample = docs.filter(smpCond).agg(count(lit(1)).as("n_sample"))
    nDocs.crossJoin(nSample).crossJoin(observed).crossJoin(full)
      .select(col("n_docs"), col("n_sample"), col("observed_pairs"),
        (lit(SMP_MOD * SMP_MOD) * col("observed_pairs")).as("est_pairs"),
        col("true_pairs"))
  }

  val all: Seq[Q] =
    Seq(q33, xCharNgram, xMinhashEst, xLshBandTuning, xLshAutotune,
      xNeardupTuned, xDedupThresholdCurve, xDedupSampleEstimate)
}
