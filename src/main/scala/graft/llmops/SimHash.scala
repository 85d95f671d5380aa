package graft.llmops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** SimHash document sketches (48-bit) for near-dup detection at scale.
  *
  * Per (doc, shingle): a 48-bit hash taken from the md5 hex prefix —
  * chosen because BOTH engines can derive the identical integer from the
  * same md5 text (Spark `conv(hex,16,10)`, DuckDB `('0x'||hex)::BIGINT`),
  * making the sketch itself oracle-checkable, unlike engine-native hash
  * functions. Per bit j: sum(±1) over shingles, sign → bit.
  *
  * One narrow pass + one agg shuffle per doc — no pairwise work; at
  * 100 TB near-dup candidates come from hamming-banding the sketch
  * (same banding machinery as MinHashLSH).
  */
object SimHash {

  val BITS = 48

  private val sumExprsSql = (0 until BITS)
    .map(j => s"sum(((h >> $j) & 1) * 2 - 1) AS s$j").mkString(",\n           ")
  private val bitExprSql = (0 until BITS)
    .map(j => s"CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END")
    .mkString(" + ")

  /** Spark plan: instead of 48 independent sum aggregates (whose generated
    * code blows past codegen method limits), the ones-counters are PACKED —
    * bits {o, o+12, o+24, o+36} share one long via a lane mask, so the
    * aggregation is 12 masked sums + a row count; per-bit counts unpack in
    * a cheap one-row-per-doc projection. Majority: 2·ones ≥ n ⟺ sum(±1) ≥ 0,
    * matching the oracle's 48-sum spelling exactly. Lane capacity 4095
    * shingles/doc (asserted far above test corpus sizes).
    */
  val xSimhash = Q(
    "x_simhash",
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       h AS (SELECT doc_id, CAST('0x' || substr(md5(sh), 1, 12) AS BIGINT) AS h FROM sh),
       s AS (SELECT doc_id,
           $sumExprsSql
         FROM h GROUP BY doc_id)
       SELECT doc_id, $bitExprSql AS simhash
       FROM s ORDER BY doc_id""") { (s, dir) =>
    val sh = Shingles.wordShingles(T(s, dir, "documents"), 3)
    val h = sh.select(col("doc_id"),
      conv(substring(md5(col("sh")), 1, 12), 16, 10).cast("long").as("h"))
    val laneMask = 0x0000001001001001L // bits 0,12,24,36
    val lanes = (0 until 12).map(o =>
      sum(shiftright(col("h"), o).bitwiseAND(laneMask)).as(s"lane$o"))
    val aggregated = h.groupBy(col("doc_id"))
      .agg(lanes.head, lanes.tail :+ count(lit(1)).as("n"): _*)
    val simhash = (0 until BITS).map { j =>
      val ones = shiftright(col(s"lane${j % 12}"), 12 * (j / 12)).bitwiseAND(0xfff)
      when(ones * 2 >= col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    aggregated
      .select(col("doc_id"), simhash.as("simhash"))
      .orderBy("doc_id")
  }

  /** Sketch-level near-dup pairing: band the 48-bit simhash into 4
    * 12-bit keys, candidate = any equal band, then verify
    * hamming(a, b) <= MAX_HAMMING with xor+bit_count. With MAX_HAMMING=3
    * the pigeonhole principle makes banding recall EXACT (≤3 flipped bits
    * cannot touch all 4 bands), so the LSH path provably equals the
    * oracle's brute force. Candidate generation is equi-join shuffles
    * only — never O(n²).
    */
  val MAX_HAMMING = 3

  private val simhashCte =
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
              FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(t)-2, 1))) AS i)
              WHERE len(t) >= 3),
       h AS (SELECT doc_id, CAST('0x' || substr(md5(sh), 1, 12) AS BIGINT) AS h FROM sh),
       s AS (SELECT doc_id,
           $sumExprsSql
         FROM h GROUP BY doc_id),
       sk AS (SELECT doc_id, $bitExprSql AS simhash FROM s)"""

  val xSimhashNeardup = Q(
    "x_simhash_neardup",
    s"""$simhashCte
       SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              bit_count(xor(a.simhash, b.simhash)) AS hamming
       FROM sk a JOIN sk b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= $MAX_HAMMING
       ORDER BY a_id, b_id""") { (s, dir) =>
    val sketches = xSimhash.build(s, dir).cache()
    graft.core.CacheBin.swap("x_simhash_neardup.sketches", sketches)
    val bands = sketches.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), 12 * b).bitwiseAND(0xfff).as("bk"))): _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.band"), col("e.bk"))
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "bk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("x.simhash").as("sa"),
        col("y.doc_id").as("b_id"), col("y.simhash").as("sb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .filter(col("hamming") <= MAX_HAMMING)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy("a_id", "b_id")
  }

  /** X — the same near-dup join under MULTI-PROBE banding (Lv et al.,
    * VLDB'07, adapted to Hamming space): TWO 24-bit bands instead of
    * four 12-bit ones, with the index side posting one key per band and
    * the probe side ALSO posting every 1-bit flip of its band key
    * (25 keys/band). Recall stays provably exact: ≤ MAX_HAMMING = 3
    * flipped bits over 2 bands leave some band with ≤ 1 flip
    * (pigeonhole), and a 1-flip band is covered by exactly one of the
    * probe's flip keys. Output ≡ x_simhash_neardup (same oracle) — the
    * point is the PATH: half the index tables (the memory that
    * dominates an LSH service at corpus scale) bought with a bounded
    * 25× probe fan-out, the standard memory-vs-probe knob. Candidate
    * precision also rises: a 24-bit agreement (even ±1 bit) is ~2¹²×
    * rarer by chance than a 12-bit one, so the verify stage sees fewer
    * false candidates — SCALING.md records both candidate counts.
    *
    * Scale posture: probe expansion is a flat 50×-keys flatMap on the
    * probe side only (map-side, no state); the join is still equi-join
    * banding, never O(n²); the verify is the same xor+bit_count.
    */
  val xSimhashMultiprobe = Q(
    "x_simhash_multiprobe",
    s"""$simhashCte
       SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              bit_count(xor(a.simhash, b.simhash)) AS hamming
       FROM sk a JOIN sk b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= $MAX_HAMMING
       ORDER BY a_id, b_id""") { (s, dir) =>
    val sketches = xSimhash.build(s, dir).cache()
    graft.core.CacheBin.swap("x_simhash_multiprobe.sketches", sketches)
    val mask24 = (1L << 24) - 1
    // index side: one exact key per 24-bit band
    val index = sketches.select(col("doc_id"), col("simhash"),
        explode(array((0 until 2).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), 24 * b).bitwiseAND(mask24).as("bk"))): _*))
          .as("e"))
      .select(col("doc_id"), col("simhash"), col("e.band"), col("e.bk"))
    // probe side: the exact key plus its 24 single-bit flips
    val probe = sketches.select(col("doc_id"), col("simhash"),
        explode(array((0 until 2).flatMap(b => (-1 until 24).map(j =>
          struct(lit(b).as("band"), {
            val key = shiftright(col("simhash"), 24 * b).bitwiseAND(mask24)
            (if (j < 0) key else key.bitwiseXOR(lit(1L << j))).as("bk")
          }))): _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.band"), col("e.bk"))
    val cand = probe.as("x").join(index.as("y"), Seq("band", "bk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("x.simhash").as("sa"),
        col("y.doc_id").as("b_id"), col("y.simhash").as("sb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .filter(col("hamming") <= MAX_HAMMING)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Q] = Seq(xSimhash, xSimhashNeardup, xSimhashMultiprobe)
}
