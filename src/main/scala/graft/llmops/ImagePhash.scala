package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Q

/** Image perceptual-hash near-duplicate detection — the image-side twin
  * of the text near-dup family (q33 MinHash, x_simhash): a standard
  * stage of any multimodal corpus pipeline (re-encoded, rescaled, or
  * lightly-edited copies of the same image should dedup together even
  * though their bytes differ).
  *
  * Algorithm: dHash (difference hash) — decode, average-pool the
  * grayscale pixels onto a 9×8 grid, and emit one bit per horizontally
  * adjacent cell pair (left average > right average), 64 bits total.
  * Resolution-invariant by construction (the pooling grid is fixed);
  * robust to small edits (one edited block can only flip the few bits
  * whose cells it touches).
  *
  * Cross-engine float discipline: pooled averages are NEVER divided —
  * the bit compares sum_l·n_r > sum_r·n_l in exact integer arithmetic,
  * and the 64-bit hash ships as two 32-bit BIGINT lanes (hi, lo) so no
  * engine touches a sign bit or a float. The oracle recomputes the
  * SAME hashes without any PNG decoder: the committed fixtures
  * (tools/make_png_fixtures.py) have closed-form pixels
  * v = (x·kx + y·ky + seed [+ delta inside the perturbed block]) % 256,
  * so DuckDB rebuilds the pixel table from generate_series arithmetic,
  * pools it with the same integer cell mapping, and must land on
  * bit-identical hashes — a REAL end-to-end check of the decode + pool
  * + hash path, not a rows-only count.
  *
  * Near-dup pairing: band the 64-bit hash into 8 bytes; candidate =
  * any equal (band, value); verify exact Hamming ≤ MAX_HAMMING_IMG
  * with xor + bit_count. With MAX_HAMMING_IMG = 6 < 8 bands the
  * pigeonhole principle makes banding recall EXACT (6 flipped bits
  * cannot touch all 8 bands) — same argument as x_simhash_neardup
  * (SimHash.scala:65-72). Candidate generation is equi-join shuffles
  * only — never O(n²); at corpus scale the band join is the standard
  * LSH shape (hash-partitioned on band value, hot-bucket-cappable
  * like MinHashLSH if boilerplate images flood a band).
  *
  * Fixture geometry (measured in the design pass, asserted in
  * Round9Spec): near-dup pairs (103,104) and (105,106) sit at Hamming
  * 4 — real distance-verify work, not exact-hash matches — while every
  * unrelated pair is ≥ 19, a 13-bit margin above the bar.
  */
object ImagePhash {

  val MAX_HAMMING_IMG = 6

  private val blobDir = Multimodal.blobDir

  private val hashSchema = StructType(Seq(
    StructField("img_id", LongType),
    StructField("hi", LongType),
    StructField("lo", LongType)))

  /** Decode each PNG fixture FOR REAL (javax.imageio raster) and pool
    * to the 9×8 dHash grid: (img_id, hi, lo) with hi = bits of grid
    * rows 0-3 and lo = rows 4-7 (32 bits each). Cell mapping is
    * cx = x·9 div w, cy = y·8 div h — integer arithmetic the oracle
    * replicates exactly. Per-partition batch op, no shuffle; undecodable
    * or unnamed blobs are dropped (same posture as extractFeatures).
    */
  def dhashes(s: SparkSession): DataFrame = {
    val files = s.read.format("binaryFile").load(s"$blobDir/img_doc_*.png")
    val idRe = "img_doc_(\\d+)".r
    val rdd = files.select(col("path"), col("content")).rdd.mapPartitions { it =>
      it.flatMap { row =>
        val path = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        idRe.findFirstMatchIn(path).map(_.group(1).toLong).flatMap { imgId =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            val raster = img.getRaster
            val w = img.getWidth
            val h = img.getHeight
            val sums = Array.ofDim[Long](8, 9)
            val ns = Array.ofDim[Long](8, 9)
            var y = 0
            while (y < h) {
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                sums(cy)(x * 9 / w) += raster.getSample(x, y, 0)
                ns(cy)(x * 9 / w) += 1
                x += 1
              }
              y += 1
            }
            var hi = 0L
            var lo = 0L
            for (cy <- 0 until 8; i <- 0 until 8) {
              val bit =
                if (sums(cy)(i) * ns(cy)(i + 1) > sums(cy)(i + 1) * ns(cy)(i)) 1L
                else 0L
              if (cy < 4) hi |= bit << (cy * 8 + i)
              else lo |= bit << ((cy - 4) * 8 + i)
            }
            Some(Row(imgId, hi, lo))
          } catch { case _: Exception => None } // not a decodable image
        }
      }
    }
    s.createDataFrame(rdd, hashSchema)
  }

  /** Closed-form fixture spec shared with tools/make_png_fixtures.py —
    * the oracle's pixel source (and Round9Spec's, which recomputes the
    * hashes driver-side from it). Keep this list and the generator in
    * sync; the oracle VALUES clause derives from it below.
    */
  val fixtureSpec: Seq[(Int, Int, Int, Int, Int, Int, Int, Int, Int)] = Seq(
    // (img_id, w, h, kx, ky, seed, px, py, delta)
    (101, 17, 9, 31, 17, 3, 0, 0, 0),
    (102, 33, 21, 31, 17, 7, 0, 0, 0),
    (103, 120, 77, 31, 17, 11, 0, 0, 0),
    (104, 120, 77, 31, 17, 11, 27, 30, 100),
    (105, 90, 60, 73, 41, 5, 0, 0, 0),
    (106, 90, 60, 73, 41, 5, 30, 23, 100),
    (107, 64, 48, 7, 113, 29, 0, 0, 0))

  private val specValues = fixtureSpec.map { case (i, w, h, kx, ky, sd, px, py, d) =>
    s"($i,$w,$h,$kx,$ky,$sd,$px,$py,$d)"
  }.mkString(", ")

  /** The oracle's closed-form dHash pipeline (spec → pixels → pooled
    * cells → bits → two 32-bit hash lanes), shared by both image
    * queries' SQL.
    */
  private[llmops] val hashCte =
    s"""spec(img_id, w, h, kx, ky, seed, px, py, delta) AS (VALUES
         $specValues),
       pix AS (SELECT img_id, (x*9)//w AS cx, (y*8)//h AS cy,
                 (x*kx + y*ky + seed +
                  CASE WHEN x < px AND y < py THEN delta ELSE 0 END) % 256 AS v
               FROM spec,
                    LATERAL (SELECT unnest(generate_series(0, w-1)) AS x) xs,
                    LATERAL (SELECT unnest(generate_series(0, h-1)) AS y) ys),
       cells AS (SELECT img_id, cy, cx, sum(v) AS sv, count(*) AS n
                 FROM pix GROUP BY 1, 2, 3),
       bits AS (SELECT a.img_id, a.cy, a.cx,
                       CASE WHEN a.sv*b.n > b.sv*a.n THEN 1 ELSE 0 END AS bit
                FROM cells a JOIN cells b
                  ON a.img_id = b.img_id AND a.cy = b.cy AND b.cx = a.cx + 1),
       hashes AS (SELECT img_id,
                    CAST(sum(CASE WHEN cy < 4
                          THEN bit * (CAST(1 AS BIGINT) << (cy*8 + cx))
                          ELSE 0 END) AS BIGINT) AS hi,
                    CAST(sum(CASE WHEN cy >= 4
                          THEN bit * (CAST(1 AS BIGINT) << ((cy-4)*8 + cx))
                          ELSE 0 END) AS BIGINT) AS lo
                  FROM bits GROUP BY 1)"""

  /** Banded near-dup pairs (a_id, b_id, hamming) over the decoded
    * hashes — the engine half both image queries build on.
    */
  def neardupPairs(s: SparkSession): DataFrame =
    neardupPairsFromHashes(dhashes(s))

  /** The banded candidate + Hamming-verify stage over ANY
    * (img_id, hi, lo) frame — split out so GraftProps can drive it with
    * generated hashes (the pigeonhole-exactness property: ≤ 6 flipped
    * bits can never escape all 8 bands).
    */
  def neardupPairsFromHashes(hashes: DataFrame): DataFrame = {
    // 8 bands of 8 bits: bands 0-3 slice hi, 4-7 slice lo
    val bands = hashes.select(col("img_id"), col("hi"), col("lo"),
      explode(array((0 until 8).map { b =>
        val lane = if (b < 4) col("hi") else col("lo")
        struct(lit(b).as("band"),
          shiftright(lane, 8 * (b % 4)).bitwiseAND(0xff).as("bk"))
      }: _*)).as("e"))
      .select(col("img_id"), col("hi"), col("lo"),
        col("e.band").as("band"), col("e.bk").as("bk"))
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "bk"))
      .filter(col("x.img_id") < col("y.img_id"))
      .select(col("x.img_id").as("a_id"), col("x.hi").as("ha"),
        col("x.lo").as("la"),
        col("y.img_id").as("b_id"), col("y.hi").as("hb"),
        col("y.lo").as("lb"))
      .distinct()
    cand
      .withColumn("hamming",
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("long"))
      .filter(col("hamming") <= MAX_HAMMING_IMG)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  val xImagePhashNeardup = Q(
    "x_image_phash_neardup",
    s"""WITH $hashCte
       SELECT CAST(a.img_id AS BIGINT) AS a_id,
              CAST(b.img_id AS BIGINT) AS b_id,
              CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
                   AS BIGINT) AS hamming
       FROM hashes a JOIN hashes b ON a.img_id < b.img_id
       WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
             <= $MAX_HAMMING_IMG
       ORDER BY a_id, b_id""") { (s, dir) =>
    neardupPairs(s).orderBy("a_id", "b_id")
  }

  /** X — image dedup FAMILIES: connected components over the banded
    * phash near-dup pairs, every image labeled with its family's
    * minimum id (singletons label themselves) — the image-side twin of
    * x_dedup_families, and the step a multimodal corpus pipeline
    * actually consumes (drop all but one per family). Reuses
    * DedupFamilies.components (driver union-find under the threshold,
    * pointer-jumping label propagation above it); the oracle reruns the
    * closed-form hash pipeline and resolves families with a recursive
    * min-label transitive closure, x_dedup_families' spelling.
    */
  val xImageDedupFamilies = Q(
    "x_image_dedup_families",
    s"""WITH RECURSIVE $hashCte,
       pairs AS (SELECT a.img_id AS a_id, b.img_id AS b_id
                 FROM hashes a JOIN hashes b ON a.img_id < b.img_id
                 WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
                       <= $MAX_HAMMING_IMG),
       edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                 UNION ALL SELECT b_id, a_id FROM pairs),
       r(id, label) AS (SELECT src, src FROM edges
                        UNION
                        SELECT e.dst, r.label FROM edges e JOIN r ON e.src = r.id),
       fam AS (SELECT id, min(label) AS family FROM r GROUP BY id)
       SELECT CAST(s.img_id AS BIGINT) AS img_id,
              CAST(coalesce(f.family, s.img_id) AS BIGINT) AS family,
              s.img_id = coalesce(f.family, s.img_id) AS is_survivor
       FROM spec s LEFT JOIN fam f ON f.id = s.img_id
       ORDER BY img_id""") { (s, dir) =>
    val imgs = dhashes(s).select(col("img_id"))
    val labels = DedupFamilies.components(
      neardupPairs(s).select(col("a_id"), col("b_id")))
    imgs.join(labels, imgs("img_id") === labels("id"), "left")
      .select(col("img_id"),
        coalesce(col("label"), col("img_id")).as("family"))
      .withColumn("is_survivor", col("img_id") === col("family"))
      .orderBy("img_id")
  }

  val all: Seq[Q] = Seq(xImagePhashNeardup, xImageDedupFamilies)
}
