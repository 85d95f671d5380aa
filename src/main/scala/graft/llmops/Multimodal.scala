package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Q, Tables => T}

/** Multimodal (binary) columns (SURVEY.md §2b Q36): media blobs as opaque
  * `binary` columns with typed metadata, read via Spark's binaryFile
  * source. Fixture blobs live in-repo (fixtures/blobs, deterministic,
  * committed) so both engines read identical bytes.
  *
  * Scale posture: binaryFile splits per-file across executors; metadata
  * (path/length) is available without reading content, so pure-metadata
  * queries never fetch bytes. Feature extraction is a mapPartitions batch
  * op with REAL decoders for the formats the JDK ships: PNG via
  * javax.imageio and WAV via javax.sound (width/height/pixel stats and
  * sample-rate/duration are decoded from actual bytes, oracle-checked
  * against header parses). Frame demux is real too: the .mpng fixtures
  * are concatenated-PNG containers and pngFrameBounds walks the actual
  * chunk structure (signature → length-typed chunks → IEND) to cut frame
  * boundaries — a different container format swaps only that walk, the
  * Spark plumbing (generator over mapPartitions) is format-agnostic.
  */
object Multimodal {

  val blobDir = "/root/repo/fixtures/blobs"

  /** Q36 — binary scan: per-file name, size, content digest. The digest
    * is md5 over the hex rendering of the bytes (this DuckDB build lacks
    * md5(BLOB); both engines hex-encode identically, so the digests
    * still compare byte content).
    */
  val q36 = Q(
    "q36_multimodal",
    s"""SELECT parse_filename(filename) AS file_name,
        CAST(size AS BIGINT) AS n_bytes, md5(hex(content)) AS digest
        FROM read_blob('$blobDir/*.bin') ORDER BY file_name""") { (s, dir) =>
    s.read.format("binaryFile").load(s"$blobDir/*.bin")
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("length").as("n_bytes"),
        md5(hex(col("content"))).as("digest"))
      .orderBy("file_name")
  }

  /** Q36b — metadata join: blob ↔ document row via the doc id encoded in
    * the filename (media sidecar pattern: bytes opaque, metadata typed).
    */
  val q36b = Q(
    "q36_multimodal_join",
    s"""SELECT d.doc_id, d.lang, CAST(b.size AS BIGINT) AS n_bytes
        FROM read_blob('$blobDir/*.bin') b
        JOIN documents d
          ON d.doc_id = CAST(regexp_extract(parse_filename(b.filename), 'doc_(\\d+)', 1) AS BIGINT)
        ORDER BY d.doc_id""") { (s, dir) =>
    val blobs = s.read.format("binaryFile").load(s"$blobDir/*.bin")
      .select(
        regexp_extract(col("path"), "doc_(\\d+)", 1).cast("long").as("blob_doc_id"),
        col("length").as("n_bytes"))
    T(s, dir, "documents")
      .join(broadcast(blobs), col("doc_id") === col("blob_doc_id"))
      .select(col("doc_id"), col("lang"), col("n_bytes"))
      .orderBy("doc_id")
  }

  /** Feature-extraction schema for decoded media. */
  val featureSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("digest", StringType)))

  /** Decode + feature-extract as a partition-batched op. Image blobs are
    * decoded FOR REAL via `javax.imageio` (JDK built-in — PNG/JPEG/GIF/
    * BMP readers, no external deps): width/height come from the decoded
    * image. Undecodable blobs (e.g. raw .bin media we have no demuxer
    * for) keep the byte-stats path with null dimensions. The digest is
    * md5 over the uppercase-hex rendering of the bytes, matching
    * `md5(hex(content))` in both Spark and DuckDB.
    */
  def extractFeatures(binaryFiles: DataFrame): DataFrame = {
    val spark = binaryFiles.sparkSession
    val rdd = binaryFiles.select(col("path"), col("content")).rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { row =>
        val path = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        val name = path.substring(path.lastIndexOf('/') + 1)
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length
        val img =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          catch { case _: Exception => None }
        val (w, h) = img match {
          case Some(i) => (Integer.valueOf(i.getWidth), Integer.valueOf(i.getHeight))
          case None => (null, null)
        }
        val hx = new StringBuilder(bytes.length * 2)
        bytes.foreach(b => hx.append(f"${b & 0xff}%02X"))
        md.reset()
        val digest = md.digest(hx.toString.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        Row(name, bytes.length.toLong, mean, w, h, digest)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** X — the feature-extraction pipeline over ALL fixture blobs (PNG
    * images decode for real; .bin blobs take the no-decoder path). The
    * oracle re-derives the image dimensions from the PNG IHDR header
    * bytes (fixture dims are < 256, so width/height are single bytes at
    * offsets 20/24) — fully independent of the JVM decoder.
    */
  val xFeatures = Q(
    "x_media_features",
    s"""SELECT parse_filename(filename) AS file_name,
          CAST(size AS BIGINT) AS n_bytes,
          CASE WHEN substr(hex(content), 1, 16) = '89504E470D0A1A0A'
               THEN (strpos('0123456789ABCDEF', substr(hex(content),39,1))-1)*16
                    + strpos('0123456789ABCDEF', substr(hex(content),40,1))-1 END AS width,
          CASE WHEN substr(hex(content), 1, 16) = '89504E470D0A1A0A'
               THEN (strpos('0123456789ABCDEF', substr(hex(content),47,1))-1)*16
                    + strpos('0123456789ABCDEF', substr(hex(content),48,1))-1 END AS height,
          md5(hex(content)) AS digest
        FROM read_blob('$blobDir/*') ORDER BY file_name""") { (s, dir) =>
    extractFeatures(s.read.format("binaryFile").load(s"$blobDir/*"))
      .select(col("file_name"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("digest"))
      .orderBy("file_name")
  }

  /** Audio metadata schema for decoded WAV/AIFF blobs. */
  val audioSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("n_bytes", LongType),
    StructField("channels", LongType),
    StructField("sample_rate", LongType),
    StructField("n_frames", LongType)))

  /** Decode audio container metadata FOR REAL via `javax.sound.sampled`
    * (JDK built-in WAV/AIFF/AU readers, no external deps): channel
    * count, sample rate, and frame length from the parsed header.
    * Same mapPartitions shape as the image path.
    */
  def extractAudioFeatures(binaryFiles: DataFrame): DataFrame = {
    val spark = binaryFiles.sparkSession
    val rdd = binaryFiles.select(col("path"), col("content")).rdd.mapPartitions { it =>
      it.flatMap { row =>
        val path = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        val name = path.substring(path.lastIndexOf('/') + 1)
        try {
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(bytes))
          Some(Row(name, bytes.length.toLong,
            aff.getFormat.getChannels.toLong,
            aff.getFormat.getSampleRate.toLong,
            aff.getFrameLength.toLong))
        } catch { case _: Exception => None } // not an audio container
      }
    }
    spark.createDataFrame(rdd, audioSchema)
  }

  private def wavByte(n: Int): String =
    s"(strpos('0123456789ABCDEF', substr(hx, ${2 * n - 1}, 1))-1)*16 + " +
      s"strpos('0123456789ABCDEF', substr(hx, ${2 * n}, 1))-1"

  /** X — audio metadata decode over the WAV fixtures. The oracle
    * re-derives channels / sample rate / frame count from the canonical
    * 44-byte RIFF header bytes (little-endian fields hex-sliced in SQL)
    * — fully independent of the JVM decoder.
    */
  val xAudio = Q(
    "x_audio_features",
    s"""WITH h AS (SELECT parse_filename(filename) AS file_name, hex(content) AS hx,
                          size FROM read_blob('$blobDir/*.wav')),
        b AS (SELECT file_name, size, hx,
                ${wavByte(23)} AS b23, ${wavByte(24)} AS b24,
                ${wavByte(25)} AS b25, ${wavByte(26)} AS b26,
                ${wavByte(27)} AS b27, ${wavByte(28)} AS b28,
                ${wavByte(33)} AS b33, ${wavByte(34)} AS b34,
                ${wavByte(41)} AS b41, ${wavByte(42)} AS b42,
                ${wavByte(43)} AS b43, ${wavByte(44)} AS b44
              FROM h)
        SELECT file_name, CAST(size AS BIGINT) AS n_bytes,
               CAST(b23 + 256*b24 AS BIGINT) AS channels,
               CAST(b25 + 256*b26 + 65536*b27 + 16777216*b28 AS BIGINT) AS sample_rate,
               CAST((b41 + 256*b42 + 65536*b43 + 16777216*b44) / (b33 + 256*b34) AS BIGINT) AS n_frames
        FROM b ORDER BY file_name""") { (s, dir) =>
    extractAudioFeatures(s.read.format("binaryFile").load(s"$blobDir/*.wav"))
      .orderBy("file_name")
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Frame boundaries of a concatenated-PNG container, derived from the
    * REAL format structure: each frame is an 8-byte PNG signature followed
    * by (4-byte big-endian length, 4-byte type, data, 4-byte CRC) chunks
    * through IEND — the frame ends after IEND's CRC. A truncated trailing
    * frame (signature present, no complete IEND) is dropped, like a
    * demuxer discarding a torn tail write. Returns [start, end) byte
    * offsets per frame.
    */
  private[graft] def pngFrameBounds(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    def sigAt(p: Int): Boolean =
      p + 8 <= bytes.length && (0 until 8).forall(i => bytes(p + i) == sig(i))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    var ok = true
    while (ok && sigAt(pos)) {
      var p = pos + 8
      var ended = false
      var corrupt = false
      while (!ended && !corrupt && p + 12 <= bytes.length) {
        val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        // a garbled length field (negative as signed Int, or advancing
        // past the blob / past Int range) is corruption, not structure:
        // treat like a truncated tail — drop this frame, stop the walk.
        // Without the guard len = -12 would spin this loop forever and a
        // huge len would overflow p negative into bytes(p) AIOOBE.
        if (len < 0 || len > bytes.length - p - 12) corrupt = true
        else {
          val isEnd = bytes(p + 4) == 'I' && bytes(p + 5) == 'E' &&
            bytes(p + 6) == 'N' && bytes(p + 7) == 'D'
          p += 12 + len // length + type + data + crc
          ended = isEnd
        }
      }
      if (ended && p <= bytes.length) { out += ((pos, p)); pos = p }
      else ok = false
    }
    out.toSeq
  }

  /** Container demux: one row per frame of each concatenated-PNG blob,
    * boundaries from the real chunk structure (pngFrameBounds). The Spark
    * shape — a generator (1 blob row → N frame rows) over mapPartitions,
    * binary payload per row — is how video sampling lands in a DataFrame
    * at scale; a different container format swaps only the bounds walk.
    */
  def demuxPngFrames(binaryFiles: DataFrame): DataFrame = {
    val spark = binaryFiles.sparkSession
    val rdd = binaryFiles.select(col("path"), col("content")).rdd.mapPartitions { it =>
      it.flatMap { row =>
        val path = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        val name = path.substring(path.lastIndexOf('/') + 1)
        pngFrameBounds(bytes).zipWithIndex.map { case ((a, b), i) =>
          Row(name, i, java.util.Arrays.copyOfRange(bytes, a, b))
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** REAL image resize over binary frames: decode via `javax.imageio`,
    * integer-factor downscale with a nearest-neighbor Graphics2D draw
    * (deterministic — no filtering kernel), re-encode as PNG.
    * Shape-preserving (binary in → smaller binary out, metadata carried
    * through); frames that don't decode pass through unchanged.
    */
  def resize(frames: DataFrame, factor: Int): DataFrame = {
    val spark = frames.sparkSession
    val schema = frames.schema
    val frameIdx = schema.fieldIndex("frame")
    val rdd = frames.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](frameIdx)
        val out =
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            if (img == null) bytes
            else {
              val w = math.max(1, img.getWidth / factor)
              val h = math.max(1, img.getHeight / factor)
              val typ = if (img.getType == java.awt.image.BufferedImage.TYPE_CUSTOM)
                java.awt.image.BufferedImage.TYPE_INT_ARGB else img.getType
              val dst = new java.awt.image.BufferedImage(w, h, typ)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
                g.drawImage(img, 0, 0, w, h, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", bos)
              bos.toByteArray
            }
          } catch { case _: Exception => bytes }
        Row.fromSeq(row.toSeq.updated(frameIdx, out))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Per-frame decoded metadata: byte length + javax.imageio dimensions. */
  private def frameMeta(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    val schema = StructType(Seq(
      StructField("file_name", StringType),
      StructField("frame_idx", IntegerType),
      StructField("frame_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val rdd = frames.select(col("file_name"), col("frame_idx"), col("frame"))
      .rdd.mapPartitions { it =>
        it.map { row =>
          val bytes = row.getAs[Array[Byte]](2)
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          val (w, h) = img match {
            case Some(i) => (Integer.valueOf(i.getWidth), Integer.valueOf(i.getHeight))
            case None => (null, null)
          }
          Row(row.getString(0), row.getInt(1), bytes.length.toLong, w, h)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** One IHDR byte of the frame starting at 1-based blob offset `p`
    * (SQL hex-string arithmetic; fixture dims < 256 keep every field in
    * its LSB).
    */
  private def frByte(off: Int): String =
    s"(strpos('0123456789ABCDEF', substr(hx, 2*(p+$off)-1, 1))-1)*16 + " +
      s"strpos('0123456789ABCDEF', substr(hx, 2*(p+$off), 1))-1"

  /** X — container demux + per-frame decode + 2× resize over the
    * concatenated-PNG fixtures. Frame boundaries come from the REAL chunk
    * structure on the Spark side; the oracle independently re-derives
    * them by scanning for the PNG signature in the blob's hex rendering
    * and reads each frame's IHDR width/height bytes directly (offsets 19
    * and 23 from the frame start are the dimension LSBs). The resized
    * dims are re-DECODED from the re-encoded frames, while the oracle
    * computes the same integer halving arithmetically — a disagreement in
    * either direction (demux drift, resize off-by-one) hash-fails.
    */
  val xFrames = Q(
    "x_media_frames",
    s"""WITH b AS (SELECT parse_filename(filename) AS file_name,
                          hex(content) AS hx, size
                   FROM read_blob('$blobDir/*.mpng')),
        pos AS (SELECT file_name, size, hx, i AS p
                FROM b, LATERAL (SELECT unnest(generate_series(1, CAST(size - 7 AS BIGINT))) AS i)
                WHERE substr(hx, 2*i - 1, 16) = '89504E470D0A1A0A'),
        fr AS (SELECT file_name, size, hx, p,
                      row_number() OVER (PARTITION BY file_name ORDER BY p) - 1 AS frame_idx,
                      lead(p) OVER (PARTITION BY file_name ORDER BY p) AS nxt
               FROM pos)
        SELECT file_name, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(coalesce(nxt, size + 1) - p AS BIGINT) AS frame_bytes,
               CAST(${frByte(19)} AS BIGINT) AS width,
               CAST(${frByte(23)} AS BIGINT) AS height,
               CAST((${frByte(19)}) // 2 AS BIGINT) AS rs_width,
               CAST((${frByte(23)}) // 2 AS BIGINT) AS rs_height
        FROM fr ORDER BY file_name, frame_idx""") { (s, dir) =>
    val frames = demuxPngFrames(
      s.read.format("binaryFile").load(s"$blobDir/*.mpng"))
    val orig = frameMeta(frames)
    val rs = frameMeta(resize(frames, factor = 2))
      .select(col("file_name"), col("frame_idx"),
        col("width").as("rs_width"), col("height").as("rs_height"))
    orig.join(rs, Seq("file_name", "frame_idx"))
      .select(col("file_name"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("rs_width").cast("long").as("rs_width"),
        col("rs_height").cast("long").as("rs_height"))
      .orderBy("file_name", "frame_idx")
  }

  val all: Seq[Q] = Seq(q36, q36b, xFeatures, xAudio, xFrames)
}
