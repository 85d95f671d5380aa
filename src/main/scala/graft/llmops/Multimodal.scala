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
  * against header parses). Only video frame demux remains a byte-block
  * stub — no container demuxer exists in the JDK; the mapPartitions
  * plumbing it sits in is the real shape a decoder drops into.
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

  /** Frame sampling: one row per sampled fixed-size frame of each media
    * blob. The frame boundaries here are byte-block STUBS for a real
    * container demuxer; the Spark shape — a generator (1 blob row → N
    * frame rows) over mapPartitions, binary payload per row — is exactly
    * how video sampling lands in a DataFrame at scale.
    */
  def sampleFrames(binaryFiles: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    val spark = binaryFiles.sparkSession
    val rdd = binaryFiles.select(col("path"), col("content")).rdd.mapPartitions { it =>
      it.flatMap { row =>
        val path = row.getString(0)
        val bytes = row.getAs[Array[Byte]](1)
        val name = path.substring(path.lastIndexOf('/') + 1)
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by every).map { i =>
          Row(name, i, bytes.slice(i * frameBytes, (i + 1) * frameBytes))
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Resize stub: fixed-ratio downsample of the binary payload (every
    * k-th byte) standing in for an image resampler; shape-preserving
    * (binary in → smaller binary out, metadata carried through).
    */
  def resize(frames: DataFrame, factor: Int): DataFrame = {
    val spark = frames.sparkSession
    val schema = frames.schema
    val frameIdx = schema.fieldIndex("frame")
    val rdd = frames.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](frameIdx)
        val out = Array.tabulate(bytes.length / factor)(i => bytes(i * factor))
        Row.fromSeq(row.toSeq.updated(frameIdx, out))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** X — frame-sample + resize over the fixture blobs. The byte-block
    * demux contract is fully size-derivable, so the oracle re-derives it:
    * frames are 256-byte blocks (partial tail dropped), every 2nd frame
    * is sampled, and the 4× resize leaves 64 bytes per frame.
    */
  val xFrames = Q(
    "x_media_frames",
    s"""SELECT parse_filename(filename) AS file_name,
          CAST(i AS BIGINT) AS frame_idx, CAST(64 AS BIGINT) AS frame_bytes
        FROM read_blob('$blobDir/*.bin'),
             LATERAL (SELECT unnest(generate_series(0, CAST(size // 256 AS BIGINT) - 1, 2)) AS i)
        ORDER BY file_name, frame_idx""") { (s, dir) =>
    val frames = sampleFrames(
      s.read.format("binaryFile").load(s"$blobDir/*.bin"), frameBytes = 256, every = 2)
    resize(frames, factor = 4)
      .select(col("file_name"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"))
      .orderBy("file_name", "frame_idx")
  }

  val all: Seq[Q] = Seq(q36, q36b, xFeatures, xAudio, xFrames)
}
