package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AudioFingerprintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val AF = AudioFingerprint

  test("PCM decode: sample values match the fixtures' closed-form sine") {
    // mel_doc_401: segment s plays freq[s] at amp 12000, phase restarting
    // per 100-frame segment — recompute independently (int() truncation
    // toward zero, matching the generator and the JVM's .toInt)
    val freqs = Seq(400.0, 640.0, 880.0, 560.0, 720.0, 400.0, 960.0, 480.0,
      800.0, 400.0, 640.0, 480.0, 880.0, 720.0, 560.0, 960.0)
    val got = AF.samples(
        spark.read.format("binaryFile")
          .load(s"${AF.blobDir}/mel_doc_401.wav"))
      .orderBy("idx").select("val").as[Long].collect()
    assert(got.length == 1600)
    val want = (0 until 1600).map { i =>
      val s = i / 100; val n = i % 100
      (12000 * math.sin(2 * math.Pi * freqs(s) * n / 8000)).toLong
    }
    assert(got.toSeq == want)
  }

  test("stereo decode takes channel 0 and truncates to whole windows") {
    val got = AF.samples(
        spark.read.format("binaryFile")
          .load(s"${AF.blobDir}/audio_doc_202.wav"))
      .agg(count(lit(1)), max(col("idx"))).as[(Long, Long)].head()
    assert(got == ((1600L, 1599L))) // 1600 frames = 16 whole windows
    val got203 = AF.samples(
        spark.read.format("binaryFile")
          .load(s"${AF.blobDir}/audio_doc_203.wav"))
      .count()
    assert(got203 == 2200L) // 2205 frames -> torn 5-sample tail dropped
  }

  test("peaks are amplitude-invariant and land on the designed bins") {
    val p = AF.peaks(spark)
      .groupBy("file_name")
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("win"), col("peak")))),
        x => x.getField("peak").cast("string")), "|").as("seq"))
      .as[(String, String)].collect().toMap
    // same melody, different volume -> identical peak sequence
    assert(p("mel_doc_401.wav") == p("mel_doc_402.wav"))
    // on-bin notes: freq f at rate 8000, W=100 -> bin f/80 exactly
    assert(p("mel_doc_401.wav") == "5|8|11|7|9|5|12|6|10|5|8|6|11|9|7|12")
    assert(p("mel_doc_403.wav") == "6|9|12|8|10|6|11|5|7|10|9|6|8|12|5|11")
    // a constant tone is a constant peak
    assert(p("audio_doc_201.wav").split('|').distinct.length == 1)
  }

  test("near-dup match: the volume pair matches, distinct melodies do not") {
    val out = AF.xAudioNeardup.build(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("mel_doc_401.wav", "mel_doc_402.wav", 14L)))
    // and the near-miss is measured, not assumed: 401 vs 403 share
    // exactly one transition (6->11), far under MIN_COMMON
    val h = AF.hashes(spark).as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((h("mel_doc_401.wav") intersect h("mel_doc_403.wav")).size == 1)
  }
}
