package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class LangModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("avgNll matches an independent in-memory bigram LM computation") {
    val texts = Seq(
      (0L, "a b a b c"),
      (1L, "a b c a b"),
      (2L, "c c c c"),
      (3L, "b a"))
    val df = texts.toDF("doc_id", "text")
    val got = LangModel.avgNll(df).as[(Long, Double)].collect().toMap

    // independent reference: plain Scala maps
    val toks = texts.map { case (id, t) => id -> t.split(" ").toSeq }
    val bigrams = toks.flatMap { case (id, ws) =>
      ws.zip(ws.tail).map(b => (id, b)) }
    val cnt = bigrams.groupBy(_._2).map { case (b, xs) => b -> xs.size.toDouble }
    val uni = cnt.groupBy(_._1._1).map { case (w, xs) => w -> xs.values.sum }
    val v = toks.flatMap(_._2).distinct.size.toDouble
    val k = 0.5
    val want = bigrams.groupBy(_._1).map { case (id, xs) =>
      val nll = xs.map { case (_, b) =>
        -math.log((cnt(b) + k) / (uni(b._1) + k * v)) }.sum / xs.size
      id -> BigDecimal(nll).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) < 1e-9, s"doc $id: got ${got(id)} want $w")
    }
  }

  test("repeated low-entropy text scores LESS perplexed than shuffled-vocab text") {
    // 'a a a a …' makes (a,a) the dominant bigram → high probability → low NLL
    val df = Seq(
      (0L, Seq.fill(30)("a").mkString(" ")),
      (1L, (0 until 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val nll = LangModel.avgNll(df).as[(Long, Double)].collect().toMap
    assert(nll(0L) < nll(1L))
  }

  test("cross scoring gives unseen bigrams the smoothing floor, not a drop") {
    val train = Seq((0L, "a b a b a b")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b a b"),   // fully in-model
      (11L, "x y x y"))   // fully out-of-model (w1 unseen too)
    .toDF("doc_id", "text")
    val got = LangModel.avgNllCross(train, score, cacheKey = "spec.cross")
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(10L, 11L), "OOV doc must not vanish from output")
    assert(got(11L) > got(10L), "out-of-model doc must be more perplexed")
    // exact floor: every bigram of doc 11 has c=0 and cw=0 (unseen history
    // word), so p = k/(k*v) = 1/v with v = |{a, b}| = 2
    val floor = BigDecimal(-math.log(1.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(11L) - floor) < 1e-9)
  }

  test("contract query returns ranks 1..20 with distinct docs on sf0.001") {
    val out = LangModel.xBigramLm.build(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq == (1L to 20L))
    assert(out.map(_._2).distinct.length == 20)
  }
}
