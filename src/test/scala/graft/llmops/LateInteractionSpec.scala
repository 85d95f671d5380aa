package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class LateInteractionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val L = LateInteraction

  test("MaxSim bounds and self-identity") {
    val raw = L.maxsimRaw(spark, sf)
      .select(col("probe_id"), col("vec_id"), col("maxsim"))
      .as[(Long, Long, Double)].collect()
    assert(raw.nonEmpty)
    // each of the T=4 per-query-token maxima is a cosine in [-1, 1]
    raw.foreach { case (_, _, ms) =>
      assert(ms <= L.T + 1e-9 && ms >= -L.T - 1e-9)
    }
    // a probe against itself: every token best-matches itself at cos 1
    raw.filter(r => r._1 == r._2).foreach { case (p, _, ms) =>
      assert(math.abs(ms - L.T) < 1e-9, s"probe $p self-MaxSim $ms != ${L.T}")
    }
    // and the self-match tops each probe's rerank
    val top = L.xMaxsimRerank.build(spark, sf)
      .filter(col("rank") === 1)
      .select(col("probe_id"), col("vec_id")).as[(Long, Long)].collect()
    top.foreach { case (p, v) => assert(p == v, s"probe $p top-1 is $v") }
  }

  test("MaxSim agrees with a driver-side reference on a sample of pairs") {
    val embs = VectorSearch.embeddingsBase(spark, sf)
      .select(col("vec_id"), col("emb")).as[(Long, Seq[Double])]
      .collect().toMap
    def toks(v: Seq[Double]): Seq[Seq[Double]] =
      (0 until L.T).map { t =>
        val s = v.slice(t * L.D, (t + 1) * L.D)
        val n = math.sqrt(s.map(x => x * x).sum)
        s.map(_ / n)
      }
    def ref(q: Long, d: Long): Double =
      toks(embs(q)).map { qt =>
        toks(embs(d)).map(dt => qt.zip(dt).map { case (a, b) => a * b }.sum).max
      }.sum
    val raw = L.maxsimRaw(spark, sf)
      .select(col("probe_id"), col("vec_id"), col("maxsim"))
      .as[(Long, Long, Double)].collect()
    raw.take(40).foreach { case (p, d, ms) =>
      assert(math.abs(ms - ref(p, d)) < 1e-9, s"pair ($p,$d): $ms vs ${ref(p, d)}")
    }
  }

  test("the rerank is not the coarse order (late interaction earns its keep)") {
    val coarse = VectorSearch.q34.build(spark, sf)
      .select(col("probe_id"), col("rank"), col("vec_id"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val fine = L.xMaxsimRerank.build(spark, sf)
      .select(col("probe_id"), col("rank"), col("vec_id"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(fine.keySet == coarse.keySet)
    assert(fine.exists { case (p, order) => coarse(p) != order },
      "MaxSim reproduced the single-vector top-10 for every probe — " +
        "the rerank stage is vacuous on this data")
  }
}
