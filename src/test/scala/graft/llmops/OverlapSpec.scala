package graft.llmops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class OverlapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("rouge: fixed points are the exact rationals and clipping binds") {
    for (dir <- dirs) {
      val out = Overlap.xRougeEval.build(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      val total = graft.core.Tables(spark, dir, "documents").count()
      assert(out.length == total, "one row per document")
      out.foreach { case (id, m1, c1, r1, p, r, f1) =>
        assert(m1 >= 0 && m1 <= c1 && m1 <= r1, s"doc $id: clipped m1")
        assert(c1 < r1, s"doc $id: candidate must be shorter (drops)")
        assert(p == 1000000L * m1 / c1)
        assert(r == 1000000L * m1 / r1)
        assert(f1 == 2000000L * m1 / (c1 + r1))
        assert(f1 >= r && f1 <= p, s"doc $id: F1 must sit between R and P")
      }
      // the 'the' replacement must make clipping bind for at least one doc
      assert(out.exists(o => o._2 < o._3),
        s"$dir: no doc with precision < 1 — clipping untested")
      info(s"$dir: ${out.length} docs, " +
        s"${out.count(o => o._2 < o._3)} docs with bound clipping")
    }
  }

  test("bleu: fixed point matches the recomputed formula and both penalties bind") {
    for (dir <- dirs) {
      val Array(r) = Overlap.xBleuEval.build(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      val (m1, c1, m2, c2, rl, cl, fix) = r
      assert(cl < rl, "brevity penalty must bind (candidate shorter)")
      assert(m1 < c1, "unigram clipping must bind")
      assert(m2 < c2, "bigram precision must be < 1")
      val bp = math.exp(1.0 - rl.toDouble / cl)
      val bleu = bp * math.sqrt((m1.toDouble / c1) * (m2.toDouble / c2))
      assert(fix == math.round(1e6 * bleu))
      assert(fix > 100000 && fix < 999999, s"degenerate BLEU $fix")
      info(f"$dir: BLEU=${fix / 1e6}%.6f (BP=$bp%.4f, " +
        f"p1=${m1.toDouble / c1}%.4f, p2=${m2.toDouble / c2}%.4f)")
    }
  }

  test("chrf: fixed point matches the recomputed formula and grams are exact") {
    for (dir <- dirs) {
      val Array(r) = Overlap.xChrfEval.build(spark, dir).collect()
      def l(i: Int) = r.getLong(i)
      val (m1, c1, r1, m2, c2, r2, m3, c3, r3) =
        (l(0), l(1), l(2), l(3), l(4), l(5), l(6), l(7), l(8))
      // clipped matches bounded by both sides; candidate shorter than
      // reference at every n (the rewrite drops 'the' tokens AND their
      // characters)
      for ((m, c, rr) <- Seq((m1, c1, r1), (m2, c2, r2), (m3, c3, r3))) {
        assert(m >= 0 && m <= c && m <= rr)
        assert(c < rr, "candidate char stream must be shorter")
      }
      // total gram counts are determined by the stripped text lengths:
      // Σ_n (len - n + 1) per doc, n = 1..3
      val docs = graft.core.Tables(spark, dir, "documents")
      val refChars = docs.select(
          length(regexp_replace(col("text"), " ", "")).cast("long"))
        .as[Long].collect()
      assert(r1 == refChars.sum)
      assert(r2 == refChars.map(n => math.max(0L, n - 1)).sum)
      assert(r3 == refChars.map(n => math.max(0L, n - 2)).sum)
      val p = (m1.toDouble / c1 + m2.toDouble / c2 + m3.toDouble / c3) / 3.0
      val rc = (m1.toDouble / r1 + m2.toDouble / r2 + m3.toDouble / r3) / 3.0
      val chrf = 5.0 * p * rc / (4.0 * p + rc)
      assert(r.getLong(9) == math.round(1e6 * chrf))
      assert(r.getLong(9) > 500000 && r.getLong(9) < 999999,
        s"degenerate chrF ${r.getLong(9)}")
      info(f"$dir: chrF=${r.getLong(9) / 1e6}%.6f (P=$p%.4f, R=$rc%.4f)")
    }
  }

  test("dpo pairs: agg spelling equals the brute-force window spelling") {
    for (dir <- dirs) {
      val docs = graft.core.Tables(spark, dir, "documents")
      val wb = Window.partitionBy("lang", "source")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val ww = Window.partitionBy("lang", "source")
        .orderBy(col("n_chars").asc, col("doc_id"))
      val brute = docs
        .withColumn("rb", row_number().over(wb))
        .withColumn("rw", row_number().over(ww))
      val ch = brute.filter(col("rb") === 1).select(col("lang"), col("source"),
        col("doc_id").as("bc"), col("n_chars").as("bcs"))
      val rj = brute.filter(col("rw") === 1).select(col("lang"), col("source"),
        col("doc_id").as("br"), col("n_chars").as("brs"))
      val expect = ch.join(rj, Seq("lang", "source"))
        .filter(col("bcs") - col("brs") >= Preference.DPO_MARGIN)
        .as[(String, String, Long, Long, Long, Long)].collect()
        .map(t => (t._1, t._2) -> (t._3, t._4, t._5, t._6)).toMap
      val out = Preference.xDpoPairs.build(spark, dir)
        .as[(String, String, Long, Long, Long, Long, Long)].collect()
      assert(out.length == expect.size)
      out.foreach { case (lang, source, cid, cs, rid, rs, gap) =>
        val (ecid, ecs, erid, ers) = expect((lang, source))
        assert((cid, cs, rid, rs) == (ecid, ecs, erid, ers),
          s"$dir ($lang,$source)")
        assert(gap == cs - rs && gap >= Preference.DPO_MARGIN)
        assert(cid != rid, "chosen and rejected must differ")
      }
      info(s"$dir: ${out.length} trainable pairs, " +
        s"max gap ${out.map(_._7).max}")
    }
  }
}
