package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class EnsembleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ensemble keep-list matches a brute-force three-ranker fusion") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.core.Tables(spark, dir, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
        .as[(Long, String)].collect()
      val m = docs.map { case (id, text) =>
        val ws = text.split(" ", -1)
        val n = ws.length.toLong
        val st = ws.count(TextStats.stopEn.contains).toLong
        val dw = ws.distinct.length.toLong
        (id, n, 1000 * st / n, 1000 * dw / n)
      }
      def ranks(score: ((Long, Long, Long, Long)) => Long): Map[Long, Long] =
        m.sortBy(r => (-score(r), r._1)).take(TextStats.RRF_TOPK)
          .zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
      val (r1, r2, r3) = (ranks(_._2), ranks(_._3), ranks(_._4))
      def rrf(id: Long): Double =
        Seq(r1, r2, r3).map(r =>
          r.get(id).map(rk => 1.0 / (TextStats.RRF_K + rk)).getOrElse(0.0)).sum
      val ids = (r1.keySet ++ r2.keySet ++ r3.keySet).toSeq
      val expect = ids.map(id => (id, rrf(id)))
        .sortBy { case (id, s) => (-s, id) }.take(20)
        .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
      val out = TextStats.xQualityEnsemble.build(spark, dir)
        .as[(Long, Long, Double)].collect().toSeq
      assert(out == expect, s"$dir fusion mismatch")
      // all three rankers must contribute to the survivors
      val top = out.map(_._2).toSet
      assert(top.exists(r1.contains) && top.exists(r2.contains) &&
        top.exists(r3.contains))
      info(s"$dir: top fused score ${out.head._3} (doc ${out.head._2})")
    }
  }
}
