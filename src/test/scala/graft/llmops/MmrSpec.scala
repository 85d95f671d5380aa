package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("greedy trajectory matches a driver-side reference MMR") {
    val pool = Mmr.pool(spark, sf)
      .select(col("probe_id"), col("vec_id"), col("rel_fix"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    val sims = Mmr.poolSims(Mmr.pool(spark, sf))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (p, a, b, s) => (p, a, b) -> s }.toMap

    def ref(p: Long): Seq[(Long, Long)] = {
      val cands = pool(p)
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val first = cands.maxBy { case (v, rel) => (rel, -v) }
      sel += ((first._1, first._2 * Mmr.WREL))
      while (sel.length < Mmr.SELK) {
        val rest = cands.filterNot(c => sel.exists(_._1 == c._1))
        val scored = rest.map { case (v, rel) =>
          val msim = sel.map(s => sims((p, v, s._1))).max
          (v, rel * Mmr.WREL - msim * Mmr.WDIV)
        }
        sel += scored.maxBy { case (v, sc) => (sc, -v) }
      }
      sel.toSeq
    }

    val got = Mmr.diversify(spark, sf)
      .select(col("probe_id"), col("step"), col("vec_id"), col("score_fix"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    assert(got.keySet == pool.keySet)
    got.keys.foreach { p =>
      assert(got(p) == ref(p), s"probe $p trajectory diverges from reference")
    }
  }

  test("diversification reduces within-selection redundancy vs pure top-k") {
    val pool = Mmr.pool(spark, sf)
    val sims = Mmr.poolSims(pool)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (p, a, b, s) => (p, a, b) -> s }.toMap
    val topk = pool
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
          .orderBy(col("rel_fix").desc, col("vec_id"))))
      .filter(col("rn") <= Mmr.SELK)
      .select(col("probe_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val mmr = Mmr.diversify(spark, sf)
      .select(col("probe_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    def maxPair(p: Long, sel: Seq[Long]): Long =
      (for (a <- sel; b <- sel if a != b) yield sims((p, a, b))).max

    // MMR's defining property, measured not assumed: per probe, the
    // worst within-selection similarity never exceeds pure top-k's, and
    // it strictly improves for at least one probe
    val pairs = mmr.keys.toSeq.sorted.map(p =>
      (maxPair(p, mmr(p)), maxPair(p, topk(p))))
    pairs.foreach { case (m, t) => assert(m <= t) }
    assert(pairs.exists { case (m, t) => m < t },
      "MMR never improved redundancy over pure top-k on this data")
  }
}
