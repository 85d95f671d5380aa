package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-13: the temperature-mix α operating curve. */
class TemperatureCurveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val SF = "/root/testdata/sf0.001"

  test("curve weights are bit-equal to the driver recompute; shape is right") {
    val rows = Curation.xTemperatureCurve.build(spark, SF).collect()
      .map(r => (r.getAs[Long]("alpha_x10"), r.getAs[String]("lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("wfix"),
        r.getAs[Long]("share_ppm"), r.getAs[Long]("boost_ppm")))

    val counts = graft.core.Tables(spark, SF, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nn = counts.values.sum

    // bit-equality of every fixed-point weight
    rows.foreach { case (a, l, n, wfix, _, _) =>
      assert(n == counts(l))
      val expect = math.round(
        math.pow(n.toDouble / nn, a / 10.0) * 1000000000L)
      assert(wfix == expect, s"wfix($l, α=$a)")
    }

    // shares sum to ~1e6 per α (floor-div slack < |langs|)
    rows.groupBy(_._1).foreach { case (a, g) =>
      val s = g.map(_._5).sum
      assert(s > 1000000L - g.size && s <= 1000000L, s"share sum at α=$a: $s")
    }

    // the tail language's boost falls monotonically toward 1e6 as α→1;
    // the head language's share rises monotonically
    val tail = counts.minBy(_._2)._1
    val head = counts.maxBy(_._2)._1
    val tailBoosts = rows.filter(_._2 == tail).sortBy(_._1).map(_._6)
    val headShares = rows.filter(_._2 == head).sortBy(_._1).map(_._5)
    assert(tailBoosts.toSeq == tailBoosts.sortBy(-_).toSeq,
      s"tail boosts: ${tailBoosts.toSeq}")
    assert(headShares.toSeq == headShares.sorted.toSeq,
      s"head shares: ${headShares.toSeq}")
    // α=1 is the proportional endpoint: boost ≈ 1e6 for every language
    rows.filter(_._1 == 10L).foreach { case (_, l, _, _, _, b) =>
      assert(math.abs(b - 1000000L) < 2000, s"α=1 boost for $l: $b")
    }
  }
}
