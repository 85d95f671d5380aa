package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pipeline ships survivors with good captions and drops the planted dups") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val out = MultimodalPipeline.xMultimodalPipeline.build(spark, dir)
        .as[(Long, Long, Long, Boolean, Long, Boolean, Boolean)].collect()
        .map(r => r._1 -> r).toMap
      assert(out.size == ImagePhash.fixtureSpec.size, "one row per image")
      // the fixture plants 104 as a near-dup of 103 and 106 of 105
      assert(out(104L)._2 == 103L && !out(104L)._4, "104 must fold into 103")
      assert(out(106L)._2 == 105L && !out(106L)._4, "106 must fold into 105")
      assert(out(103L)._3 == 2 && out(105L)._3 == 2, "dup family sizes")
      Seq(101L, 102L, 107L).foreach { i =>
        assert(out(i)._2 == i && out(i)._3 == 1 && out(i)._4,
          s"$i must be a singleton survivor")
      }
      out.values.foreach { case (id, fam, _, surv, n, capOk, ship) =>
        assert(surv == (id == fam))
        assert(ship == (surv && capOk), s"img $id: ship flag inconsistent")
        assert(n > 0)
      }
      val shipped = out.values.count(_._7)
      assert(shipped >= 1, "at least one pair must ship")
      assert(shipped < out.size, "dedup must drop at least one")
      info(s"$dir: $shipped/${out.size} pairs shipped " +
        s"(${out.values.count(!_._4)} dedup drops, " +
        s"${out.values.count(v => v._4 && !v._6)} caption drops)")
    }
  }
}
