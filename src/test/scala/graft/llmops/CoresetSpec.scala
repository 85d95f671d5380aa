package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class CoresetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("greedy trace matches a driver-side brute force and the radius shrinks") {
    for (dir <- dirs) {
      val vecs = VectorSearch.embeddingsBase(spark, dir)
        .select("vec_id", "n_emb").as[(Long, Seq[Double])].collect()
        .sortBy(_._1)
      def simFix(a: Seq[Double], b: Seq[Double]): Long =
        math.round(1e6 * a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum)
      // brute-force greedy
      var chosen = Vector(0L)
      var trace = Vector((1, 0L, -1L))
      while (chosen.length < Coreset.K) {
        val cents = chosen.map(id => vecs.find(_._1 == id).get._2)
        val cand = vecs.filterNot(v => chosen.contains(v._1))
          .map { case (id, e) => (id, cents.map(c => simFix(e, c)).max) }
        val best = cand.minBy { case (id, ms) => (ms, id) }
        chosen :+= best._1
        trace :+= ((chosen.length, best._1, best._2))
      }
      val out = Coreset.xCoresetKcenter.build(spark, dir)
        .as[(Int, Long, Long)].collect().sortBy(_._1)
      assert(out.toSeq == trace,
        s"$dir: greedy trace mismatch\n got ${out.toSeq}\n exp $trace")
      assert(out.map(_._2).distinct.length == Coreset.K, "distinct centers")
      // covering radius shrinks: the farthest point's max-sim is
      // non-decreasing once real selections start
      val sims = out.drop(1).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => b >= a },
        s"$dir: far-sim trace not monotone: ${sims.toSeq}")
      info(s"$dir: centers ${out.map(_._2).mkString(",")}, " +
        s"far-sim ${sims.head / 1e6} -> ${sims.last / 1e6}")
    }
  }
}
