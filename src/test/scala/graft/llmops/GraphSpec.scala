package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent scaled-integer PageRank on the driver — the same
    * recurrence the distributed operator (and the DuckDB oracle) encode,
    * implemented over plain Maps so a bug in the join/agg spelling can't
    * hide behind itself.
    */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    val teleport = (15L * Graph.SCALE) / (100L * n)
    var pr: Map[Long, Long] = deg.map { case (id, _) => id -> Graph.SCALE / n }
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (src, _) => pr(src) / deg(src) }.sum
      }.toMap
      pr = in.map { case (id, s) => id -> (teleport + (85L * s) / 100L) }
    }
    pr
  }

  test("pagerank matches an independent driver-side computation on a path graph") {
    // undirected path 1–2–3 as both-direction edges; the middle node must
    // dominate and the two leaves tie by symmetry
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val got = Graph.pagerank(edges.toDF("src", "dst"), Graph.ITERS,
        cacheKey = "spec.pagerank.path")
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, Graph.ITERS))
    assert(got(2L) > got(1L) && got(1L) == got(3L))
  }

  test("pagerank matches the reference on a star graph and ranks the hub first") {
    val spokes = (2L to 9L)
    val edges = spokes.flatMap(s => Seq((1L, s), (s, 1L)))
    val got = Graph.pagerank(edges.toDF("src", "dst"), Graph.ITERS,
        cacheKey = "spec.pagerank.star")
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, Graph.ITERS))
    assert(spokes.forall(s => got(1L) > got(s)))
    // scaled-integer mass is conserved up to truncation loss: the total
    // can only drift DOWN from SCALE, and by less than one unit per
    // node per iteration
    val total = got.values.sum
    assert(total <= Graph.SCALE &&
      total > Graph.SCALE - (got.size.toLong + 1) * (Graph.ITERS + 1))
  }
}
