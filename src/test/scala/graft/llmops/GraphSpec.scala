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
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val teleport = (15L * Graph.SCALE) / (100L * n)
    var pr: Map[Long, Long] = nodes.map(id => id -> Graph.SCALE / n).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(deg.contains).map(pr).sum
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (src, _) => pr(src) / deg(src) }.sum
      }.toMap
      pr = nodes.map { id =>
        id -> (teleport + (85L * (in.getOrElse(id, 0L) + dm / n)) / 100L)
      }.toMap
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

  test("pagerank on a sink-bearing directed graph conserves mass (dangling fix)") {
    // directed star 1 → {2..9}: the spokes are SINKS (in-edges, no
    // out-edges). Before the dangling-mass redistribution this graph
    // silently leaked 85% of the spokes' rank every sweep; now the total
    // must stay within integer-truncation loss of SCALE, every node must
    // appear in the output, and the distributed result must match the
    // driver-side recurrence exactly.
    val edges = (2L to 9L).map(s => (1L, s))
    val got = Graph.pagerank(edges.toDF("src", "dst"), Graph.ITERS,
        cacheKey = "spec.pagerank.sinks")
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, Graph.ITERS))
    assert(got.keySet == (1L to 9L).toSet, "sink nodes missing from output")
    // truncation drift compounds geometrically (each sweep keeps 85% of
    // the previous drift and adds <~30 integer units of its own), so the
    // honest bound is a few hundred 1e-9 units — twelve orders of
    // magnitude tighter than the ~0.5·SCALE leak the fix removes
    val total = got.values.sum
    assert(total <= Graph.SCALE && total > Graph.SCALE - 10000L,
      s"rank mass leaked: total $total vs SCALE ${Graph.SCALE}")
    // spokes tie by symmetry, and each spoke OUTRANKS the hub: the hub
    // has no in-edges (teleport + its 1/N dangling share only), while
    // every spoke also receives the hub's out-contribution — the
    // qualitative signature that sink mass was redistributed, not
    // returned to its source or dropped
    assert((3L to 9L).forall(s => got(s) == got(2L)))
    assert(got(2L) > got(1L))
  }

  test("common neighbors: ordered pairs, counts verified against a brute recount") {
    val sf = "/root/testdata/sf0.001"
    val rows = Graph.xCommonNeighbors.build(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq == (1L to 20L))
    rows.foreach { case (_, s1, s2, c) => assert(s1 < s2 && c >= 1) }
    val commons = rows.map(_._4)
    assert(commons.zip(commons.tail).forall { case (a, b) => a >= b },
      "counts not non-increasing by rank")
    // brute recount of the top pair from the raw fact tables
    val (_, t1, t2, tc) = rows.head
    val e = graft.core.Tables(spark, sf, "lineitem")
      .join(graft.core.Tables(spark, sf, "orders"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct()
      .as[(Long, Long)].collect().groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    assert((e(t1) & e(t2)).size.toLong == tc, s"top pair ($t1,$t2) recount mismatch")
  }

  test("packedPairs emits exactly the a<b pairs of a sorted-distinct array") {
    import org.apache.spark.sql.functions._
    val got = Seq(Seq(2L, 5L, 9L), Seq(7L), Seq.empty[Long])
      .toDF("ss")
      .select(graft.functions.ArrayOps.packedPairs(col("ss")).as("ps"))
      .as[Seq[Long]].collect()
    assert(got(0) == Seq((2L << 32) | 5L, (2L << 32) | 9L, (5L << 32) | 9L))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("capped common neighbors matches a driver-side capped recount at sf0.01") {
    // sf0.01 is the smallest SF where the cap bites (308 of 1500
    // customers exceed DEGREE_CAP=40; at sf0.001 max degree is 10)
    val sf = "/root/testdata/sf0.01"
    val rows = Graph.xCommonNeighborsCapped.build(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq == (1L to 20L))
    // recount: customers kept iff degree <= cap; pair counts from scratch
    val edges = graft.core.Tables(spark, sf, "lineitem")
      .join(graft.core.Tables(spark, sf, "orders"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct()
      .as[(Long, Long)].collect()
    val kept = edges.groupBy(_._1).values
      .filter(_.length <= Graph.DEGREE_CAP)
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    kept.foreach { es =>
      val ss = es.map(_._2).sorted
      for (i <- ss.indices; j <- (i + 1) until ss.length)
        counts((ss(i), ss(j))) = counts.getOrElse((ss(i), ss(j)), 0L) + 1L
    }
    val want = counts.toSeq
      .map { case ((s1, s2), c) => (s1, s2, c) }
      .sortBy { case (s1, s2, c) => (-c, s1, s2) }
      .take(20)
      .zipWithIndex
      .map { case ((s1, s2, c), i) => (i + 1L, s1, s2, c) }
    assert(rows.toSeq == want)
    assert(kept.nonEmpty && kept.size < edges.groupBy(_._1).size,
      "cap must bite at this SF for the spec to be meaningful")
  }

  test("bm25: ranks are dense, scores non-increasing, and zero-tf docs score 0") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.llmops.TextStats.xBm25.build(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq == (1L to 20L))
    val scores = rows.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(s => s >= 0.0 && s.isFinite))
    // a doc containing none of the query terms must score exactly 0 and
    // can therefore never out-rank any doc with a hit
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables(spark, sf, "documents")
    val noHit = docs.filter(
      !col("text").contains(TextStats.BM25_QUERY(0)) &&
      !col("text").contains(TextStats.BM25_QUERY(1)) &&
      !col("text").contains(TextStats.BM25_QUERY(2)))
      .select("doc_id").as[Long].collect().toSet
    rows.filter(r => noHit(r._2)).foreach { case (_, id, s) =>
      assert(s == 0.0, s"zero-tf doc $id scored $s")
    }
  }

  // (the bm25 round-half boundary audit moved to RoundingMarginSpec's
  // table — row "bm25"; same raw values via TextStats.bm25Raw, same
  // half-boundary quantity, bar 1e-6 in 1e6-scaled units = the 1e-12
  // score-units bar this file used to assert.)
}
