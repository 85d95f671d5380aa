package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("two-iteration propagation matches a driver-side brute force") {
    for (dir <- dirs) {
      val vecs = VectorSearch.embeddingsBase(spark, dir)
        .select("vec_id", "label", "n_emb")
        .as[(Long, Int, Seq[Double])].collect().sortBy(_._1)
      val cut = (vecs.map(_._1).max + 1) / LabelProp.SEED_DEN
      def fix(a: Seq[Double], b: Seq[Double]): Long =
        math.round(1e6 * a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum)
      // kNN edges for every unlabeled node
      val knn = vecs.filter(_._1 >= cut).map { case (u, _, ue) =>
        u -> vecs.filter(_._1 != u)
          .map { case (v, _, ve) => (v, fix(ue, ve)) }
          .sortBy { case (v, s) => (-s, v) }
          .take(LabelProp.K_LP).map(_._1)
      }.toMap
      def vote(nb: Seq[Long], labels: Map[Long, Int]): Option[Int] = {
        val vs = nb.flatMap(labels.get)
        if (vs.isEmpty) None
        else Some(vs.groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (l, c) => (-c, l) }._1)
      }
      val l0 = vecs.filter(_._1 < cut).map(v => v._1 -> v._2).toMap
      val p1 = knn.flatMap { case (u, nb) => vote(nb, l0).map(u -> _) }
      val l1 = l0 ++ p1
      val p2 = knn.filterNot(kv => p1.contains(kv._1))
        .flatMap { case (u, nb) => vote(nb, l1).map(u -> _) }
      val out = LabelProp.xLabelProp.build(spark, dir)
        .as[(Long, Long, Long)].collect()
      assert(out.length == vecs.count(_._1 >= cut))
      out.foreach { case (id, pred, iter) =>
        (p1.get(id), p2.get(id)) match {
          case (Some(l), _) => assert(pred == l && iter == 1, s"$dir $id")
          case (None, Some(l)) => assert(pred == l && iter == 2, s"$dir $id")
          case (None, None) => assert(pred == -1 && iter == 0, s"$dir $id")
        }
      }
      // the second iteration must do real work (reach nodes the seed
      // can't) and the graph must leave SOME nodes unreached in 2 hops
      // at these K/seed settings — otherwise the query degenerates
      val iters = out.groupBy(_._3).view.mapValues(_.length).toMap
      assert(iters.getOrElse(1L, 0) > 0 && iters.getOrElse(2L, 0) > 0,
        s"$dir: iteration histogram $iters")
      // No accuracy gate: the synthetic embeddings' labels are
      // geometrically RANDOM (measured 1-NN label agreement 0.096 at
      // sf0.01, chance = 0.1), so held-out accuracy is definitionally
      // ~chance here. The algorithmic contract is pinned by the exact
      // brute-force match above; accuracy is reported for the record.
      val truth = vecs.map(v => v._1 -> v._2).toMap
      val reached = out.filter(_._3 > 0)
      val acc = reached.count(r => truth(r._1).toLong == r._2).toDouble /
        reached.length
      info(f"$dir: iters $iters, accuracy $acc%.3f (chance 0.1, " +
        f"label-free fixture) on ${reached.length} reached")
    }
  }

  test("confusion cells and class metrics are consistent with the predictions") {
    for (dir <- dirs) {
      val truth = VectorSearch.embeddingsBase(spark, dir)
        .select("vec_id", "label").as[(Long, Int)].collect().toMap
      val preds = LabelProp.xLabelProp.build(spark, dir)
        .as[(Long, Long, Long)].collect().filter(_._3 > 0)
      val cells = LabelProp.xConfusionMatrix.build(spark, dir)
        .as[(Long, Long, Long)].collect()
      assert(cells.map(_._3).sum == preds.length,
        "cells must partition the reached nodes")
      val expCells = preds.groupBy(p => (truth(p._1).toLong, p._2)).view
        .mapValues(_.length.toLong).toMap
      assert(cells.map(c => (c._1, c._2) -> c._3).toMap == expCells)
      val metrics = LabelProp.xClassMetrics.build(spark, dir)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      metrics.foreach { case (l, tp, fp, fn, p, r, f1) =>
        assert(tp == expCells.getOrElse((l, l), 0L))
        assert(fp == expCells.collect {
          case ((t, pr), n) if t != l && pr == l => n }.sum)
        assert(fn == expCells.collect {
          case ((t, pr), n) if t == l && pr != l => n }.sum)
        assert(p == (if (tp + fp == 0) 0L else 1000000L * tp / (tp + fp)))
        assert(r == (if (tp + fn == 0) 0L else 1000000L * tp / (tp + fn)))
        assert(f1 == (if (2 * tp + fp + fn == 0) 0L
                      else 2000000L * tp / (2 * tp + fp + fn)))
      }
      val diag = cells.filter(c => c._1 == c._2).map(_._3).sum
      info(s"$dir: ${cells.length} cells, trace $diag/${preds.length} " +
        s"(~chance on the label-free fixture), ${metrics.length} classes")
    }
  }
}
