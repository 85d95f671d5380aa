package graft.llmops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SilhouetteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("per-point silhouette matches a driver-side exact-rational recompute") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vecs = VectorSearch.embeddingsBase(spark, dir)
        .select("vec_id", "label", "n_emb")
        .as[(Long, Int, Seq[Double])].collect()
      def fix(a: Seq[Double], b: Seq[Double]): Long =
        math.round(1e6 * a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum)
      val out = Silhouette.xClusterSilhouette.build(spark, dir)
        .as[(Long, Int, Int, Long, Long, Long, Long, Long, Long, Long)]
        .collect()
      assert(out.length == vecs.length)
      out.foreach { case (id, lab, bLab, sa, na, sb, nb, num, den, silFix) =>
        val (_, trueLab, ei) = vecs.find(_._1 == id).get
        assert(lab == trueLab)
        val byGrp = vecs.filter(_._1 != id)
          .groupBy(_._2).view.mapValues { vs =>
            (vs.map(v => fix(ei, v._3)).sum, vs.length.toLong)
          }.toMap
        val (esa, ena) = byGrp(lab)
        assert((sa, na) == (esa, ena), s"$dir $id own-group sums")
        val (ebLab, (esb, enb)) = byGrp.removed(lab).toSeq
          .minBy { case (g, (s, n)) => (-(s.toDouble / n), g) }
        assert((bLab, sb, nb) == (ebLab, esb, enb), s"$dir $id b-group")
        val eNum = esa * enb - esb * ena
        val eDen = ena * enb * 1000000L - math.min(esa * enb, esb * ena)
        assert((num, den) == (eNum, eDen))
        val eFix = if (eNum < 0) -((1000000L * -eNum) / eDen)
                   else (1000000L * eNum) / eDen
        assert(silFix == eFix)
        assert(silFix >= -1000000L && silFix <= 1000000L)
      }
      // the honest finding: this fixture's labels have no geometric
      // cohesion (LabelPropSpec's 1-NN measurement), so the mean
      // silhouette must sit near zero — a strongly positive value here
      // would mean the fixture changed and the label-free notes are stale
      val mean = out.map(_._10).sum.toDouble / out.length
      assert(math.abs(mean) < 150000, s"$dir: mean silhouette $mean")
      info(f"$dir: mean sil ${mean / 1e6}%.4f, " +
        f"range ${out.map(_._10).min / 1e6}%.3f..${out.map(_._10).max / 1e6}%.3f")
    }
  }

  test("simplified (centroid) silhouette matches a driver-side integer " +
    "recompute of the quantized definition") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vecs = VectorSearch.embeddingsBase(spark, dir)
        .select("vec_id", "label", "emb")
        .as[(Long, Int, Seq[Double])].collect()
      val x = vecs.map { case (id, l, v) =>
        (id, l, v.map(c => math.round(1e6 * c)).toArray)
      }
      def sdiv(a: Long, n: Long): Long = if (a < 0) -((-a) / n) else a / n
      val cents = x.groupBy(_._2).view.mapValues { g =>
        val dim = g.head._3.length
        Array.tabulate(dim)(i => sdiv(g.map(_._3(i)).sum, g.length.toLong))
      }.toMap
      def cosFix(a: Array[Long], m: Array[Long]): Long = {
        val dxm = a.iterator.zip(m.iterator).map { case (p, q) => p * q }.sum
        val dxx = a.iterator.map(p => p * p).sum
        val dmm = m.iterator.map(p => p * p).sum
        math.round(1e6 * (dxm.toDouble /
          (math.sqrt(dxx.toDouble) * math.sqrt(dmm.toDouble))))
      }
      val out = Silhouette.xSilhouetteScaled.build(spark, dir)
        .as[(Long, Int, Int, Long, Long, Long, Long, Long)].collect()
      assert(out.length == vecs.length)
      out.foreach { case (id, lab, bLab, aFix, bFix, num, den, silFix) =>
        val (_, trueLab, xi) = x.find(_._1 == id).get
        assert(lab == trueLab)
        val eA = 1000000L - cosFix(xi, cents(lab))
        val (eBLab, eB) = cents.removed(lab).toSeq
          .map { case (g, m) => (g, 1000000L - cosFix(xi, m)) }
          .minBy { case (g, d) => (d, g) }
        assert((aFix, bLab, bFix) == (eA, eBLab, eB), s"$dir $id a/b")
        val eNum = eB - eA
        val eDen = math.max(eA, eB)
        val eFix = if (eNum < 0) -((1000000L * -eNum) / eDen)
                   else (1000000L * eNum) / eDen
        assert((num, den, silFix) == (eNum, eDen, eFix), s"$dir $id sil")
      }
      // same honest finding as the dense audit: geometrically arbitrary
      // labels → mean near zero
      val mean = out.map(_._8).sum.toDouble / out.length
      assert(math.abs(mean) < 150000, s"$dir: mean simplified sil $mean")
      info(f"$dir: mean simplified sil ${mean / 1e6}%.4f")
    }
  }
}
