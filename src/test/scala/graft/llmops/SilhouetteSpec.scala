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
}
