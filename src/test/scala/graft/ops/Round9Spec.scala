package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-9 additions beyond the per-operator specs. */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("IVF-PQ: composed search clears the recall bar; code scan is the probed fraction") {
    val V = graft.llmops.VectorSearch
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rec = V.ivfpqRecall(spark, dir, V.IVFPQ_NPROBE)
        .as[(Long, Double, Boolean)].collect()
      info(s"$dir IVF-PQ recalls: ${rec.map(r => s"${r._1}:${r._2}").mkString(" ")}")
      assert(rec.length == 5)
      assert(rec.forall(_._3),
        s"$dir: probes below bar: ${rec.filterNot(_._3).mkString(",")}")

      // the IVF-PQ claim itself: the ADC stage reads ~nprobe/nlists of
      // the code table per probe, not all of it (measured 0.363-0.388 vs
      // ideal 0.375 across SFs — IvfPqProbe; generous slack here so an
      // unlucky quantizer re-train can't flake the suite)
      val total = V.pqIndex(spark, dir)._2.count()
      val scanned = V.ivfpqScannedCodes(spark, dir, V.IVFPQ_NPROBE).count()
      val frac = scanned.toDouble / (total * 5)
      val ideal = V.IVFPQ_NPROBE.toDouble / V.ANN_K
      info(f"$dir scanned-code fraction $frac%.3f (ideal $ideal%.3f)")
      assert(frac < 0.6, s"$dir: prune not engaged — scanning $frac of codes")
      assert(frac > 0.05, s"$dir: scan fraction implausibly low ($frac)")
    }
  }
}
