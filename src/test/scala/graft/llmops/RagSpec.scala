package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class RagSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("composition consistency at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // stage 1 agrees with the standalone fusion query's top-20
      val standalone = TextStats.xRrfFusion.build(spark, dir)
        .select(col("rank"), col("doc_id")).as[(Long, Long)].collect()
        .sortBy(_._1).map(_._2).toSeq
      val fused = Rag.fusedTop(spark, dir)
        .as[(Long, Long)].collect().sortBy(_._2).map(_._1).toSeq
      assert(fused == standalone.take(Rag.FUSE_TOP),
        s"$dir: fused top-20 diverges from x_rrf_fusion")

      val out = Rag.xRagPipeline.build(spark, dir)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(out.length == Rag.SEL)
      // provenance sanity: the funnel narrows — every selection came
      // through both prior stages
      out.foreach { case (step, doc, rRrf, rMax, _) =>
        assert(rRrf >= 1 && rRrf <= Rag.FUSE_TOP, s"$dir doc $doc r_rrf $rRrf")
        assert(rMax >= 1 && rMax <= Rag.RERANK_TOP, s"$dir doc $doc r_maxsim $rMax")
      }
      assert(out.map(_._2).distinct.length == Rag.SEL, s"$dir: dup selections")
      // step 1 is the MaxSim argmax (pure relevance before diversity)
      assert(out.head._4 == 1L, s"$dir: step 1 is not the rerank top-1")
      // probe 0 retrieves itself first (its own embedding is in-corpus)
      assert(out.head._2 == 0L, s"$dir: step 1 is ${out.head._2}, not the probe")
    }
  }
}
