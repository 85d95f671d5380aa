package graft.llmops

import org.apache.spark.sql.functions._

/** FANN sweep: filtered-ANN recall surface over (nprobe, k′, strategy)
  * at each SF — the measurement behind x_filtered_ann's FANN_NPROBE /
  * FANN_OVERFETCH choices and the SCALING.md pre-vs-post table.
  * Run: `Test/runMain graft.llmops.FannProbe` (optionally
  * SPARK_GRAFT_FANN_SF to restrict).
  */
object FannProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val sfs = sys.env.get("SPARK_GRAFT_FANN_SF")
      .map(Seq(_)).getOrElse(Seq("sf0.001", "sf0.01", "sf0.1"))
    import graft.llmops.VectorSearch._
    for (sf <- sfs) {
      val dir = s"/root/testdata/$sf"
      val e = embeddingsBase(spark, dir).select("vec_id", "label", "n_emb")
      val nCodes = ivfpqScannedCodes(spark, dir, 6).count()
      val nCodesF = filteredScannedCodes(spark, dir, 6).count()
      println(s"FANN $sf scanned codes at nprobe=6: unfiltered=$nCodes " +
        s"prefiltered=$nCodesF (ratio ${"%.3f".format(nCodesF.toDouble / nCodes)})")
      for (np <- Seq(6, 10, 12, 16)) {
        val pre = filteredRecallStats(e,
          fannShortlist(spark, dir, np, PQ_SHORTLIST, prefiltered = true),
          "prefilter").collect()
          .map(r => (r.getLong(2), r.getLong(3)))
        val worst = pre.map { case (h, k) => h.toDouble / math.max(k, 1L) }.min
        println(s"FANN $sf prefilter nprobe=$np k'=$PQ_SHORTLIST " +
          s"hits=${pre.map(_._1).mkString(",")} k_true=${pre.map(_._2).mkString(",")} " +
          s"worst=${"%.2f".format(worst)}")
      }
      for (np <- Seq(6, 12, 16); kp <- Seq(64, 128, 256)) {
        val post = filteredRecallStats(e,
          fannShortlist(spark, dir, np, kp, prefiltered = false),
          "postfilter").collect()
          .map(r => (r.getLong(2), r.getLong(3)))
        val worst = post.map { case (h, k) => h.toDouble / math.max(k, 1L) }.min
        println(s"FANN $sf postfilter nprobe=$np k'=$kp " +
          s"hits=${post.map(_._1).mkString(",")} k_true=${post.map(_._2).mkString(",")} " +
          s"worst=${"%.2f".format(worst)}")
      }
    }
    spark.stop()
  }
}
