package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: bitext dense-grid stage walls at replicated-lake scale —
  * separates the GRID (k² dot products) from the margin pipeline to
  * attribute the super-square k=5→k=10 step the round-15 decade series
  * measured. Env: SPARK_GRAFT_BT_DIR (lake dir).
  */
object BtK {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_BT_DIR", "/tmp/graft_decade/dec_k5")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"BTK $tag%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($dir)")
      r
    }
    import org.apache.spark.sql.functions._
    t("warm") { graft.llmops.VectorSearch.embeddingsBase(spark, dir).count() }
    t("grid1") { graft.llmops.Bitext.grid(spark, dir).count() }
    t("grid2") { graft.llmops.Bitext.grid(spark, dir).count() }
    t("full") { graft.llmops.Bitext.xBitextMine.build(spark, dir).count() }
    // no-sharing spelling: each consumer re-evaluates the dot grid (the
    // BNLJ dot scan is embarrassingly parallel) and the TopKByScore aggs
    // shuffle only <=K rows per group per partition — no full-grid
    // exchange anywhere
    t("noshare") {
      val g = graft.llmops.Bitext.grid(spark, dir)
      val topk = graft.functions.TopKByScore.topK(graft.llmops.Bitext.K)
      def knnSum(keyCol: String, idCol: String) =
        g.groupBy(col(keyCol))
          .agg(topk(col("cos_fix"), col(idCol)).as("kept"))
          .select(col(keyCol), expr(
            "aggregate(kept, 0L, (ac, x) -> ac + x.score)")
            .as(s"knn_$keyCol"))
      val fwd = knnSum("src_id", "tgt_id")
      val bwd = knnSum("tgt_id", "src_id")
      g.join(broadcast(fwd), "src_id").join(broadcast(bwd), "tgt_id")
        .select(col("src_id"),
          expr(s"(2 * ${graft.llmops.Bitext.K} * ${graft.llmops.Bitext.SCALE} * cos_fix) div (knn_src_id + knn_tgt_id)")
            .as("m"),
          (-col("tgt_id")).as("nt"))
        .groupBy(col("src_id"))
        .agg(graft.functions.ArgMax.argmaxLongPair(col("m"), col("nt"))
          .as("best"))
        .filter(col("best.m") >= graft.llmops.Bitext.MARGIN_TH)
        .count()
    }
    spark.stop()
  }
}
