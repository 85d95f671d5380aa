package graft

import org.apache.spark.sql.functions._

/** Scratch: is the ADC estimate correlated with the exact dot at all? */
object PqDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val V = graft.llmops.VectorSearch
    val eRaw = V.embeddingsBase(spark, dir).select("vec_id", "n_emb")
    // PQ over coarse-quantizer RESIDUALS (the IVF-PQ layout pqRecall uses)
    val e = V.coarseResiduals(spark, dir, eRaw).select("vec_id", "n_emb")
    val cb = V.pqCodebooks(e, V.PQ_ITERS)
    val codes = V.assignCodes(V.subvectors(e), cb)
    val probes = V.subvectors(e.filter(col("vec_id") < 1))
      .select(col("vec_id").as("probe_id"), col("block"), col("sub"))
    val lut = probes.join(broadcast(cb), Seq("block"))
      .select(col("probe_id"), col("block"), col("cid"),
        V.dot(col("sub"), col("cent")).as("psim"))
    val adc = codes.join(broadcast(lut), Seq("block", "cid"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(sum(col("psim")).as("adc"), count(lit(1)).as("nblocks"))
    val exact = e.crossJoin(broadcast(e.filter(col("vec_id") < 1)
        .select(col("vec_id").as("probe_id"), col("n_emb").as("p_emb"))))
      .select(col("probe_id"), col("vec_id"),
        V.dot(col("n_emb"), col("p_emb")).as("ex"))
    val j = adc.join(exact, Seq("probe_id", "vec_id"))
      .orderBy(col("ex").desc)
      .select("vec_id", "nblocks", "adc", "ex")
      .as[(Long, Long, Double, Double)].collect()
    j.take(15).foreach { case (v, nb, a, x) =>
      println(f"vec $v%4d nblocks=$nb adc=$a%8.4f exact=$x%8.4f")
    }
    val errs = j.map { case (_, _, a, x) => math.abs(a - x) }
    println(f"mean|adc-exact|=${errs.sum / errs.length}%.4f  max=${errs.max}%.4f")
    // quantization error per block: mean |sub - centroid|^2
    val recon = V.assignCodes(V.subvectors(e), cb)
      .join(V.subvectors(e), Seq("vec_id", "block"))
      .join(cb, Seq("block", "cid"))
      .select(expr(
        "aggregate(zip_with(sub, cent, (a, b) -> (a - b) * (a - b)), 0D, (s, x) -> s + x)").as("e2"))
      .agg(avg("e2")).as[Double].head()
    println(f"mean per-block quantization |s-c|^2 = $recon%.5f")
    spark.stop()
  }
}
