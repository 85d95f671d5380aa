package graft

import org.apache.spark.sql.functions._

/** Dev probe: per-probe coarse-list csim rankings against the PERSISTED
  * centroids — the evidence behind IVFPQ_INCR_NPROBE = 10 (probe 3 at
  * sf0.01 keeps true neighbors in the list ranked 10th; see the nprobe
  * scaladoc in VectorSearch).
  */
object IncrDebug {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val V = llmops.VectorSearch
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val path = V.persistPqIndex(spark, dir)
      val (cents, _, _) = V.loadPqIndex(spark, path)
      val e = V.embeddingsBase(spark, dir).select(col("vec_id"), col("n_emb"))
      for (p <- 0 until 5) {
        val pv = e.filter(col("vec_id") === p).select("n_emb").head().getSeq[Double](0)
        val sims = cents.zipWithIndex.map { case (c, i) =>
          (i, c.zip(pv).map { case (a, b) => a * b }.sum) }
          .sortBy(-_._2)
        println(s"RANKS $dir probe=$p lists=" +
          sims.map(x => s"${x._1}:${"%.3f".format(x._2)}").mkString(" "))
      }
    }
    spark.stop()
  }
}
