package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (Test/runMain graft.ClusterProbe): measure x_embed_cluster's
  * raw gate quantities (nonempty clusters, max cluster share, cohesion
  * margin) at every SF, so the hash-gate bars carry documented slack
  * under the measured values (the RecallProbe discipline).
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llmops.VectorSearch._
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val e = embeddingsBase(spark, dir).select(col("vec_id"), col("n_emb"))
      // THE library spellings — the probe must measure exactly what the
      // query gates, so no private copy of the assignment idiom here
      val scored = scoreAgainstCentroids(e, sharedCentroids(spark, dir))
      val assigned = assignFromScored(scored)
      val row = assigned.groupBy(col("cid"))
        .agg(count(lit(1)).as("sz"), sum(col("own_sim")).as("ssim"))
        .agg(sum(col("sz")).as("n"), count(lit(1)).as("nonempty"),
          max(col("sz")).as("max_sz"),
          (sum(col("ssim")) / sum(col("sz"))).as("own_avg"))
        .crossJoin(broadcast(scored.agg(avg(col("sim")).as("all_avg"))))
        .first()
      val n = row.getLong(0)
      println(f"CLUSTER $sf%-7s n=$n%6d nonempty=${row.getLong(1)}%2d " +
        f"max_share=${row.getLong(2).toDouble / n}%.3f " +
        f"cohesion=${row.getDouble(3) - row.getDouble(4)}%.3f")
    }
    spark.stop()
  }
}
