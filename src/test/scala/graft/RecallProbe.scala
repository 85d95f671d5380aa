package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (Test/runMain graft.RecallProbe): x_ann_ivf recall@10 per
  * probe across nprobe settings and SFs — run before trusting the
  * hash-checked recall bar.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); np <- Seq(2, 4, 6, 8)) {
      val rows = llmops.VectorSearch
        .ivfRecall(spark, s"/root/testdata/$sf", np).collect()
      println(s"RECALL $sf nprobe=$np: " + rows.map(r =>
        f"${r.getLong(0)}=${r.getDouble(1)}%.1f").mkString(" "))
    }
    spark.stop()
  }
}
