package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (Test/runMain graft.IvfPqProbe): composed IVF-PQ recall@10
  * per probe across nprobe settings and SFs, plus the scanned-code
  * fraction (scanned code rows / full code table) — the two numbers the
  * x_ivfpq_search contract quotes. Run before trusting the hash-checked
  * recall bar.
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val total = llmops.VectorSearch.pqIndex(spark, dir)._2.count()
      for (np <- Seq(2, 4, 6, 8)) {
        val rows = llmops.VectorSearch.ivfpqRecall(spark, dir, np).collect()
        val scanned = llmops.VectorSearch
          .ivfpqScannedCodes(spark, dir, np).count()
        // scanned counts probe-side fan-out (5 probes), the full table
        // doesn't — the per-probe fraction divides by the probe count
        val frac = scanned.toDouble / (total * 5)
        println(f"IVFPQ $sf nprobe=$np frac=$frac%.3f (ideal ${np / 16.0}%.3f): "
          + rows.map(r =>
            f"${r.getLong(0)}=${r.getDouble(1)}%.1f").mkString(" "))
      }
    }
    spark.stop()
  }
}
