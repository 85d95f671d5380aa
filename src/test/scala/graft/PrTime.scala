package graft
object PrTime {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    for (q <- Seq("x_pagerank", "x_pmi_terms"); i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"$q rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
