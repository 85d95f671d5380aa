package graft

/** Dev probe: measured per-probe recall of the persisted+incremental
  * IVF-PQ search at each SF (numbers cited in the IVFPQ_INCR_RECALL_BAR
  * scaladoc and docs/SCALING.md).
  */
object IncrProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val r = llmops.VectorSearch
        .ivfpqIncrementalRecall(spark, s"/root/testdata/$sf")
        .collect()
      println(s"INCR $sf " + r.map(x =>
        s"${x.getLong(0)}:${x.getDouble(1)}").mkString(" "))
    }
    spark.stop()
  }
}
