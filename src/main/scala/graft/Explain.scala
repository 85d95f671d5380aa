package graft

/** Dev tool: dump formatted physical plans for selected queries (plan
  * hygiene review — pushdown reaching the scan, broadcast vs shuffle
  * joins, partial aggregation, TakeOrderedAndProject for top-k).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSet else Set(
      "q03_filter", "q05_tpch_q1", "q09_join_inner", "q10_join_multi",
      "q18_topk", "q34_vector_topk")
    val spark = Sessions.local()
    SparkEntry.registry.filter(q => names(q.name)).foreach { q =>
      println(s"\n========== ${q.name} ==========")
      q.build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
