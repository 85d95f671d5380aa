package graft
import org.apache.spark.sql.functions._

object PrTime {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val dir = "/root/testdata/sf0.1"
    // warm the base like Bench does
    graft.llmops.VectorSearch.embeddingsBase(spark, dir).count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val e = graft.llmops.VectorSearch.embeddingsBase(spark, dir)
      .select(col("vec_id"), col("n_emb"))
    for (i <- 1 to 3) time(s"shared-quantizer rep$i") {
      SparkEntry.queries("x_embed_nn")(spark, dir).count()
    }
    for (i <- 1 to 3) time(s"private-1iter rep$i") {
      graft.llmops.VectorSearch.exactNearestNeighbor(e).count()
    }
    spark.stop()
  }
}
