package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does x_bitext_mine's wall go? */
object BtTime {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"BT $tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    t("warm") { graft.llmops.VectorSearch.embeddingsBase(spark, dir).count() }
    // control: same shape over synthetic 125k rows
    val ctrl = spark.range(125000).select(
      (col("id") % 500).as("src_id"), (col("id") % 250).as("tgt_id"),
      (col("id") * 7 % 1000000).as("cos_fix"))
    t("ctrl-ckpt") { ctrl.localCheckpoint() }
    t("ctrl-win") {
      ctrl.withColumn("rn", row_number().over(
          Window.partitionBy(col("src_id"))
            .orderBy(col("cos_fix").desc, col("tgt_id"))))
        .filter(col("rn") <= 4)
        .groupBy(col("src_id")).agg(sum(col("cos_fix"))).count()
    }
    val g = t("grid+ckpt") { graft.llmops.Bitext.grid(spark, dir).localCheckpoint() }
    t("grid2") { graft.llmops.Bitext.grid(spark, dir).count() }
    val fwd = t("fwd") {
      g.withColumn("rn", row_number().over(
          Window.partitionBy(col("src_id"))
            .orderBy(col("cos_fix").desc, col("tgt_id"))))
        .filter(col("rn") <= 4)
        .groupBy(col("src_id")).agg(sum(col("cos_fix")).as("knn_fwd"))
        .localCheckpoint()
    }
    val bwd = t("bwd") {
      g.withColumn("rn", row_number().over(
          Window.partitionBy(col("tgt_id"))
            .orderBy(col("cos_fix").desc, col("src_id"))))
        .filter(col("rn") <= 4)
        .groupBy(col("tgt_id")).agg(sum(col("cos_fix")).as("knn_bwd"))
        .localCheckpoint()
    }
    t("final") {
      g.join(broadcast(fwd), "src_id").join(broadcast(bwd), "tgt_id")
        .select(col("src_id"), col("tgt_id"),
          expr(s"(2 * 4 * 1000000 * cos_fix) div (knn_fwd + knn_bwd)").as("m"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("src_id")).orderBy(col("m").desc, col("tgt_id"))))
        .filter(col("rn") === 1).count()
    }
    t("full") { graft.llmops.Bitext.xBitextMine.build(spark, dir).count() }
    spark.stop()
  }
}
