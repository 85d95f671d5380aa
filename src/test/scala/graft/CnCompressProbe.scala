package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}

/** Scratch A/B (one conf per JVM run — spark.shuffle.compress is a
  * context-static conf): does lz4 shuffle compression cost the
  * common-neighbors pair exchange anything on a single node where the
  * "network" is tmpfs memcpy? SPARK_GRAFT_SHUFFLE_COMPRESS=false to
  * disable.
  */
object CnCompressProbe {
  def main(args: Array[String]): Unit = {
    val compress = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", compress)
      .config("spark.shuffle.spill.compress", compress)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.core.Tables.names.foreach { t =>
      try T(spark, dir, t).count() catch { case _: Throwable => }
    }
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val n = graft.llmops.Graph.xCommonNeighbors.build(spark, dir).count()
      println(f"CNC compress=$compress rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
