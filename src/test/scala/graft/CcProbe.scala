package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (Test/runMain graft.CcProbe): break x_dedup_families into
  * stages (LSH pair generation vs connected-components loop vs final
  * join) at sf0.1 to see where the seconds go.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CC $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm up whole pipeline once
    time("warmup full")(llmops.DedupFamilies.xFamilies.build(spark, dir).count())
    val docs = graft.core.Tables(spark, dir, "documents")
    val sh = llmops.Shingles.wordShingles(docs, 3, distinct = false)
    val sets = llmops.MinHashLSH.hashSets(sh).cache()
    val pairs = time("pairs (LSH+verify)") {
      val cand = llmops.MinHashLSH.candidates(
        llmops.MinHashLSH.bandKeys(llmops.MinHashLSH.signaturesFromSets(sets)))
      val p = llmops.MinHashLSH.exactJaccardFromSets(cand, sets)
        .filter(col("jaccard") >= llmops.MinHashLSH.TAU)
        .select(col("a_id"), col("b_id")).cache()
      p.count(); p
    }
    time("components x3") {
      (1 to 3).foreach(_ => llmops.DedupFamilies.components(pairs).count())
    }
    time("full query x2") {
      (1 to 2).foreach(_ => llmops.DedupFamilies.xFamilies.build(spark, dir).count())
    }
    spark.stop()
  }
}
