package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.{MinHashLSH, Shingles}

/** Dev probe (Test/runMain graft.ScaleProbe): measure the near-dup LSH
  * pipeline's growth on K×-replicated corpora. Replicas get every word
  * prefixed with a replica tag, so cross-replica Jaccard is 0 and the
  * true-pair density stays constant — the corpus grows, the answer set
  * grows proportionally, and a linear data path should show ~linear time
  * (vs the oracle's brute-force pair join growing quadratically).
  * Results are recorded in docs/SCALING.md.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.core.Tables(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text")).cache()
    val baseN = base.count()

    def corpus(k: Int) = (0 until k).map { i =>
      base.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        expr(s"array_join(transform(split(text, ' '), w -> concat('r$i', w)), ' ')")
          .as("text"))
    }.reduce(_ union _)

    def timeNearDup(k: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val sh = Shingles.wordShingles(corpus(k), 3, distinct = false)
      val sets = MinHashLSH.hashSets(sh).cache()
      val cand = MinHashLSH.candidates(
        MinHashLSH.bandKeys(MinHashLSH.signaturesFromSets(sets, 32), 8, 4))
      val pairs = MinHashLSH.exactJaccardFromSets(cand, sets)
        .filter(col("jaccard") >= MinHashLSH.TAU).count()
      sets.unpersist()
      (pairs, (System.nanoTime() - t0) / 1e9)
    }

    timeNearDup(1) // warm codegen + shuffle machinery before measuring
    Seq(1, 2, 5, 10).foreach { k =>
      val (pairs, sec) = timeNearDup(k)
      println(f"SCALE k=$k%2d docs=${baseN * k}%6d pairs=$pairs%5d sec=$sec%7.2f")
    }
    spark.stop()
  }
}
