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

    // ---- exact nearest-neighbor: IVF radius-bound vs all-pairs ----
    // replicas get cyclically-rotated vectors: distinct clusters per
    // replica (norm-preserving), which is the clustered regime real
    // embedding corpora live in — pruning strength is the whole point.
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"),
        graft.functions.ArrayOps.l2normalize(col("embedding")).as("n_emb"))
      .cache()
    val embN = emb.count()

    // uniform mode: cyclic rotations stay near-orthogonal (uniform sphere);
    // clustered mode: replicas are tiny perturbations of the base vector
    // (tight 50-vector clusters — the near-dup corpus regime)
    def embCorpus(k: Int, clustered: Boolean) = (0 until k).map { i =>
      val shifted = s"concat(slice(n_emb, ${i % 63 + 1}, ${64 - i % 63}), slice(n_emb, 1, ${i % 63}))"
      val vec =
        if (i == 0) "n_emb"
        else if (clustered) s"zip_with(n_emb, $shifted, (a, b) -> 0.999*a + 0.001*b)"
        else shifted
      emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        graft.functions.ArrayOps.l2normalize(expr(vec)).as("n_emb"))
    }.reduce(_ union _).cache()

    def timeAllPairsNN(c: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val a = c.select(col("vec_id"), col("n_emb").as("a_emb"))
      val b = c.select(col("vec_id").as("nn_id"), col("n_emb").as("b_emb"))
      a.join(b, col("vec_id") =!= col("nn_id"))
        .select(col("vec_id"),
          org.apache.spark.sql.functions.struct(
            graft.functions.ArrayOps.dot(col("a_emb"), col("b_emb")).as("sim"),
            (-col("nn_id")).as("neg_id")).as("cand"))
        .groupBy(col("vec_id")).agg(max(col("cand")).as("best")).count()
      (System.nanoTime() - t0) / 1e9
    }

    def timeIvfNN(c: org.apache.spark.sql.DataFrame, lists: Int): Double = {
      val t0 = System.nanoTime()
      graft.llmops.VectorSearch.exactNearestNeighbor(c, lists).count()
      (System.nanoTime() - t0) / 1e9
    }

    for (clustered <- Seq(false, true); k <- Seq(10, 25, 50)) {
      val c = embCorpus(k, clustered)
      c.count() // materialize the corpus outside both timings
      val lists = math.max(16, math.sqrt((embN * k).toDouble).toInt) // ~√n lists
      val ivf = timeIvfNN(c, lists)
      val brute = timeAllPairsNN(c)
      val mode = if (clustered) "clustered" else "uniform"
      println(f"SCALE-NN $mode%-9s k=$k%2d vecs=${embN * k}%6d lists=$lists%3d ivf=$ivf%7.2f allpairs=$brute%7.2f")
      c.unpersist()
    }
    spark.stop()
  }
}
