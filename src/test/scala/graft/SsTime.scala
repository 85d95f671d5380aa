package graft
import org.apache.spark.sql.functions._
import graft.llmops.{MinHashLSH, SetSim}

/** Scratch stage breakdown: which setsim stage grows superlinearly from
  * k=5 to k=10 on the replicated corpus (ScaleProbe's SCALE-SETSIM).
  */
object SsTime {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val base = graft.core.Tables(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text")).cache()
    base.count()
    def corpus(k: Int) = (0 until k).map { i =>
      base.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        expr(s"array_join(transform(split(text, ' '), w -> concat('r$i', w)), ' ')")
          .as("text"))
    }.reduce(_ union _)
    def time(label: String)(f: => Long): Unit = {
      val l0 = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      val t0 = System.nanoTime()
      val n = f
      println(f"SS $label ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows, load@start $l0)")
    }
    for (k <- Seq(5, 10); rep <- 1 to 2) {
      val sets = MinHashLSH.wordSets(corpus(k), 3).cache()
      time(f"k=$k%2d rep$rep sets   ")(sets.count())
      val el = sets.select(col("doc_id"), explode(col("hs")).as("h")).cache()
      time(f"k=$k%2d rep$rep el     ")(el.count())
      val df = el.groupBy("h").agg(count(lit(1)).as("df"))
      time(f"k=$k%2d rep$rep df     ")(df.count())
      val pre = el.join(df, "h")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ot"))
        .select(col("doc_id"),
          explode(expr("""slice(transform(ot, x -> x.h), 1,
                   size(ot) - ((3 * size(ot) + 4) div 5) + 1)""")).as("h"))
        .cache()
      time(f"k=$k%2d rep$rep pre    ")(pre.count())
      val cand = pre.as("a").join(pre.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct().cache()
      time(f"k=$k%2d rep$rep cand   ")(cand.count())
      time(f"k=$k%2d rep$rep full   ")(SetSim.similarPairs(sets, 3, 5).count())
      Seq(sets, el, pre, cand).foreach(_.unpersist())
    }
    spark.stop()
  }
}
