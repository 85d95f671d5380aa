package graft
import org.apache.spark.sql.functions._

/** Scratch probe for the round-9 "bound-prune the exact common-neighbors
  * agg" idea (round-8 verdict item 4): before the global pair count, drop
  * pairs whose count provably can't reach the top-20 — upper bound
  * common(s1,s2) ≤ min(deg(s1), deg(s2)), threshold L = the capped
  * variant's 20th count (a lower bound on the exact 20th). Measures
  * whether the prune has anything to grab on THIS degree distribution:
  * the fraction of pair-stream rows with min-deg < L is the exact
  * fraction of the agg shuffle the filter could remove.
  */
object CnBound {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val dir = "/root/testdata/sf0.1"
    val li = graft.core.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = graft.core.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val e = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .repartition(col("c"))
      .dropDuplicates("c", "s")
      .cache()
    println(s"CN edges: ${e.count()}")

    // exact pair counts (the expensive thing — fine in a probe)
    val counts = e.as("a").join(e.as("b"),
        col("a.c") === col("b.c") && col("a.s") < col("b.s"))
      .select((shiftleft(col("a.s").cast("long"), 32) + col("b.s")).as("p"))
      .groupBy("p").agg(count(lit(1)).as("common"))
      .cache()
    val nPairsDistinct = counts.count()
    val nPairRows = counts.agg(sum("common")).first().getLong(0)
    val top = counts.orderBy(col("common").desc).limit(25)
      .select("common").collect().map(_.getLong(0))
    println(s"CN distinct pairs: $nPairsDistinct, pair rows: $nPairRows")
    println(s"CN exact top-25 counts: ${top.mkString(",")}")
    val t20 = top(19)

    // capped variant's 20th count = the cheap lower bound L
    val capped = graft.llmops.Graph.xCommonNeighborsCapped.build(spark, dir)
      .select("common").collect().map(_.getLong(0))
    val L = capped(19)
    println(s"CN capped top-20 counts: ${capped.mkString(",")}; L=$L, exact 20th=$t20")

    // supplier degree distribution + the prunable fraction of pair rows
    val deg = e.groupBy("s").agg(count(lit(1)).as("deg")).cache()
    deg.agg(min("deg"), expr("percentile(deg, 0.1)"), expr("percentile(deg, 0.5)"),
      max("deg"), count(lit(1))).show(false)
    val prunable = e.as("a").join(e.as("b"),
        col("a.c") === col("b.c") && col("a.s") < col("b.s"))
      .join(deg.select(col("s").as("a_s"), col("deg").as("da")),
        col("a.s") === col("a_s"))
      .join(deg.select(col("s").as("b_s"), col("deg").as("db")),
        col("b.s") === col("b_s"))
      .agg(sum(when(least(col("da"), col("db")) < L, 1L).otherwise(0L)).as("prun"),
        count(lit(1)).as("tot"))
      .first()
    println(s"CN prunable pair rows (min-deg < $L): ${prunable.getLong(0)} / ${prunable.getLong(1)}")
    spark.stop()
  }
}
