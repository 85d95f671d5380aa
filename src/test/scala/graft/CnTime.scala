package graft
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}

/** Scratch A/B: common-neighbors spellings at sf0.1.
  *   join      — distinct + self-join (round-7 shipped shape)
  *   repart    — repartition(c) first: dedupe + self-join satisfy
  *               clustering with zero further exchanges (subset rule)
  *   intersect — supplier→sorted-customer-array table (|S| rows),
  *               broadcast self-join s1<s2, merge-scan intersection
  *               count per pair: replaces the |pairs|-row agg shuffle
  *               with |S|²/2 codegen'd array intersections
  *   capped    — repart shape behind a degree-≤K filter (window count
  *               over the same clustering, zero extra exchanges)
  * Plus stage splits for the shipped shape.
  */
object CnTime {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val dir = "/root/testdata/sf0.1"
    graft.core.Tables.names.foreach { t =>
      try T(spark, dir, t).count() catch { case _: Throwable => }
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"CN $label ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    def edges() = {
      val li = T(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val o = T(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
    }
    def top20(pairs: org.apache.spark.sql.DataFrame): Long =
      pairs.orderBy(col("common").desc, col("s1"), col("s2")).limit(20).count()
    def joinShape(): Long = {
      val e = edges().distinct()
      top20(e.as("a").join(e.as("b"),
          col("a.c") === col("b.c") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
        .agg(count(lit(1)).as("common")))
    }
    def repartShape(): Long = {
      val e = edges().repartition(col("c")).dropDuplicates("c", "s")
      top20(e.as("a").join(e.as("b"),
          col("a.c") === col("b.c") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
        .agg(count(lit(1)).as("common")))
    }
    def intersectShape(): Long = {
      val sc = edges().repartition(col("s")).dropDuplicates("c", "s")
        .groupBy(col("s"))
        .agg(sort_array(collect_list(col("c"))).as("cs"))
      top20(sc.as("a").join(broadcast(sc.as("b")), col("a.s") < col("b.s"))
        .select(col("a.s").as("s1"), col("b.s").as("s2"),
          graft.functions.ArrayOps.sortedIntersectCount(col("a.cs"), col("b.cs"))
            .cast("long").as("common"))
        .filter(col("common") > 0))
    }
    def cappedShape(k: Int): Long = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("c"))
      val e = edges().repartition(col("c")).dropDuplicates("c", "s")
        .withColumn("deg", count(lit(1)).over(w))
        .filter(col("deg") <= k).drop("deg")
      top20(e.as("a").join(e.as("b"),
          col("a.c") === col("b.c") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
        .agg(count(lit(1)).as("common")))
    }
    def packedAggShape(): Long = {
      val e = edges().repartition(col("c")).dropDuplicates("c", "s")
      val packed = e.as("a").join(e.as("b"),
          col("a.c") === col("b.c") && col("a.s") < col("b.s"))
        .select((shiftleft(col("a.s").cast("long"), 32) + col("b.s")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("common"))
      top20(packed.select(shiftright(col("p"), 32).as("s1"),
        (col("p").bitwiseAND(lit(0xffffffffL))).as("s2"), col("common")))
    }
    def pairsExprShape(np: Int = 0): Long = {
      val packed = (if (np > 0) edges().repartition(np, col("c"))
                    else edges().repartition(col("c")))
        .groupBy(col("c"))
        .agg(sort_array(collect_set(col("s").cast("long"))).as("ss"))
        .select(explode(graft.functions.ArrayOps.packedPairs(col("ss"))).as("p"))
        .groupBy("p").agg(count(lit(1)).as("common"))
      top20(packed.select(shiftright(col("p"), 32).as("s1"),
        (col("p").bitwiseAND(lit(0xffffffffL))).as("s2"), col("common")))
    }
    for (i <- 1 to 3) {
      time(s"join      rep$i")(joinShape())
      time(s"repart    rep$i")(repartShape())
      time(s"intersect rep$i")(intersectShape())
      time(s"capped40  rep$i")(cappedShape(40))
      time(s"packedagg rep$i")(packedAggShape())
      time(s"pairsexpr rep$i")(pairsExprShape())
      time(s"pairsex16 rep$i")(pairsExprShape(16))
      time(s"pairsex8  rep$i")(pairsExprShape(8))
    }
    // stage splits for the shipped shape
    val e = edges().distinct().cache()
    time("stage distinct    ")(e.count())
    val pairs = e.as("a").join(e.as("b"),
        col("a.c") === col("b.c") && col("a.s") < col("b.s"))
    time("stage pairs       ")(pairs.count())
    val agg = pairs.groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
      .agg(count(lit(1)).as("common"))
    time("stage agg         ")(agg.count())
    time("stage top20       ")(top20(agg))
    e.unpersist()
    spark.stop()
  }
}
