package graft
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}

/** Scratch A/B: common-neighbors spellings at sf0.1.
  *   join    — distinct + self-join (shipped round-7 shape)
  *   repart  — repartition(c) first: dedupe + self-join then satisfy
  *             clustering with zero further exchanges (subset rule)
  *   explode — groupBy+posexplode (measured slower: slice() copies)
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
    for (i <- 1 to 3) {
      time(s"join   rep$i")(joinShape())
      time(s"repart rep$i")(repartShape())
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
