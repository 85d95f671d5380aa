package graft
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}

/** Scratch A/B: common-neighbors pair generation — groupBy+posexplode
  * (current) vs distinct+self-join (round-7 original) — interleaved in
  * one JVM so JIT/cache/load apply to both.
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
    def joinShape(): Long = {
      val li = T(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val o = T(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      e.as("a").join(e.as("b"),
          col("a.c") === col("b.c") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
        .agg(count(lit(1)).as("common"))
        .orderBy(col("common").desc, col("s1"), col("s2")).limit(20)
        .count()
    }
    def explodeShape(): Long =
      SparkEntry.queries("x_common_neighbors")(spark, dir).count()
    for (i <- 1 to 4) {
      time(s"join    rep$i")(joinShape())
      time(s"explode rep$i")(explodeShape())
    }
    spark.stop()
  }
}
