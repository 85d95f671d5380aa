package graft

import org.apache.spark.sql.functions._

/** One-off probe: candidate-stream sizes for the two SimHash banding
  * schemes (4×12-bit exact-key vs 2×24-bit multiprobe) and the
  * delta-vs-full join volumes behind x_mv_join_refresh — the numbers
  * recorded in docs/SCALING.md. Run: Test/runMain graft.MultiprobeProbe
  */
object MultiprobeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    for (sf <- Seq("0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val sketches = graft.llmops.SimHash.xSimhash.build(spark, dir).cache()
      sketches.count()

      val cand4 = {
        val bx = sketches.select(col("doc_id"), explode(array((0 until 4).map(
          b => struct(lit(b).as("band"),
            shiftright(col("simhash"), 12 * b).bitwiseAND(0xfff).as("bk"))): _*))
          .as("e")).select(col("doc_id"), col("e.band"), col("e.bk"))
        bx.as("x").join(bx.as("y"), Seq("band", "bk"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
      }
      val mask24 = (1L << 24) - 1
      val candMp = {
        val idx = sketches.select(col("doc_id"), explode(array((0 until 2).map(
          b => struct(lit(b).as("band"),
            shiftright(col("simhash"), 24 * b).bitwiseAND(mask24).as("bk"))): _*))
          .as("e")).select(col("doc_id"), col("e.band"), col("e.bk"))
        val prb = sketches.select(col("doc_id"), explode(array(
          (0 until 2).flatMap(b => (-1 until 24).map { j =>
            val key = shiftright(col("simhash"), 24 * b).bitwiseAND(mask24)
            struct(lit(b).as("band"),
              (if (j < 0) key else key.bitwiseXOR(lit(1L << j))).as("bk"))
          }): _*)).as("e")).select(col("doc_id"), col("e.band"), col("e.bk"))
        prb.as("x").join(idx.as("y"), Seq("band", "bk"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
      }
      sketches.unpersist()

      val o = graft.core.Tables(spark, dir, "orders").select(col("o_orderkey"))
      val l = graft.core.Tables(spark, dir, "lineitem").select(col("l_orderkey"))
      def j(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame): Long =
        a.join(b, col("o_orderkey") === col("l_orderkey")).count()
      val full = j(o, l)
      val d1 = j(o.filter(col("o_orderkey") % 4 === 0),
        l.filter(col("l_orderkey") % 3 =!= 0))
      val d2 = j(o.filter(col("o_orderkey") % 4 =!= 0),
        l.filter(col("l_orderkey") % 3 === 0))
      val d3 = j(o.filter(col("o_orderkey") % 4 === 0),
        l.filter(col("l_orderkey") % 3 === 0))

      println(s"PROBE sf=$sf cand4band=$cand4 candMultiprobe=$candMp " +
        s"ivmFull=$full ivmDelta=${d1 + d2 + d3}")
    }
  }
}
