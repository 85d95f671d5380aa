package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-13: Dawid–Skene fixed-point EM, replicated bit-for-bit. */
class DawidSkeneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val SF = "/root/testdata/sf0.001"
  private val S = DawidSkene.DS_S

  test("x_dawid_skene matches the driver-side fixed-point EM exactly") {
    import spark.implicits._
    val votes = graft.core.Tables(spark, SF, "documents")
      .select(col("doc_id"),
        when(col("n_chars") >= 300, 1L).otherwise(0L).as("v1"),
        when(size(split(col("text"), " ")) >= 55, 1L).otherwise(0L).as("v2"),
        when(expr(
            """cast(conv(substring(md5(concat('ds:', cast(doc_id as string))),
               1, 1), 16, 10) as bigint) % 4 = 0"""),
          lit(1L) - when(col("n_chars") >= 300, 1L).otherwise(0L))
          .otherwise(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("v3"))
      .as[(Long, Long, Long, Long)].collect().toSeq

    val n = votes.size.toLong
    var q = votes.map { case (_, a, b, c) => (a + b + c) * S / 3 }
    var ps = (0L, 0L, 0L)
    def mStep(): Unit = {
      def p(sel: ((Long, Long, Long, Long)) => Long): Long =
        votes.zip(q).map { case (v, qi) =>
          if (sel(v) == 1L) qi else S - qi }.sum / n
      ps = (p(_._2), p(_._3), p(_._4))
    }
    def eStep(): Unit = {
      q = votes.map { case (_, a, b, c) =>
        def w(v: Long, p: Long) = if (v == 1L) p else S - p
        def wn(v: Long, p: Long) = if (v == 1L) S - p else p
        val w1 = w(a, ps._1) * w(b, ps._2) * w(c, ps._3)
        val w0 = wn(a, ps._1) * wn(b, ps._2) * wn(c, ps._3)
        w1 / ((w1 + w0) / S)
      }
    }
    mStep(); eStep(); mStep(); eStep()
    val nPos = q.count(_ * 2 >= S).toLong
    val agree = votes.zip(q).count { case ((_, a, b, c), qi) =>
      (qi * 2 >= S) == (a + b + c >= 2) }.toLong

    val row = DawidSkene.xDawidSkene.build(spark, SF).collect().head
    assert(row.getAs[Long]("n_items") == n)
    assert(row.getAs[Long]("pa1_fix") == ps._1)
    assert(row.getAs[Long]("pa2_fix") == ps._2)
    assert(row.getAs[Long]("pa3_fix") == ps._3)
    assert(row.getAs[Long]("n_pos") == nPos)
    assert(row.getAs[Long]("n_majority_agree") == agree)
    // the planted reliability order is LEARNED, not assumed
    assert(ps._3 < ps._1 && row.getAs[Boolean]("noisy_discounted"))
    // and the learned accuracy of the 25%-flipped annotator sits near
    // 0.75 · pa1 + 0.25 · (1 − pa1) — the generative truth
    val expect3 = (3 * ps._1 + (S - ps._1)) / 4
    assert(math.abs(ps._3 - expect3) < S / 10,
      s"pa3=${ps._3} vs generative ${expect3}")
  }
}
