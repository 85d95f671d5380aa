package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-13: in-flight observe() counters + the paired permutation test. */
class ObservePermSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val SF = "/root/testdata/sf0.001"

  test("observe metrics ride the write action and match a separate scan") {
    val row = Observe.xObserveMetrics.build(spark, SF).collect().head
    val want = graft.core.Tables(spark, SF, "events")
      .agg(count(lit(1)).as("n"),
        sum(when(get_json_object(col("props"), "$.k").cast("long") > 50, 1L)
          .otherwise(0L)).as("hi"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("tot"))
      .collect().head
    assert(row.getAs[Long]("n_rows") == want.getAs[Long]("n"))
    assert(row.getAs[Long]("n_hi_k") == want.getAs[Long]("hi"))
    assert(row.getAs[Long]("cents_total") == want.getAs[Long]("tot"))
    // and the counters describe exactly what landed on disk
    assert(row.getAs[Long]("rows_written") == row.getAs[Long]("n_rows"))
  }

  test("paired permutation: a null difference yields a high p-value") {
    // replicate the statistic driver-side with d deliberately ~symmetric
    // (hash-signed unit differences) and check that extreme stats are
    // common — i.e. the test does NOT reject under H0. This guards the
    // sign-flip spelling: a bug that flipped only one side would skew
    // the null distribution and drive p toward 0.
    import graft.llmops.Evals.PERM_K
    val n = 200
    def bit(s: String): Boolean =
      (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s).substring(0, 1),
        16) & 1L) == 1L
    val d = (0 until n).map(i => if (bit(s"null:$i")) 1L else -1L)
    val t = d.sum
    val stats = (0 until PERM_K).map { k =>
      d.zipWithIndex.map { case (di, i) =>
        if (bit(s"$i:$k")) di else -di }.sum
    }
    val extreme = stats.count(s => math.abs(s) >= math.abs(t))
    assert(extreme.toDouble / PERM_K > 0.2,
      s"null data must not look significant: t=$t extreme=$extreme")
  }

  test("paired permutation: graded row internals are consistent") {
    val row = graft.llmops.Evals.xPairedPermutation.build(spark, SF)
      .collect().head
    assert(row.getAs[Long]("n_perms") == graft.llmops.Evals.PERM_K.toLong)
    assert(row.getAs[Long]("n_extreme") >= 0 &&
      row.getAs[Long]("n_extreme") <= row.getAs[Long]("n_perms"))
    assert(row.getAs[Long]("p_ppm") ==
      1000000L * row.getAs[Long]("n_extreme") / row.getAs[Long]("n_perms"))
  }
}
