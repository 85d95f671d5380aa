package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-13: DP geometric release + equi-depth selectivity estimation. */
class DpSelectivitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val SF = "/root/testdata/sf0.001"

  test("dp release: mechanism identity and bounded draws") {
    val rows = Governance.xDpRelease.build(spark, SF).collect()
    rows.foreach { r =>
      val (t, g1, g2, noise, noisy) = (r.getAs[Long]("true_n"),
        r.getAs[Long]("g1"), r.getAs[Long]("g2"),
        r.getAs[Long]("noise"), r.getAs[Long]("noisy_n"))
      assert(g1 >= 0 && g1 <= 8 && g2 >= 0 && g2 <= 8)
      assert(noise == g1 - g2 && noisy == t + noise)
    }
  }

  test("dp release: the PRF-derived draws are Geom(1/2)-shaped") {
    // drive the exact released expression over 4096 synthetic keys and
    // check the empirical mass function: P(m) = 2^-(m+1), truncated
    val h = "cast(conv(substring(md5(concat('dp-release-v1:', " +
      "cast(id as string))), 1, 10), 16, 10) as bigint)"
    val m = spark.range(4096)
      .selectExpr(s"CAST(${Governance.trailingOnes(h)} AS BIGINT) AS m")
      .groupBy("m").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 4096.0
    assert(math.abs(m.getOrElse(0L, 0L) / n - 0.5) < 0.05, s"P(0): $m")
    assert(math.abs(m.getOrElse(1L, 0L) / n - 0.25) < 0.04, s"P(1): $m")
    assert(math.abs(m.getOrElse(2L, 0L) / n - 0.125) < 0.03, s"P(2): $m")
  }

  test("selectivity estimate: within the per-boundary-bucket error bound") {
    val r = graft.ops.Skew.xSelectivityEst.build(spark, SF).collect().head
    val (est, actual) = (r.getAs[Long]("est_rows"), r.getAs[Long]("actual_rows"))
    assert(actual > 0 && est > 0)
    // interpolation only errs inside the ≤2 boundary buckets, each of
    // size ~n/B — bound the absolute error by 2 bucket widths
    val n = graft.core.Tables(spark, SF, "orders").count()
    val bucket = n / graft.ops.Skew.SEL_BUCKETS + 1
    assert(math.abs(est - actual) <= 2 * bucket,
      s"est=$est actual=$actual bucket=$bucket")
  }
}
