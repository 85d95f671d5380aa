package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-13 maintenance ops: join-view IVM and incremental statistics. */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val SF = "/root/testdata/sf0.001"

  test("mv refresh: delta joins touch a sliver of the full join") {
    val o = graft.core.Tables(spark, SF, "orders")
      .select(col("o_orderkey"))
    val l = graft.core.Tables(spark, SF, "lineitem")
      .select(col("l_orderkey"))
    def j(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Long =
      a.join(b, col("o_orderkey") === col("l_orderkey")).count()
    val full = j(o, l)
    val deltaWork =
      j(o.filter(col("o_orderkey") % 4 === 0), l.filter(col("l_orderkey") % 3 =!= 0)) +
      j(o.filter(col("o_orderkey") % 4 =!= 0), l.filter(col("l_orderkey") % 3 === 0)) +
      j(o.filter(col("o_orderkey") % 4 === 0), l.filter(col("l_orderkey") % 3 === 0))
    assert(deltaWork < full,
      s"delta joins ($deltaWork rows) must underrun the full join ($full)")
    // and the refresh result is the full recompute (also oracle-gated)
    val got = graft.pipeline.ViewMaintenance.xMvJoinRefresh.build(spark, SF)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.core.Tables(spark, SF, "orders")
      .join(graft.core.Tables(spark, SF, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("mv refresh: dropping the ΔO⋈ΔL cross term is DETECTED by the yardstick") {
    // the term hand-rolled pipelines forget: orders ≡0 (mod 4) whose
    // lineitems are ≡0 (mod 3). It must be non-empty here, else the
    // test above can't distinguish a broken refresh.
    val o = graft.core.Tables(spark, SF, "orders")
      .filter(col("o_orderkey") % 4 === 0).select(col("o_orderkey"))
    val l = graft.core.Tables(spark, SF, "lineitem")
      .filter(col("l_orderkey") % 3 === 0).select(col("l_orderkey"))
    assert(o.join(l, col("o_orderkey") === col("l_orderkey")).count() > 0)
  }

  test("incremental stats: merged accumulator equals from-scratch after every append") {
    import StatsMaintenance._
    val orders = graft.core.Tables(spark, SF, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // prefix after append i = keys with mod-3 class ≤ i
    for (i <- 0 until 3) {
      val prefix = orders.filter(col("o_orderkey") % 3 <= i)
      val scratch = batchStats(prefix).collect().head
      // merge the batch stats incrementally in the driver
      val merged = (0 to i).map(j =>
          batchStats(orders.filter(col("o_orderkey") % 3 === j)).collect().head)
        .reduce { (a, b) =>
          org.apache.spark.sql.Row(
            a.getLong(0) + b.getLong(0), a.getLong(1) + b.getLong(1),
            math.min(a.getLong(2), b.getLong(2)),
            math.max(a.getLong(3), b.getLong(3)),
            math.min(a.getDouble(4), b.getDouble(4)),
            math.max(a.getDouble(5), b.getDouble(5)),
            a.getDecimal(6).add(b.getDecimal(6)))
        }
      assert(merged == scratch, s"stats diverged at append $i")
      // KMV min-k associativity: union-of-sketches top-k == scratch top-k
      val scratchSketch = batchSketch(prefix).collect().map(_.getLong(0)).toSeq
      val mergedSketch = (0 to i)
        .flatMap(j => batchSketch(orders.filter(col("o_orderkey") % 3 === j))
          .collect().map(_.getLong(0)))
        .distinct.sorted.take(K)
      assert(mergedSketch == scratchSketch, s"sketch diverged at append $i")
    }
  }

  test("incremental stats: NDV takes the exact path under K and the estimator above") {
    // sf0.001 custkey NDV sits under K=256 → the graded value is exact
    val row = StatsMaintenance.xIncrementalStats.build(spark, SF)
      .collect().head
    val exact = graft.core.Tables(spark, SF, "orders")
      .select(col("o_custkey")).distinct().count()
    if (exact < StatsMaintenance.K)
      assert(row.getAs[Long]("ck_ndv_est") == exact)
    else { // estimator path: within 15% of truth (KMV k=256 ⇒ σ≈6%)
      val est = row.getAs[Long]("ck_ndv_est").toDouble
      assert(math.abs(est - exact) / exact < 0.15)
    }
  }
}
