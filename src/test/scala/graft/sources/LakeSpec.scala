package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class LakeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("date-partitioned write produces hive dirs and prunes on read") {
    val out = Files.createTempDirectory("graft_part").toString + "/events"
    val events = graft.core.Tables(spark, sf, "events")
    Lake.writeDatePartitioned(events, "ts", out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("event_date=")))
    val pruned = spark.read.parquet(out).filter(col("event_date") === "2024-01-03")
    assert(pruned.count() > 0)
    // partition filter must appear as a partition filter, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }

  test("bucketed co-located join plans with no shuffle exchange") {
    val orders = graft.core.Tables(spark, sf, "orders")
    val customer = graft.core.Tables(spark, sf, "customer")
    Lake.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", 8)
    Lake.writeBucketed(customer.select("c_custkey", "c_name"),
      "customer_b", "c_custkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == orders.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("csv/json/orc round-trips preserve rows") {
    val nation = graft.core.Tables(spark, sf, "nation")
    val n = nation.count()
    Seq("csv", "json", "orc").foreach { fmt =>
      val out = Files.createTempDirectory(s"graft_$fmt").toString + "/nation"
      Lake.writeAs(nation, fmt, out)
      val back = Lake.readAs(spark, fmt, out, Some(nation.schema))
      assert(back.count() == n, s"$fmt round-trip lost rows")
      assert(back.schema.fieldNames.sameElements(nation.schema.fieldNames))
    }
  }
}
