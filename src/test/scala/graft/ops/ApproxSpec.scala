package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The approx half of the Q07 contract (SURVEY §2b): HLL++ estimates are
  * not hash-comparable across engines, but must sit within 5% of the
  * exact distinct counts.
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("approx_count_distinct within 5% of exact per group") {
    val li = graft.core.Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val both = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (flag, exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05, s"group $flag: approx=$approx exact=$exact err=$err")
    }
  }
}
