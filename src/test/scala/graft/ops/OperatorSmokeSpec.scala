package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}

/** t1 smoke over the whole declared inventory at sf0.001: every query
  * builds, runs, and returns sane output. (Value-level correctness is the
  * driver's DuckDB-oracle gate; see tools/check.py.)
  */
class OperatorSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // queries that can legitimately return zero rows at the smallest SF
  private val mayBeEmpty = Set("q12_anti_join", "q33_minhash_neardup")

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.build(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registry names are unique (a dup would silently drop a query)") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("no registry entry is null (object-init ordering hazard)") {
    assert(SparkEntry.registry.forall(_ != null))
  }
}
