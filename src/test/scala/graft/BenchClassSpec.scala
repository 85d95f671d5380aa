package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14: the bench artifact's query-class annotation must stay in
  * sync with the registry — a tag on a renamed/removed query silently
  * stops annotating the driver's flags.
  */
class BenchClassSpec extends AnyFunSuite {
  test("every store_rw class member is a registered query") {
    val registered = SparkEntry.queries.keySet
    val stale = Bench.storeRwClass -- registered
    assert(stale.isEmpty,
      s"storeRwClass names not in SparkEntry.queries: ${stale.mkString(", ")}")
  }

  test("class members are a strict subset (not everything is tagged)") {
    assert(Bench.storeRwClass.size < SparkEntry.queries.size / 2,
      "store_rw should tag the write-in-query minority, not the inventory")
  }

  test("canary queries are registered and their bands are sane") {
    Bench.canaryBands.foreach { case (name, bar) =>
      assert(SparkEntry.queries.contains(name),
        s"canary $name not in SparkEntry.queries — gate silently dead")
      assert(bar > 0 && bar < 2.0,
        s"canary band for $name ($bar s) outside the sub-second control range")
    }
    // the canary must stay CHEAP relative to the sweep: tiny fixed set
    assert(Bench.canaryBands.size <= 3)
  }
}
