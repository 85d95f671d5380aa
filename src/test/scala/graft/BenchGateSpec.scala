package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate is pure arithmetic — test the exact
  * boundaries that bit in rounds 2-3: sub-second noise must NOT flag,
  * a 3x creep on a 0.4 s query MUST (round-3's q19_union slipped under
  * the old absolute-only gate).
  */
class BenchGateSpec extends AnyFunSuite {

  test("big mover: >2x with >1s absolute slowdown flags") {
    assert(Bench.isRegression(cur = 3.4, prevT = 1.3))
  }

  test("steep mover: 3x slowdown on a 0.4s query flags despite <1s absolute") {
    assert(Bench.isRegression(cur = 0.4, prevT = 0.13))
    assert(Bench.isRegression(cur = 1.05, prevT = 0.36)) // round-3 q19_union
  }

  test("sub-floor noise is exempt: 3x on a 0.25s query does not flag") {
    assert(!Bench.isRegression(cur = 0.25, prevT = 0.08))
  }

  test("mild growth does not flag") {
    assert(!Bench.isRegression(cur = 2.0, prevT = 1.2)) // 1.67x
    assert(!Bench.isRegression(cur = 0.9, prevT = 0.45)) // 2x exactly, not >2.5x, <1s abs
  }

  test("crashed (-1) and missing (0) timings never flag") {
    assert(!Bench.isRegression(cur = -1.0, prevT = 1.0))
    assert(!Bench.isRegression(cur = 1.0, prevT = -1.0))
    assert(!Bench.isRegression(cur = 0.0, prevT = 0.0))
  }
}
