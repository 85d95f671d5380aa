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

  // --- confirmation rep: a transient load spike must not reach the record ---

  test("transient 5x spike is dismissed by the confirmation rep") {
    // round-5 shape: prev 1.3 s, spiked sweep measured 6.5 s, but the
    // confirmation rep at normal load reverts to ~prev
    val (times, survived) = Bench.confirmRegressions(
      flagged = Seq("q_spiked"),
      times = Map("q_spiked" -> 6.5, "q_ok" -> 0.2),
      prev = Map("q_spiked" -> 1.3, "q_ok" -> 0.2),
      remeasure = _ => 1.35)
    assert(survived.isEmpty)
    assert(times("q_spiked") === 1.35) // record keeps the idle-load time
    assert(times("q_ok") === 0.2)     // unflagged queries untouched
  }

  test("a real regression survives the confirmation rep") {
    val (times, survived) = Bench.confirmRegressions(
      flagged = Seq("q_slow"),
      times = Map("q_slow" -> 6.5),
      prev = Map("q_slow" -> 1.3),
      remeasure = _ => 6.2) // reproduces: genuinely slower code
    assert(survived === Seq("q_slow"))
    assert(times("q_slow") === 6.2)
  }

  test("confirmation rep never replaces a time with a worse or crashed one") {
    val (times, survived) = Bench.confirmRegressions(
      flagged = Seq("q_a", "q_b"),
      times = Map("q_a" -> 3.4, "q_b" -> 3.4),
      prev = Map("q_a" -> 1.3, "q_b" -> 1.3),
      remeasure = n => if (n == "q_a") 9.9 else -1.0)
    assert(times("q_a") === 3.4) // worse rep ignored
    assert(times("q_b") === 3.4) // crashed rep ignored
    assert(survived === Seq("q_a", "q_b")) // both still flagged
  }

  // --- sweep deviation: mid-sweep contamination the entry/exit canary
  //     misses (round-16 verdict ask 2) ---

  private def mkRun(n: Int, sec: Int => Double): Seq[(String, Double)] =
    (0 until n).map(i => f"q$i%03d" -> sec(i))

  test("sweep deviation: clean sweep matches the clean band") {
    val ref = mkRun(100, _ => 0.5).toMap
    val cur = mkRun(100, i => 0.5 * (if (i % 2 == 0) 1.1 else 0.95))
    val Some((n, med, maxWin)) = Bench.sweepDeviation(cur, Seq(ref))
    assert(n === 100)
    assert(med < Bench.sweepBandMax && maxWin < Bench.sweepBandMax)
  }

  test("sweep deviation: a contiguous 2x block trips the windowed median") {
    // the run-85 shape: external load inflates one alphabetical block
    val ref = mkRun(100, _ => 0.5).toMap
    val cur = mkRun(100, i => if (i >= 20 && i < 65) 1.0 else 0.5)
    val Some((_, med, maxWin)) = Bench.sweepDeviation(cur, Seq(ref))
    assert(maxWin > Bench.sweepBandMax, s"window median $maxWin must flag")
    assert(med < Bench.sweepBandMax, "the global median alone misses it")
  }

  test("sweep deviation: scattered single-query regressions do not trip it") {
    val ref = mkRun(100, _ => 0.5).toMap
    val cur = mkRun(100, i => if (i % 10 == 0) 1.5 else 0.5)
    val Some((_, _, maxWin)) = Bench.sweepDeviation(cur, Seq(ref))
    assert(maxWin < Bench.sweepBandMax)
  }

  test("sweep deviation: sub-floor queries and crashes are not scored") {
    val ref = Map("q_a" -> 0.05, "q_b" -> 0.5, "q_c" -> 0.5)
    val cur = Seq("q_a" -> 0.14, "q_b" -> -1.0, "q_c" -> 0.5)
    val Some((n, _, _)) = Bench.sweepDeviation(cur, Seq(ref))
    assert(n === 1) // only q_c: q_a both sides <0.15, q_b crashed
  }

  test("sweep deviation: no clean reference runs -> None") {
    assert(Bench.sweepDeviation(mkRun(10, _ => 0.5), Seq.empty) === None)
  }
}
