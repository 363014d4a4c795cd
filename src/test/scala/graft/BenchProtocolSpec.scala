package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tests for the stall-proof measurement protocol in [[Bench.measure]],
  * driven by synthetic run/probe sequences (no Spark). The scenarios mirror
  * the host behavior VARIANCE_r8.md documents: multi-second whole-JVM pause
  * windows that can span several consecutive timed runs.
  */
class BenchProtocolSpec extends AnyFunSuite {

  private def seq[A](values: A*): () => A = {
    val it = Iterator(values: _*)
    () => it.next()
  }

  test("clean host: best of three runs, none flagged") {
    val m = Bench.measure(seq(0.30, 0.25, 0.28), () => true)
    assert(m == Bench.Measured(0.25, 3, stalled = false))
  }

  test("run poisoned by a stall window is discarded, clean retries win") {
    // probes: before r1 OK, after r1 STALLED → 9.7s discarded; r2 ran
    // after the window passed but its BEFORE-probe was the stalled one,
    // so it is conservatively discarded too; then three clean-bracketed
    // runs land. The recorded best must ignore every poisoned sample.
    val probes = seq(true, false, true, true, true, true)
    val runs = seq(9.7, 0.31, 0.27, 0.29, 0.28)
    val m = Bench.measure(runs, probes, wantClean = 3, maxAttempts = 6)
    assert(m == Bench.Measured(0.27, 3, stalled = false))
  }

  test("stall spanning every attempt: raw minimum, flagged stalled") {
    val runs = seq(9.7, 8.1, 12.3, 7.9, 8.8, 9.1)
    val m = Bench.measure(runs, () => false, wantClean = 3, maxAttempts = 6)
    assert(m.stalled && m.cleanRuns == 0)
    assert(m.best == 7.9) // best raw sample still recorded, just untrusted
  }

  test("a single clean-bracketed run is trusted over stalled neighbors") {
    // clean window opens for exactly one run then closes for the rest
    val probes = seq(true, true, false, false, false, false, false)
    val runs = seq(0.33, 6.2, 7.7, 8.4, 9.9, 5.5)
    val m = Bench.measure(runs, probes, wantClean = 3, maxAttempts = 6)
    assert(m == Bench.Measured(0.33, 1, stalled = false))
  }

  test("query error short-circuits to -1 without a stall flag") {
    val m = Bench.measure(seq(0.4, -1.0, 0.3), () => true)
    assert(m.best == -1.0 && !m.stalled)
  }

  test("attempts are bounded even when no run ever comes back clean") {
    var calls = 0
    val run = () => { calls += 1; 5.0 }
    Bench.measure(run, () => false, wantClean = 3, maxAttempts = 6)
    assert(calls == 6)
  }
}
