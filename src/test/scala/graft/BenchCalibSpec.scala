package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench host-calibration microbenchmark (VERDICT r16 #1).
  *
  * The whole point of the calibration line is that its WORK is fixed —
  * two rounds' calib_cpu_ms are only comparable if both executed the
  * identical 2²⁷-step xorshift64* fold. The checksum proves it: any
  * change to the iteration count, the shift constants, or the fold
  * (including a JIT-"helpful" dead-code elimination of the loop) moves
  * the constant and fails this pin. 17f60f6d505fce59 was computed
  * independently (java.lang semantics, jshell) — not copied from the
  * engine's own output.
  */
class BenchCalibSpec extends AnyFunSuite {

  test("calibration fold is the pinned fixed-work constant, " +
      "deterministic across runs, and actually burns measurable CPU") {
    val (w1, c1, sum1) = Bench.calibrate()
    val (_, _, sum2) = Bench.calibrate()
    assert(java.lang.Long.toHexString(sum1) === "17f60f6d505fce59",
      "the fixed-work contract: 2^27 xorshift64* steps, independently " +
        s"computed constant; got ${java.lang.Long.toHexString(sum1)}")
    assert(sum1 === sum2, "identical work must fold identically")
    assert(Bench.CalibIters === (1L << 27))
    // sanity, not a perf assertion: the loop must take long enough to
    // measure (ms resolution) and thread-CPU accounting must be live —
    // a 0 ms calib line would normalize ratios with garbage
    assert(w1 > 0L, s"wall must be measurable: $w1 ms")
    assert(c1 > 0L, s"thread CPU must be measurable: $c1 ms")
  }
}
