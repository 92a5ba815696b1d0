package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scaling-pair validity rule that decides which measured
  * (lo, hi) pairs may headline BENCH.md's efficiency number. The rule
  * exists because the sandbox hypervisor's CPU quota drifts: round 6
  * measured a window with ALU-burn ratios of 1.76x–7.35x of the 4x ideal
  * and three super-linear "efficiencies" — every such pair must be
  * excluded, in both directions, or the headline is a quota artifact. */
class ScalingBenchSpec extends AnyFunSuite {

  private val ideal = 4.0 // the 2v8 protocol's cores ratio

  test("round-5 stable-window pairs are valid (eff 0.83–0.88, burns 3.82–4.26x)") {
    val pairs = Seq((0.85, 3.95), (0.88, 3.88), (0.83, 3.82), (0.84, 4.26))
    pairs.foreach { case (eff, cal) =>
      assert(ScalingBench.pairValid(eff, cal, ideal), s"eff=$eff cal=$cal should be valid")
    }
  }

  test("round-6 storm-window pairs are ALL invalid — super-linear or burn-flagged") {
    // (raw eff, adjacent ALU-burn ratio) as measured 2026-08-17
    val pairs = Seq((1.07, 1.76), (1.08, 7.14), (0.72, 7.35), (1.05, 3.14))
    pairs.foreach { case (eff, cal) =>
      assert(!ScalingBench.pairValid(eff, cal, ideal), s"eff=$eff cal=$cal should be invalid")
    }
  }

  test("super-linear raw efficiency is invalid even under a perfect burn ratio") {
    assert(!ScalingBench.pairValid(1.01, 4.0, ideal))
    assert(ScalingBench.pairValid(1.0, 4.0, ideal)) // exactly ideal is physical
  }

  test("burn-ratio band is ±20% of the ideal cores ratio") {
    assert(ScalingBench.pairValid(0.9, 0.8 * ideal, ideal))
    assert(ScalingBench.pairValid(0.9, 1.2 * ideal, ideal))
    assert(!ScalingBench.pairValid(0.9, 0.79 * ideal, ideal))
    assert(!ScalingBench.pairValid(0.9, 1.21 * ideal, ideal))
  }

  test("a sub-0.8 efficiency from a QUIET window is valid — the rule flags drift, not failure") {
    // validity and the >=0.8 target are separate judgments: a genuine
    // 0.72 in a stable window must NOT be silently excluded
    assert(ScalingBench.pairValid(0.72, 3.9, ideal))
  }
}
