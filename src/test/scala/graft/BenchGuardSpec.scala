package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-noise tests of the bench sanity guards: both corrupted driver
  * artifacts (round 2's 2.259 "efficiency", round 3's local[32] leg below
  * local[16]) must be flagged; clean runs must not be. */
class BenchGuardSpec extends AnyFunSuite {

  test("efficiency guard flags burst-hit legs, passes clean ones") {
    // round-2 artifact: local[4] leg eaten by a co-tenant burst -> 2.259
    assert(BenchGuard.efficiencySuspect(2.259))
    // 4N leg eaten: efficiency collapses
    assert(BenchGuard.efficiencySuspect(0.31))
    // the three clean round-3 runs
    assert(!BenchGuard.efficiencySuspect(0.889))
    assert(!BenchGuard.efficiencySuspect(0.953))
    assert(!BenchGuard.efficiencySuspect(1.026))
  }

  test("monotone guard flags the round-3 driver artifact shape") {
    // BENCH_r03.json: local[4]=446k, local[16]=1.83M, local[32]=1.30M —
    // the headline leg below the 16-core leg is physically inverted
    assert(BenchGuard.monotoneSuspect(
      Seq((4, 446367.0), (16, 1831710.0), (32, 1301576.0))))
    // clean quiet-host shape: flat-ish SMT tail is fine, inversion is not
    assert(!BenchGuard.monotoneSuspect(
      Seq((4, 446367.0), (16, 1831710.0), (32, 2140000.0))))
    assert(!BenchGuard.monotoneSuspect(
      Seq((4, 500000.0), (16, 1900000.0), (32, 1900000.0))))
    // order of the input list must not matter
    assert(BenchGuard.monotoneSuspect(
      Seq((32, 1301576.0), (4, 446367.0), (16, 1831710.0))))
    // duplicate core counts (headline config == 4N) never flag
    assert(!BenchGuard.monotoneSuspect(
      Seq((4, 500000.0), (16, 1900000.0), (16, 1800000.0))))
  }

  test("ann_index build/query inversion guard flags the round-4 artifact") {
    // round-4 committed run: cold (build+query) 6.745 s, warm query
    // 7.451 s — the query leg exceeding the build leg is physically
    // impossible on a quiet host
    assert(BenchGuard.buildQueryInversionSuspect(6.745, 7.451))
    // quiet-host shape (run-20260819-020809): build 8.110, query 2.800
    assert(!BenchGuard.buildQueryInversionSuspect(8.110, 2.800))
    assert(!BenchGuard.buildQueryInversionSuspect(5.0, 5.0))
  }
}
