package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchStats]] — the math that decides the recorded BENCH
  * artifact's headline number. The round-5 artifact recorded 75 s for
  * a 14.8 s engine because a median of 3 could not reject one
  * contended pass; these cases pin the round-6 rejection behavior.
  */
class BenchStatsSpec extends AnyFunSuite {

  test("median: lower median, -1 sentinel on empty") {
    assert(BenchStats.median(Nil) === -1.0)
    assert(BenchStats.median(Seq(2.0)) === 2.0)
    assert(BenchStats.median(Seq(3.0, 1.0)) === 1.0) // lower of two
    assert(BenchStats.median(Seq(3.0, 1.0, 2.0)) === 2.0)
  }

  test("trimmed: one contended pass out of five cannot touch the reported value") {
    // r5 failure mode: rep 3 of every query ran 10-40x slow
    val idle = Seq(0.35, 0.36, 0.34, 0.37, 0.35)
    val oneBad = Seq(0.35, 0.36, 11.8, 0.37, 0.35)
    assert(BenchStats.trimmed(oneBad) === BenchStats.trimmed(idle.sorted.take(4)))
    assert(BenchStats.trimmed(oneBad) < 0.37)
    // a plain median of 3 with the same outlier placement CAN be hit
    // twice (outlier + one more slot) — trimming 1 of 3 still saves it
    assert(BenchStats.trimmed(Seq(0.35, 11.8, 0.36)) === 0.35)
  }

  test("trimmed: never trims away every sample; empty is the -1 sentinel") {
    assert(BenchStats.trimmed(Seq(5.0)) === 5.0)
    assert(BenchStats.trimmed(Nil) === -1.0)
  }

  test("trimmed drops ceil(20%): exactly 1 of 5, 2 of 6..10") {
    // 5 samples: drop the single max
    assert(BenchStats.trimmed(Seq(1.0, 2.0, 3.0, 4.0, 100.0)) === 2.0)
    // 6 samples: ceil(1.2)=2 dropped, median of remaining 4 = lower mid
    assert(BenchStats.trimmed(Seq(1.0, 2.0, 3.0, 4.0, 99.0, 100.0)) === 2.0)
  }

  test("contention flag: >3x spread on the probe trips it, 3x does not") {
    assert(!BenchStats.contended(Seq(0.30, 0.90))) // exactly 3x
    assert(BenchStats.contended(Seq(0.30, 0.91)))
    assert(!BenchStats.contended(Seq(0.35, 0.36, 0.41)))
    // the r5 artifact's probe pattern would have been flagged
    assert(BenchStats.contended(Seq(0.35, 0.36, 11.8)))
  }

  test("maxMinRatio guards a zero min") {
    assert(BenchStats.maxMinRatio(Seq(0.0, 1.0)) === 1.0 / 1e-9)
  }
}
