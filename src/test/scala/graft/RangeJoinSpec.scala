package graft

import graft.operators.RangeJoin
import org.scalatest.funsuite.AnyFunSuite

/** Banded range join vs the naive keyed-join-then-filter reference,
  * over randomized inputs with bucket-boundary-adjacent times. */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  test("banded equals naive for [0, w] and [lo, hi] bands") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(10000).toLong))
    val right = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, 1000L + i, rnd.nextInt(10000).toLong))
    val lDf = left.toDF("k", "lid", "lt")
    val rDf = right.toDF("k", "rid", "rt")

    for ((lo, hi) <- Seq((0L, 300L), (50L, 444L), (0L, 1L))) {
      val banded = RangeJoin.banded(lDf, rDf, Seq("k"), "lt", "rt", lo, hi)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val naive = (for {
        (lk, lid, lt) <- left
        (rk, rid, rt) <- right
        if lk == rk && rt >= lt + lo && rt <= lt + hi
      } yield (lid, rid)).sorted
      assert(banded == naive, s"band [$lo,$hi]")
    }
  }

  test("exact bucket boundaries are included") {
    import spark.implicits._
    val lDf = Seq((1L, 1L, 100L)).toDF("k", "lid", "lt")
    // rt at exactly lt+lo and lt+hi must both match
    val rDf = Seq((1L, 10L, 130L), (1L, 11L, 200L), (1L, 12L, 201L), (1L, 13L, 129L))
      .toDF("k", "rid", "rt")
    val got = RangeJoin.banded(lDf, rDf, Seq("k"), "lt", "rt", 30L, 100L)
      .select("rid").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 11L))
  }
}
