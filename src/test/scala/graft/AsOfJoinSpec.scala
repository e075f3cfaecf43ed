package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin correctness vs a naive per-row reference implementation
  * over randomized inputs (fixed seed — deterministic CI). */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("leftAsOf matches the naive most-recent-match per left row") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i => (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 150).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .distinctBy(r => (r._1, r._2)) // unique per (key, time) as the contract requires
    val lDf = left.toDF("k", "lid", "lt")
    val rDf = right.toDF("k", "rt", "rid")

    val got = AsOfJoin.leftAsOf(lDf, rDf, Seq("k"), "lt", "rt")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap

    val naive = left.map { case (k, lid, lt) =>
      val best = right.filter(r => r._1 == k && r._2 <= lt).sortBy(_._2).lastOption
      lid -> best.map(_._3)
    }.toMap

    assert(got.size == naive.size)
    naive.foreach { case (lid, exp) =>
      assert(got(lid) == exp, s"left row $lid")
    }
  }

  test("leftAsOfWithin matches the naive tolerance semantics (no fallback to older)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(43)
    val left = (1 to 300).map(i => (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 150).map(i => (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .distinctBy(r => (r._1, r._2))
    val tol = 50L
    val got = AsOfJoin.leftAsOfWithin(
        left.toDF("k", "lid", "lt"), right.toDF("k", "rt", "rid"), Seq("k"),
        "lt", "rt", (l, r) => l - r <= tol)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    val naive = left.map { case (k, lid, lt) =>
      // the LATEST match is checked against the tolerance; an older
      // in-tolerance... cannot exist (older => farther), but the law
      // under test is: latest out-of-tolerance => null, not fallback
      val best = right.filter(r => r._1 == k && r._2 <= lt).sortBy(_._2).lastOption
      lid -> best.filter(lt - _._2 <= tol).map(_._3)
    }.toMap
    assert(got.size == naive.size)
    naive.foreach { case (lid, exp) => assert(got(lid) == exp, s"left row $lid") }
  }

  test("tie at equal timestamps matches (rightTime == leftTime included)") {
    import spark.implicits._
    val lDf = Seq((1L, 10L, 100L)).toDF("k", "lid", "lt")
    val rDf = Seq((1L, 100L, 7L), (1L, 99L, 6L)).toDF("k", "rt", "rid")
    val out = AsOfJoin.leftAsOf(lDf, rDf, Seq("k"), "lt", "rt")
      .select("rid").as[Long].collect()
    assert(out.toSeq == Seq(7L))
  }

  test("colliding payload columns are rejected") {
    import spark.implicits._
    val l = Seq((1L, 2L)).toDF("k", "x")
    val r = Seq((1L, 2L, 3L)).toDF("k", "x", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(l, r, Seq("k"), "x", "rt")
    }
    assert(e.getMessage.contains("colliding"))
  }
}
