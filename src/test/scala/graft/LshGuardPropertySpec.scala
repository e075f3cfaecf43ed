package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LshGuard

/** The [[LshGuard]] recall contract as a property, not an example: for
  * ANY band table and cap, pruning loses a candidate pair iff EVERY
  * bucket the pair shares is hot — sparse-corpus pairs (some shared
  * bucket under the cap) always survive. Checked against brute-force
  * recomputation on random tables; fixed seeds so failures reproduce
  * (the MonoidLawsSpec discipline).
  */
class LshGuardPropertySpec extends AnyFunSuite with SparkSpec {

  private case class Case(rows: Seq[(Long, Int, String)], cap: Int)

  private val caseGen: Gen[Case] = for {
    nDocs <- Gen.choose(2, 25)
    nBands <- Gen.choose(1, 4)
    vals <- Gen.choose(1, 3) // few distinct values → real collisions
    cells <- Gen.listOfN(nDocs * nBands, Gen.choose(0, vals - 1))
    cap <- Gen.choose(1, 6)
  } yield Case(
    for { d <- 0 until nDocs; b <- 0 until nBands }
      yield (d.toLong, b, s"v${cells(d * nBands + b)}"),
    cap)

  private def samples(n: Int): Seq[Case] =
    (0 until n).flatMap(i => caseGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: a pair is pruned iff every shared bucket is hot (12 seeded cases)") {
    val s = spark
    import s.implicits._
    for (c <- samples(12)) {
      val bands = c.rows.toDF("id", "band", "bv")
      // brute force: bucket → distinct member ids, driver-side
      val byBucket: Map[(Int, String), Seq[Long]] = c.rows
        .groupBy(r => (r._2, r._3))
        .map { case (k, rs) => k -> rs.map(_._1).distinct }
      // .iterator first: Map#collect yielding the KEY (a pair) would
      // rebuild a Map and collapse buckets that share a band
      val hot = byBucket.iterator
        .collect { case (k, ids) if ids.size > c.cap => k }.toSet
      def pairs(buckets: Iterable[Seq[Long]]): Set[(Long, Long)] =
        buckets.flatMap(ids =>
          for (a <- ids; b <- ids if a < b) yield (a, b)).toSet
      val all = pairs(byBucket.values)
      val wantKept = pairs(byBucket.collect { case (k, ids) if !hot(k) => ids })

      val pruned = LshGuard.pruneSelf(bands, c.cap)
      val got = pruned.as("a").join(pruned.as("b"),
          $"a.band" === $"b.band" && $"a.bv" === $"b.bv" && $"a.id" < $"b.id")
        .select($"a.id", $"b.id").as[(Long, Long)].collect().toSet

      assert(got === wantKept, s"cap=${c.cap} rows=${c.rows}")
      // contract restated both ways: every LOST pair had all its
      // shared buckets hot; every KEPT pair had a cold shared bucket
      val sharedBuckets = (p: (Long, Long)) => byBucket.iterator.collect {
        case (k, ids) if ids.contains(p._1) && ids.contains(p._2) => k
      }.toSet
      val lost = all -- got
      assert(lost.forall(p => sharedBuckets(p).forall(hot)))
      assert(got.forall(p => sharedBuckets(p).exists(b => !hot(b))))
    }
  }
}
