package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalNearDedup, LshGuard}

/** [[graft.operators.LshGuard]] — the hot-bucket cap on banded
  * candidate generation:
  *
  *  - unit: a 10⁴-wide bucket is pruned from both join sides, a
  *    normal-width bucket in the same frame is untouched;
  *  - adversarial end-to-end: a 10⁴-doc identical-boilerplate family
  *    (every band bucket 10⁴ wide — unguarded candidate join would
  *    emit ~4·10⁸ in-bucket rows) plus a planted near-dup pair runs
  *    through [[IncrementalNearDedup.survivors]] in fixture time, the
  *    planted pair still dedups, and the boilerplate family falls out
  *    of NEAR-dup scope per the documented recall contract (exact
  *    dedup's q40/q100 is the tool for byte-identical families —
  *    asserted here via the exact-dedup rule that WOULD catch them);
  *  - gate headroom: the fixture corpus produces no bucket anywhere
  *    near the default cap, so guarded and unguarded candidates are
  *    identical (the oracle gate re-proves this at sf0.01/sf0.1).
  */
class LshGuardSpec extends AnyFunSuite with SparkSpec {

  test("unit: buckets past the cap are pruned, others kept, both join sides") {
    val s = spark
    import s.implicits._
    val hotRows = (0 until 10000).map(i => (i.toLong, 0, "HOT"))
    val coldRows = (0 until 4).map(i => (100000L + i, 1, "cold"))
    val bands = (hotRows ++ coldRows).toDF("id", "band", "bv")
    val pruned = LshGuard.pruneSelf(bands, cap = 256)
    assert(pruned.select($"bv").distinct().as[String].collect().toSet === Set("cold"))
    assert(pruned.count() === 4)
    // cap must reject nonsense
    intercept[IllegalArgumentException](LshGuard.hotBuckets(bands, 0))
  }

  test("unit: combined occupancy — a bucket hot only via the OTHER side is pruned from both") {
    val s = spark
    import s.implicits._
    val delta = Seq((1L, 0, "X"), (2L, 1, "Y")).toDF("id", "band", "bv")
    val store = (0 until 500).map(i => (1000L + i, 0, "X")).toDF("id", "band", "bv")
    val hot = LshGuard.hotBuckets(
      delta.select($"band", $"bv").unionByName(store.select($"band", $"bv")), 256)
    // bucket (0, X): 2 + 500 > 256 → hot; (1, Y): 1 → cold
    assert(LshGuard.prune(delta, hot).select($"bv").as[String].collect().toSeq === Seq("Y"))
    assert(LshGuard.prune(store, hot).count() === 0)
  }

  test("adversarial: a 10^4-doc boilerplate family does not detonate the candidate join") {
    val s = spark
    import s.implicits._
    val boiler = "this site uses cookies accept our cookie policy to continue browsing here"
    val family = (0L until 10000L).map(i => (i, boiler))
    val planted = Seq(
      20001L -> "quick brown fox jumps over the lazy dog near the old river bank",
      20002L -> "quick brown fox jumps over the lazy dog near the old river bend")
    val delta = (family ++ planted).toDF("doc_id", "text")
    val emptyStore = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = IncrementalNearDedup.survivors(delta,
        IncrementalNearDedup.bandTable(emptyStore),
        IncrementalNearDedup.shingleSets(emptyStore))
      .select($"doc_id").as[Long].collect().toSet
    // planted near-dups: min id survives, twin suppressed
    assert(got.contains(20001L) && !got.contains(20002L))
    // the boilerplate family is OUT of near-dup scope (recall
    // contract): all its members pass through untouched...
    assert((0L until 10000L).forall(got))
    // ...because it is exact dedup's job — q40's rule collapses the
    // family to one canonical row (byte-identical texts, one digest)
    val exact = delta.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("canon"), count(lit(1)).as("n"))
    assert(exact.filter($"n" === 10000L).count() === 1)
  }
}
