package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProfileAggregator
import graft.operators.ProfileAggregator.{Buf, In}
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Ev, ProfileState}

/** SURVEY §5's promised property tests, ScalaCheck-generated: the A1
  * merge monoid laws that make Spark's arbitrary partitioning and
  * shuffle-merge order SAFE. Spark may split the input rows across
  * any number of partial buffers and merge those partials in any
  * tree shape/order — the result is partition-invariant iff `merge`
  * is commutative and associative with `zero` as identity, which is
  * exactly what these laws pin (same discipline for the streaming
  * state monoid, whose micro-batch boundaries are another arbitrary
  * partitioning of the event stream).
  *
  * Fixed seeds — failures reproduce. FP caveat: the streaming state
  * carries a Double sum, so its generators use integer-valued
  * amounts (exact in IEEE double far past these magnitudes) — the
  * law under test is merge algebra, not float rounding. The typed
  * Aggregator's buffer is all-integer, so its laws are exact
  * unconditionally. */
class MonoidLawsSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 100): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- ProfileAggregator (the §2.10 typed-Aggregator UDAF) ----

  private val agg = ProfileAggregator.merge

  private val genIn: Gen[In] = for {
    uid <- Gen.chooseNum(1L, 50L)
    tpe <- Gen.oneOf("click", "view", "purchase", "install", "open")
    ts <- Gen.chooseNum(1L, 1L << 40)
  } yield (uid, tpe, ts)

  private val genBuf: Gen[Buf] =
    Gen.listOf(genIn).map(_.foldLeft(agg.zero)(agg.reduce))

  test("Aggregator merge: zero is a two-sided identity") {
    samples(genBuf).foreach { b =>
      assert(agg.merge(agg.zero, b) == b && agg.merge(b, agg.zero) == b)
    }
  }

  test("Aggregator merge: commutative") {
    samples(Gen.zip(genBuf, genBuf)).foreach { case (x, y) =>
      assert(agg.merge(x, y) == agg.merge(y, x))
    }
  }

  test("Aggregator merge: associative") {
    samples(Gen.zip(genBuf, genBuf, genBuf)).foreach { case (x, y, z) =>
      assert(agg.merge(agg.merge(x, y), z) == agg.merge(x, agg.merge(y, z)))
    }
  }

  test("Aggregator: any partitioning of the rows finishes identically") {
    val genCase = for {
      rows <- Gen.listOfN(60, genIn)
      cuts <- Gen.listOfN(4, Gen.chooseNum(0, rows.size))
    } yield (rows, cuts.sorted.distinct)
    samples(genCase).foreach { case (rows, cuts) =>
      val direct = rows.foldLeft(agg.zero)(agg.reduce)
      val bounds = (0 +: cuts :+ rows.size).distinct.sorted
      val partials = bounds.zip(bounds.tail).map { case (a, b) =>
        rows.slice(a, b).foldLeft(agg.zero)(agg.reduce)
      }
      // merge the partials in reversed order too — tree shape AND
      // order must both wash out
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      val mergedRev = partials.reverse.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == agg.finish(direct))
      assert(agg.finish(mergedRev) == agg.finish(direct))
    }
  }

  // ---- Streaming state monoid (mergeEvent across micro-batches) ----

  /** ≤ 5 distinct types — far under MaxTypes (64), so the overflow
    * bucket never engages and fold ORDER must wash out entirely.
    * (At > MaxTypes distinct types first-come keeps the named slot —
    * order then decides WHICH types overflow, by design; the law
    * under test is the non-overflow regime Spark's repartitioning
    * actually exercises.) */
  private val genEv: Gen[Ev] = for {
    uid <- Gen.chooseNum(1L, 10L)
    tpe <- Gen.oneOf("a", "b", "c", "d", "e")
    ts <- Gen.chooseNum(1L, 1L << 40)
    v <- Gen.chooseNum(0L, 1000L) // integer-valued double: exact sums
  } yield Ev(uid, tpe, ts, v.toDouble)

  test("streaming state: any batch split + any batch order folds identically") {
    val genCase = for {
      evs <- Gen.listOfN(50, genEv)
      cut <- Gen.chooseNum(0, evs.size)
    } yield (evs, cut)
    samples(genCase).foreach { case (evs, cut) =>
      def fold(es: Seq[Ev]): ProfileState =
        es.foldLeft(StreamingOps.emptyState)(StreamingOps.mergeEvent)
      val direct = fold(evs)
      val (b1, b2) = evs.splitAt(cut)
      // batches arriving as [b1, b2] vs the whole stream at once
      val batched = b2.foldLeft(fold(b1))(StreamingOps.mergeEvent)
      assert(batched == direct)
      // event order within the stream washes out below MaxTypes
      assert(fold(evs.reverse) == direct)
    }
  }
}
