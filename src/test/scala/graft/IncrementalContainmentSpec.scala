package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupStore, IncrementalContainment, IncrementalNearDedup}

/** [[IncrementalContainment]] + [[DedupStore.ingestContained]] — the
  * asymmetric cell of the incremental dedup quadrant (VERDICT r8 #2).
  *
  * Contract under test: `containedPairs(delta, store)` equals the
  * q116-style BATCH containment join over store ∪ delta restricted to
  * pairs with a delta member — proved on the planted host-quote case
  * the symmetric-Jaccard family structurally misses, then fuzzed over
  * random heavy-overlap corpora (the prefix filter's recall proof is
  * only as credible as the adversarial inputs it survives). Store
  * semantics: suppression policy (archive wins; min-id on mutual),
  * day-marker idempotency on re-runs.
  */
class IncrementalContainmentSpec extends AnyFunSuite with SparkSpec {

  private def docs(ids: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.toSeq.toDF("doc_id", "text")
  }

  private def ids(df: DataFrame): Set[Long] = {
    val s = spark
    import s.implicits._
    df.select($"doc_id").as[Long].collect().toSet
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("contained", "container").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def emptySets = IncrementalNearDedup.shingleSets(docs().limit(0))

  /** q116-batch pairs over `all`, restricted to pairs touching `delta`. */
  private def batchTouching(all: DataFrame, deltaIds: Set[Long]): Set[(Long, Long)] =
    pairSet(IncrementalContainment.containedPairs(all, emptySets))
      .filter { case (a, b) => deltaIds(a) || deltaIds(b) }

  private val quote =
    "the quick brown fox jumps over the lazy dog near the riverbank today"

  test("host-quote case: both orientations detected against the store") {
    // archived doc A; new ingest = host B quoting A whole inside ~6x
    // padding (A contained in B at ~1.0, Jaccard ~0.15 — q41's miss),
    // a trimmed copy C (C contained in archived A), a unique D
    val store = docs(2L -> quote)
    val host = (1 to 6).map(i =>
      s"filler$i pad$i noise$i chaff$i bulk$i").mkString(" ") + " " + quote
    val delta = docs(
      11L -> host,
      13L -> quote.split(" ").dropRight(2).mkString(" "), // trimmed copy
      15L -> "completely unrelated words about gardening tulips and soil")
    val pairs = IncrementalContainment.containedPairs(
      delta, IncrementalNearDedup.shingleSets(store))
    val got = pairSet(pairs)
    assert(got.contains((2L, 11L)), s"archived-doc-swallowed orientation missing: $got")
    assert(got.contains((13L, 2L)), s"new-doc-redundant orientation missing: $got")
    assert(!got.exists { case (a, b) => a == 15L || b == 15L },
      s"unique doc must not pair: $got")
    // equivalence with the batch join on the union
    assert(got === batchTouching(store.unionByName(delta), Set(11L, 13L, 15L)))
  }

  test("fuzz: incremental pairs == batch pairs touching the delta") {
    val vocab = Array("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen",
      "ibis", "jay", "kite", "lark")
    val rnd = new scala.util.Random(20260813L)
    for (round <- 1 to 4) {
      val all = (1L to 24L).map { i =>
        val n = 3 + rnd.nextInt(12)
        // heavy overlap by construction: tiny vocab, shared runs
        i -> (0 until n).map(j => vocab((rnd.nextInt(5) + j) % vocab.length))
          .mkString(" ")
      }
      val deltaIds = all.map(_._1).filter(_ => rnd.nextBoolean()).toSet
      val store = docs(all.filterNot(d => deltaIds(d._1)): _*)
      val delta = docs(all.filter(d => deltaIds(d._1)): _*)
      val incr = pairSet(IncrementalContainment.containedPairs(
        delta, IncrementalNearDedup.shingleSets(store)))
      val batch = batchTouching(docs(all: _*), deltaIds)
      assert(incr === batch,
        s"round $round: incremental ${incr.size} vs batch ${batch.size}: " +
          s"missing=${batch -- incr} extra=${incr -- batch}")
    }
  }

  test("store: archive wins, min-id on mutual, chains drop inner docs") {
    val root = Files.createTempDirectory("cstore").toString
    val s1 = DedupStore.ingestContained(docs(2L -> quote), root, "d1")
    assert(ids(s1) === Set(2L))
    val host = "alpha beta gamma " + quote + " omega psi chi phi upsilon tau"
    val delta = docs(
      11L -> quote,                     // identical to archived 2 → drop
      12L -> host,                      // container, nothing above it → keep
      13L -> host,                      // mutual twin of 12 → min-id 12 kept
      14L -> quote.split(" ").drop(2).mkString(" ")) // chain: ⊂ 2 and ⊂ host
    val s2 = DedupStore.ingestContained(delta, root, "d2")
    assert(ids(s2) === Set(12L))
    assert(DedupStore.committedDays(spark, root) === Seq("d1", "d2"))
  }

  test("store re-run is idempotent: same survivors, same committed state") {
    val root = Files.createTempDirectory("cstore2").toString
    DedupStore.ingestContained(docs(2L -> quote), root, "d1")
    val delta = docs(
      11L -> quote,
      12L -> "an entirely separate subject matter sentence with many words here")
    def storedIds: Set[Long] = {
      val s = spark
      import s.implicits._
      spark.read.parquet(s"$root/sets").select($"id".as[Long]).collect().toSet
    }
    val first = ids(DedupStore.ingestContained(delta, root, "d2"))
    val storedFirst = storedIds
    val second = ids(DedupStore.ingestContained(delta, root, "d2"))
    assert(first === second && first === Set(12L))
    assert(storedIds === storedFirst)
    assert(DedupStore.committedDays(spark, root) === Seq("d1", "d2"))
  }

  test("short docs carry no shingles and trivially survive") {
    val root = Files.createTempDirectory("cstore3").toString
    val surv = DedupStore.ingestContained(docs(1L -> "two words"), root, "d1")
    assert(ids(surv) === Set(1L))
    // day committed even though the sets table got zero rows for it
    assert(DedupStore.committedDays(spark, root) === Seq("d1"))
  }
}
