package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomAntiJoin

/** [[graft.operators.BloomAntiJoin]] guarantees:
  *
  *  - EXACTNESS: equals the plain left-anti join on arbitrary data —
  *    overlapping keys, duplicates on both sides, null keys — fuzzed
  *    over randomized corpora (the Bloom filter routes rows between
  *    the keep-without-join path and the exact-join path; a routing
  *    bug shows up as a lost or invented row here);
  *  - ROUTING CUT: on disjoint sides the accepting sliver is bounded
  *    by ~fpp, so almost no row reaches the join — the property that
  *    shrinks the shuffle at the billion-fingerprint scale;
  *  - NO FALSE NEGATIVES: every left key present in the store tests
  *    positive (misses would silently keep true duplicates);
  *  - EMPTY STORE: degenerates to the identity, as left-anti does.
  */
class BloomAntiJoinSpec extends AnyFunSuite with SparkSpec {

  private def df(keys: Seq[Option[String]], tag: String): DataFrame = {
    val s = spark
    import s.implicits._
    keys.zipWithIndex.map { case (k, i) => (k.orNull, s"$tag$i") }
      .toDF("k", "payload")
  }

  private def plainAnti(l: DataFrame, r: DataFrame): Set[(String, String)] =
    l.join(r.select("k"), Seq("k"), "left_anti")
      .collect().map(row => (row.getAs[String]("k"), row.getAs[String]("payload"))).toSet

  private def bloomAnti(l: DataFrame, r: DataFrame): Set[(String, String)] =
    BloomAntiJoin(l, r.select("k"), "k")
      .collect().map(row => (row.getAs[String]("k"), row.getAs[String]("payload"))).toSet

  test("parity fuzz: equals plain left-anti on randomized corpora with overlap, dupes, nulls") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      val vocab = (1 to 400).map(i => s"key$i")
      val left = Seq.fill(300 + rnd.nextInt(200))(
        if (rnd.nextInt(50) == 0) None else Some(vocab(rnd.nextInt(vocab.size))))
      val right = Seq.fill(200 + rnd.nextInt(200))(
        if (rnd.nextInt(50) == 0) None else Some(vocab(rnd.nextInt(vocab.size))))
      val l = df(left, "L"); val r = df(right, "R")
      val got = bloomAnti(l, r)
      val want = plainAnti(l, r)
      assert(got === want, s"trial $trial: bloom-routed anti-join diverged")
      if (left.contains(None))
        assert(want.exists(_._1 == null),
          "sanity: null-keyed left rows survive anti-join (so the fuzz exercises the null path)")
    }
  }

  test("no false negatives: store keys always test positive") {
    val s = spark
    import s.implicits._
    val keys = (1 to 2000).map(i => s"fp-$i")
    val store = keys.toDF("k")
    val mc = BloomAntiJoin.mightContainCol(store, "k", fpp = 0.03).get
    val neg = store.filter(!coalesce(mc, lit(true))).count()
    assert(neg === 0L, "a member key tested negative — exactness relies on no false negatives")
  }

  test("routing cut: on disjoint sides the accepting sliver is ~fpp") {
    val s = spark
    import s.implicits._
    val store = (1 to 5000).map(i => s"store-$i").toDF("k")
    val probe = (1 to 5000).map(i => s"probe-$i").toDF("k")
    val mc = BloomAntiJoin.mightContainCol(store, "k", fpp = 0.03).get
    val accepted = probe.filter(coalesce(mc, lit(true))).count()
    // 3% target; allow generous slack for bitset rounding + hash luck
    assert(accepted <= 5000 * 0.03 * 4,
      s"$accepted of 5000 disjoint probes accepted — the pre-filter isn't cutting")
  }

  test("q100 wiring: bloom-routed plan equals the plain-anti formulation on the fixture") {
    val s = spark
    import s.implicits._
    val sf = sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf absent — skipping")
    val got = QueryRegistry.byName("q100_incremental_dedup").fn(spark, sf)
      .as[(Long, String, Long)].collect().toSet
    val docs = Tables.documents(spark, sf).select($"doc_id", md5($"text").as("fp"))
    val want = docs.filter($"doc_id" % 2 === 1)
      .join(docs.filter($"doc_id" % 2 === 0).select($"fp"), Seq("fp"), "left_anti")
      .groupBy($"fp").agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n"))
      .select($"doc_id", $"fp", $"n").as[(Long, String, Long)].collect().toSet
    assert(got.nonEmpty && got === want)
  }

  /** Regression pin for the build path: the Catalyst
    * `BloomFilterAggregate` silently clamps its bitset to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
    * 2²⁶ bits = 8 MiB) and its item count to 4×10⁶ — a filter "sized"
    * for a large store would saturate and route every probe to the
    * join. The sketch-builder path must keep sizing from (n, fpp)
    * unclamped: 8M keys at 1% fpp need ~76.7M bits ≈ 9.6 MB > the
    * 8 MiB clamp, so a clamped build CANNOT produce this length. */
  test("filter sizing is unclamped past the Catalyst 8 MiB runtime-filter cap") {
    val s = spark
    import s.implicits._
    val n = 8000000L
    val right = s.range(n).select($"id".cast("string").as("k"))
    val bits = BloomAntiJoin.filterBytes(right, "k", fpp = 0.01, n = n)
    val clampBytes = (1L << 26) / 8 // 8 MiB bitset = 2^26 bits
    assert(bits.length > clampBytes,
      s"filter is ${bits.length} bytes — at or under the ${clampBytes}B clamp; " +
        "the build regressed to a capped aggregate")
  }

  test("expectedKeys skips the sizing count and stays exact (over- and under-estimates)") {
    val l = df(Seq(Some("a"), Some("b"), Some("c"), None), "L")
    val r = df(Seq(Some("b"), Some("c"), Some("d")), "R")
    val want = plainAnti(l, r)
    // non-positive estimates must fall back to counting, NOT alias
    // the empty-store fast path (a stale 0 from a store counter
    // would otherwise keep every true duplicate)
    for (est <- Seq(-1L, 0L, 1L, 3L, 1000L)) {
      val got = BloomAntiJoin(l, r.select("k"), "k", expectedKeys = Some(est))
        .collect().map(row => (row.getAs[String]("k"), row.getAs[String]("payload"))).toSet
      assert(got === want, s"expectedKeys=$est broke exactness")
    }
  }

  /** The caller contract made measurable: `left`'s lineage runs once
    * per route on the default path (fine for file-backed deltas,
    * expensive for derived frames) and exactly once under
    * `eagerRoute = true`. The accumulator increments once per
    * partition COMPUTATION, so recomputation is visible as a doubled
    * count — reading materialized checkpoint blocks adds nothing. */
  test("caller contract: default routing evaluates left once per route; eagerRoute exactly once") {
    val s = spark
    import s.implicits._
    val parts = 4
    def instrumented() = {
      val acc = s.sparkContext.longAccumulator("left-partition-computations")
      val frame = s.sparkContext.range(0L, 400L, 1L, parts)
        .mapPartitions { it => acc.add(1); it }
        .toDF("id").select($"id".cast("string").as("k"))
      (acc, frame)
    }
    val store = (0 until 400 by 2).map(_.toString).toDF("k")

    val (accLazy, lazyLeft) = instrumented()
    val gotLazy = BloomAntiJoin(lazyLeft, store, "k")
    assert(gotLazy.count() === 200L) // odd keys survive
    assert(accLazy.value === 2L * parts,
      s"default path should compute left twice (got ${accLazy.value} partition computations)")

    val (accEager, eagerLeft) = instrumented()
    val gotEager = BloomAntiJoin(eagerLeft, store, "k", eagerRoute = true)
    val eagerScans = accEager.value // localCheckpoint ran at call time
    assert(gotEager.count() === 200L)
    assert(accEager.value === 1L * parts && accEager.value === eagerScans,
      s"eagerRoute should compute left exactly once, at call time " +
        s"(got ${accEager.value} partition computations, $eagerScans at call)")
    // both routes agree with the plain anti-join
    val wantKeys = (1 until 400 by 2).map(_.toString).toSet
    assert(gotEager.select($"k").as[String].collect().toSet === wantKeys)
  }

  test("empty store keeps everything; delta dupes preserved for downstream grouping") {
    val s = spark
    import s.implicits._
    val l = df(Seq(Some("a"), Some("a"), Some("b"), None), "L")
    val empty = Seq.empty[String].toDF("k")
    assert(bloomAnti(l, empty) === plainAnti(l, empty))
    assert(BloomAntiJoin(l, empty, "k").count() === 4L)
  }
}
