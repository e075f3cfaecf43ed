package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalContainment, IncrementalNearDedup}

/** Skew-stress for the containment/shingle family (round-10 verdict
  * #7): ScaleCheckSpec pins growth on a UNIFORM replica, but the
  * regime that detonates a shingle-keyed candidate join is one hot
  * key — a boilerplate 3-gram in 30% of docs. This spec plants
  * exactly that and pins:
  *  - the hot-shingle df guard keeps the candidate join output
  *    linear-ish where the unguarded join is quadratic on the hot
  *    key;
  *  - the RECALL CONTRACT: true containment pairs with any sub-cap
  *    witness survive the guard; docs sharing ONLY the hot
  *    boilerplate were never pairs (containment far below t);
  *  - q116's batch result on a planted corpus is IDENTICAL with the
  *    guard at its default cap (the gate-oracle-safety claim).
  */
class ContainSkewSpec extends AnyFunSuite with SparkSpec {

  private val Hot = "accept all cookies" // the planted boilerplate 3-gram

  /** n docs; 30% carry the hot 3-gram as their lead; each doc has 12
    * otherwise-unique words, plus one planted true-containment pair
    * (9000 ⊂ 9001) whose witnesses are all unique shingles. */
  private def corpus(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    val docs = (1 to n).map { i =>
      val unique = (1 to 12).map(w => s"u${i}x$w").mkString(" ")
      val text = if (i % 10 < 3) s"$Hot $unique" else unique
      (i.toLong, text)
    } ++ Seq(
      9000L -> (1 to 10).map(w => s"q${w}z").mkString(" "),
      9001L -> ((1 to 10).map(w => s"q${w}z").mkString(" ") + " plus extra tail words here"))
    docs.toDF("doc_id", "text")
  }

  private def sets(df: DataFrame) = IncrementalNearDedup.shingleSets(df)

  test("hot key: guarded candidates stay bounded where unguarded are quadratic") {
    val s = spark
    import s.implicits._
    val n = 600
    val all = corpus(n)
    val d = sets(all.filter($"doc_id" % 2 === 1)).cache()
    val st = sets(all.filter($"doc_id" % 2 === 0)).cache()
    val union = d.unionByName(st)
    try {
      val unguarded = IncrementalContainment
        .candidates(d, st, union, IncrementalContainment.DefaultT, Int.MaxValue)
        .count()
      val guarded = IncrementalContainment
        .candidates(d, st, union, IncrementalContainment.DefaultT, 64)
        .count()
      // ~180 hot docs; the hot hash lands in a hash-order prefix for
      // ~1/3 of them → unguarded candidates ≈ 60 × 180 ≈ 10⁴⁺; the
      // guard cuts the key and leaves only genuine-witness candidates
      assert(unguarded > 5000L,
        s"the planted hot key should detonate the unguarded join, got $unguarded")
      assert(guarded < 100L,
        s"guard failed to bound the hot key: $guarded candidates")
      assert(guarded * 20 < unguarded, s"guarded=$guarded unguarded=$unguarded")
    } finally { d.unpersist(); st.unpersist(): Unit }
  }

  test("recall contract: sub-cap-witness pairs survive; boilerplate-only docs never paired") {
    val s = spark
    import s.implicits._
    val all = corpus(600)
    // split so the planted pair straddles delta (odd 9001) and store (even 9000)
    val pairs = IncrementalContainment.containedPairs(
      all.filter($"doc_id" % 2 === 1), sets(all.filter($"doc_id" % 2 === 0)),
      t = IncrementalContainment.DefaultT)
      .select($"contained", $"container").as[(Long, Long)].collect().toSet
    assert(pairs.contains((9000L, 9001L)),
      "true containment pair with unique witnesses must survive the guard")
    // docs sharing ONLY the hot 3-gram: containment = 2/13 << 0.7 —
    // never pairs, guard or not; with the guard they never even
    // become candidates
    assert(pairs.filter(p => p._1 <= 600 && p._2 <= 600).isEmpty,
      s"boilerplate-only docs must not pair: $pairs")
  }

  test("pre-aggregated store-df guard route matches the self-contained recount route") {
    // round 11: [[DedupStore.ingestContained]] feeds the guard the
    // committed per-day (sh, cnt) table instead of re-counting
    // occupancy over store postings each ingest. Same counts by
    // construction (per-doc contributions are ≤1 per distinct shingle
    // and additive over disjoint doc sets) — pinned here ON the skew
    // corpus, at a cap the hot key actually crosses, so the two
    // routes must prune the identical key set
    val s = spark
    import s.implicits._
    val all = corpus(600)
    val d = sets(all.filter($"doc_id" % 2 === 1)).cache()
    val st = sets(all.filter($"doc_id" % 2 === 0)).cache()
    val union = d.unionByName(st)
    try {
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long)].collect().toSet
      val recount = collect(IncrementalContainment
        .candidates(d, st, union, IncrementalContainment.DefaultT, 64))
      val preAgg = collect(IncrementalContainment
        .candidates(d, st, union, IncrementalContainment.DefaultT, 64,
          Some(IncrementalContainment.shingleDf(st))))
      assert(recount === preAgg,
        s"guard routes diverged: only-recount=${recount -- preAgg} only-preagg=${preAgg -- recount}")
      assert(recount.nonEmpty)
      // end-to-end parity through containedPairs
      val full = IncrementalContainment.containedPairs(
        all.filter($"doc_id" % 2 === 1), st)
        .select($"contained", $"container").as[(Long, Long)].collect().toSet
      val viaDf = IncrementalContainment.containedPairs(
        all.filter($"doc_id" % 2 === 1), st,
        storeDf = Some(IncrementalContainment.shingleDf(st)))
        .select($"contained", $"container").as[(Long, Long)].collect().toSet
      assert(full === viaDf)
      assert(viaDf.contains((9000L, 9001L)))
    } finally { d.unpersist(); st.unpersist(): Unit }
  }

  test("daily-cadence geometry (archive >> delta) takes the Bloom route and changes nothing") {
    // the adaptive guard routes the store df through a delta-keyed
    // Bloom only when the archive's df outweighs the delta's (4x) —
    // the 50/50 split above stays on the plain union, so THIS case
    // plants the real geometry: a 40-doc delta against a 560-doc
    // archive (store df ~6700 keys >> 4x the delta's ~500), including
    // the planted containment pair straddling the split
    val s = spark
    import s.implicits._
    val all = corpus(600)
    val d = sets(all.filter($"doc_id" % 15 === 1)
      .unionByName(all.filter($"doc_id" === 9001L))).cache()
    val st = sets(all.filter($"doc_id" % 15 =!= 1 && $"doc_id" =!= 9001L)).cache()
    val union = d.unionByName(st)
    try {
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long)].collect().toSet
      val recount = collect(IncrementalContainment
        .candidates(d, st, union, IncrementalContainment.DefaultT, 64))
      val bloomed = collect(IncrementalContainment
        .candidates(d, st, union, IncrementalContainment.DefaultT, 64,
          Some(IncrementalContainment.shingleDf(st))))
      assert(recount === bloomed,
        s"bloom route diverged: only-recount=${recount -- bloomed} only-bloom=${bloomed -- recount}")
      assert(bloomed.contains((9000L, 9001L)) || bloomed.contains((9001L, 9000L)),
        s"planted pair lost by the bloom route: $bloomed")
    } finally { d.unpersist(); st.unpersist(): Unit }
  }

  test("q116 on a planted-hot-key corpus: default guard changes nothing") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skew116").toString
    corpus(200).withColumn("source", org.apache.spark.sql.functions.lit("src0"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    def run(): Set[(Long, Long)] =
      QueryRegistry.byName("q116_containment_dedup").fn(spark, dir)
        .select($"contained", $"container").as[(Long, Long)].collect().toSet
    val withDefault = run()
    spark.conf.set("graft.contain.maxShingleDf", Int.MaxValue.toString)
    val without = try run()
    finally spark.conf.unset("graft.contain.maxShingleDf")
    assert(withDefault === without,
      "the default cap must be pure overhead protection — zero result change")
    assert(withDefault.contains((9000L, 9001L)))
  }
}
