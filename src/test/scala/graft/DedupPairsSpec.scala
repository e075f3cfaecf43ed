package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pair-generation guarantees for the banded/bucketed dedup rewrites
  * (round 3 — the O(n²) pair scans were replaced):
  *
  *  - q43 SimHash banding is EXACT: 11 disjoint bands over 60 bits
  *    with hamming ≤ 10 pigeonhole-guarantee one identical band, so
  *    the banded result must equal the brute-force pair scan.
  *  - q44 cosine LSH is exact-on-candidates: every emitted pair must
  *    carry the true brute-force cosine (precision 1), with recall
  *    measured against brute force and floored (the fixture has no
  *    planted near-dups — all qualifying pairs are chance pairs at
  *    the 0.4 noise floor, see the q44 scaladoc for the math).
  */
class DedupPairsSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"

  private def run(name: String): DataFrame = {
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf absent — skipping")
    QueryRegistry.byName(name).fn(spark, sf)
  }

  test("q43: banded SimHash pairs equal the brute-force pair scan") {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    val fp = Tables.documents(spark, sf)
      .filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id", expr("simhash60(word_shingles(text, 3))").as("fp"))
    val brute = fp.as("a").join(fp.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        expr("bit_count(a.fp ^ b.fp)").cast("long").as("hamming"))
      .filter($"hamming" <= 10)
      .as[(Long, Long, Long)].collect().toSet
    val banded = run("q43_dedup_simhash")
      .as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture should contain SimHash near-dups")
    assert(banded === brute, "banding must lose (and invent) nothing")
  }

  test("SimHash banding pigeonhole: every bounded-hamming pair shares a band (property)") {
    import graft.functions.SimHashBands
    // layout sanity: 11 disjoint bands tiling exactly [0, 60)
    assert(SimHashBands.defs.size == 11)
    assert(SimHashBands.defs.map(_._2).sum == 60)
    assert(SimHashBands.defs.sliding(2).forall {
      case Seq((o1, w1), (o2, _)) => o1 + w1 == o2; case _ => true })
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 5000) {
      val fp = rnd.nextLong() & ((1L << 60) - 1)
      val flips = rnd.nextInt(11) // hamming 0..10 — always within bound
      val other = (1 to flips).foldLeft(fp)((f, _) => f ^ (1L << rnd.nextInt(60)))
      // (re-flipping a bit only lowers the hamming distance — still <= 10)
      val shared = SimHashBands.bands(fp).zip(SimHashBands.bands(other))
        .exists { case (a, b) => a == b }
      assert(shared, f"fp=$fp%x other=$other%x hamming=${java.lang.Long.bitCount(fp ^ other)}")
    }
  }

  test("q71: span coverage matches hand-computed fractions on a planted corpus") {
    import spark.implicits._
    // planted corpus with KNOWN coverage: the 20-token span S appears
    // in docs 1, 2 (exact dup of 1) and 3 (S + 10 unique tokens)
    val span = (1 to 20).map(i => s"s$i").mkString(" ")
    val d1 = span + " " + (1 to 10).map(i => s"a$i").mkString(" ") // 30 toks
    val d3 = (1 to 10).map(i => s"b$i").mkString(" ") + " " + span // 30 toks
    val d4 = (1 to 30).map(i => s"u$i").mkString(" ")              // unique
    val d5 = "too short to host a span"                            // < k toks
    val dir = java.nio.file.Files.createTempDirectory("q71fix").toString
    Seq((1L, d1), (2L, d1), (3L, d3), (4L, d4), (5L, d5))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    val got = QueryRegistry.byName("q71_repeated_spans").fn(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, cov, frac) => id -> ((n, cov, frac)) }.toMap
    assert(got(1L) == ((30L, 30L, 1.0)), s"exact dup: ${got(1L)}") // full cover
    assert(got(2L) == ((30L, 30L, 1.0)), s"exact dup: ${got(2L)}")
    assert(got(3L) == ((30L, 20L, 20.0 / 30.0)), s"partial: ${got(3L)}")
    assert(got(4L) == ((30L, 0L, 0.0)), s"unique: ${got(4L)}")
    assert(got(5L)._2 == 0L, s"short doc hosts no k-gram: ${got(5L)}")
  }

  test("q44: LSH over the planted view = exact brute force — full recall, exact cosines") {
    import spark.implicits._
    // brute-force baseline over the SAME planted view (the shared
    // private[graft] helper — spec and query cannot see different data)
    val e = graft.queries.DedupQueries.plantedEmbeddings(spark, sf)
      .select($"vec_id", $"embedding",
        graft.functions.Vectors.norm($"embedding").as("nrm"))
    val brute = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        graft.functions.Vectors
          .cosineWithNorms($"a.embedding", $"b.embedding", $"a.nrm", $"b.nrm")
          .as("cosine"))
      .filter($"cosine" >= 0.9)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val lsh = run("q44_dedup_cosine").as[(Long, Long, Double)].collect()
    assert(brute.nonEmpty, "planting must create >=0.9 pairs on the fixture")
    assert(lsh.length === brute.size,
      s"LSH recall broke: ${lsh.length} pairs vs ${brute.size} true pairs")
    lsh.foreach { case (a, b, c) =>
      val exact = brute.get((a, b))
      assert(exact.isDefined, s"($a,$b) not a true >=0.9 pair — precision broken")
      assert(math.abs(exact.get - c) < 1e-12, s"($a,$b) cosine drifted from exact")
    }
    // every planted twin pair is found (twin −(id+1), original id):
    // the margin (cos >= 0.9887) makes an 8-table miss a ~2e-5
    // event, and the md5 planes make the outcome deterministic — pin it
    val planted = brute.keySet.filter { case (a, b) => a < 0 && b == -a - 1 }
    assert(planted.nonEmpty && planted.subsetOf(
      lsh.map { case (a, b, _) => (a, b) }.toSet))
  }

  test("q44 recall-envelope budget: the executable math covers gate, replica and sf100 scales") {
    import graft.queries.DedupQueries.cosExpectedMisses
    // the derivation the scaladoc carries, now CI-pinned so a future
    // scale-up checks a budget instead of rediscovering it: per-plane
    // agreement at the planted margin ~0.952, per-table collision
    // 0.952^6 ~0.74, miss-all-8 ~2e-5 per pair
    val perPair = cosExpectedMisses(1, 0.9887, 8, 6)
    assert(perPair > 1e-6 && perPair < 1e-4, s"per-pair miss $perPair")
    // ~sf1 replica: 408 planted pairs (measured, SCALING.md) — the
    // bit-exact sweeps ran inside a ~0.01 expected-miss budget
    assert(cosExpectedMisses(408, 0.9887, 8, 6) < 0.05)
    // sf100 (~40k planted pairs): the default config BLOWS the budget
    // — exactly why the knob exists...
    assert(cosExpectedMisses(40000, 0.9887, 8, 6) > 0.5)
    // ...and the documented remedy (graft.cos.tables=12) restores it
    assert(cosExpectedMisses(40000, 0.9887, 12, 6) < 0.05)
  }

  test("q44 graft.cos.tables is upward-safe: more tables, identical gated result") {
    import spark.implicits._
    def pairs(): Set[(Long, Long)] = run("q44_dedup_cosine")
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val dflt = pairs()
    spark.conf.set("graft.cos.tables", "12")
    val wide = try pairs() finally spark.conf.unset("graft.cos.tables")
    assert(wide === dflt,
      "extra tables must only add candidates that exact-verify filters identically")
    val bad = intercept[IllegalArgumentException] {
      spark.conf.set("graft.cos.tables", "0")
      try pairs() finally spark.conf.unset("graft.cos.tables")
    }
    assert(bad.getMessage.contains("graft.cos.tables"))
  }

  test("graft.cos.bits scales the bucket space: a budget-sized (bits, tables) config is result-identical") {
    import spark.implicits._
    import graft.queries.DedupQueries.cosExpectedMisses
    // bits is the ARCHIVE-SCALE knob (chance candidates ~ n²/2^bits;
    // LshGuard saturates past ~cap·2^bits same-band vectors) and is
    // NOT unconditionally upward-safe — more bits remove candidates —
    // so a scaled config must be SIZED from the budget math first:
    // at the planted margin, bits 6→12 halves per-table collision
    // odds for true pairs and tables 8→16 restores the miss budget.
    assert(cosExpectedMisses(408, 0.9887, 16, 12) < 0.05,
      "the pinned scaled config must cover the replica's pair count")
    def q44pairs(): Set[(Long, Long)] = run("q44_dedup_cosine")
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    def q144verdicts(): Set[(Long, Boolean)] = run("q144_cos_incremental")
      .as[(Long, Boolean)].collect().toSet
    val (dfltPairs, dfltVerdicts) = (q44pairs(), q144verdicts())
    spark.conf.set("graft.cos.bits", "12")
    spark.conf.set("graft.cos.tables", "16")
    try {
      assert(q44pairs() === dfltPairs,
        "budget-sized (12, 16) config must find the identical pair set")
      assert(q144verdicts() === dfltVerdicts,
        "budget-sized (12, 16) config must make identical suppression decisions")
    } finally {
      spark.conf.unset("graft.cos.bits")
      spark.conf.unset("graft.cos.tables")
    }
    val bad = intercept[IllegalArgumentException] {
      spark.conf.set("graft.cos.bits", "31")
      try q44pairs() finally spark.conf.unset("graft.cos.bits")
    }
    assert(bad.getMessage.contains("graft.cos.bits"))
  }
}
