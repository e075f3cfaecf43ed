package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalNearDedup

/** [[graft.operators.IncrementalNearDedup]] guarantees:
  *
  *  - BATCH EQUIVALENCE on the fixture: splitting the corpus into
  *    store (even ids) and delta (odd ids) and running the
  *    incremental path keeps exactly the delta docs that an
  *    independent reference — naive band self-join over the union,
  *    raw STRING-shingle Jaccard verification, driver-side
  *    union-find — says survive. The reference shares no pipeline
  *    code with the operator (different candidate join, different
  *    verify representation, different closure algorithm);
  *  - TRANSITIVE SUPPRESSION: a delta doc with no direct store match
  *    is still suppressed when a chain of verified near-dups reaches
  *    the store (the contract is component-level, matching what the
  *    full-batch CC pipeline would decide);
  *  - empty-store degeneration to plain within-batch dedup;
  *  - untouched docs (no candidate pairs at all) always survive.
  */
class IncrementalNearDedupSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"

  private def docs(ids: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.toSeq.toDF("doc_id", "text")
  }

  /** Independent reference: all verified near-dup pairs over the
    * union corpus via a NAIVE (band, bv) self-join + raw string
    * shingle Jaccard, then driver-side union-find, then the
    * component rule. Fixture-scale only. */
  private def referenceSurvivors(all: DataFrame, storeIds: Set[Long],
      t: Double): Set[Long] = {
    val s = spark
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val sh = all.filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id", expr("word_shingles(text, 3)").as("sset"))
    val bands = sh
      .select($"doc_id", expr("minhash_sig(sset)").as("sig"), $"sset")
      .select($"doc_id",
        posexplode(IncrementalNearDedup.bandDigests($"sig")))
      .toDF("doc_id", "band", "bv")
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bv" === $"b.bv"
          && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db")).distinct()
    val pairs = cand
      .join(sh.select($"doc_id".as("da"), $"sset".as("sa")), Seq("da"))
      .join(sh.select($"doc_id".as("db"), $"sset".as("sb")), Seq("db"))
      .withColumn("c", size(array_intersect($"sa", $"sb")))
      .filter($"c".cast("double") / (size($"sa") + size($"sb") - $"c") >= t)
      .select($"da", $"db").as[(Long, Long)].collect()
    // driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val allIds = all.select($"doc_id").as[Long].collect().toSet
    val deltaIds = allIds -- storeIds
    // ignore store-store pairs: group members by component over the
    // touched nodes; untouched delta docs survive outright
    val touched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val byComp = touched.groupBy(find)
    val survivorsOfComps = byComp.values.collect {
      case members if !members.exists(storeIds) && members.exists(deltaIds) =>
        members.filter(deltaIds).min
    }.toSet
    (deltaIds -- touched) ++ survivorsOfComps
  }

  private def incremental(all: DataFrame, storeIds: Set[Long],
      t: Double): Set[Long] = {
    val s = spark
    import s.implicits._
    val store = all.filter($"doc_id".isin(storeIds.toSeq: _*))
    val delta = all.filter(!$"doc_id".isin(storeIds.toSeq: _*))
    IncrementalNearDedup.survivors(delta,
        IncrementalNearDedup.bandTable(store),
        IncrementalNearDedup.shingleSets(store), t = t)
      .select($"doc_id").as[Long].collect().toSet
  }

  test("batch equivalence on the fixture corpus (even ids = store, odd = delta)") {
    val s = spark
    import s.implicits._
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf absent — skipping")
    val all = Tables.documents(spark, sf).select($"doc_id", $"text")
    val storeIds = all.filter($"doc_id" % 2 === 0)
      .select($"doc_id").as[Long].collect().toSet
    val got = incremental(all, storeIds, t = 0.6)
    val want = referenceSurvivors(all, storeIds, t = 0.6)
    assert(want.nonEmpty, "fixture delta should have survivors")
    assert(got === want,
      s"incremental != batch reference (missing=${want -- got}, extra=${got -- want})")
  }

  test("transitive suppression: a chain through the delta into the store kills the whole component") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = docs(
      2L -> base,                      // store
      7L -> base,                      // delta twin of 9 AND of store 2
      9L -> base,                      // delta twin of store 2
      5L -> "one two three four five six seven eight nine ten",  // unique
      11L -> "red orange yellow green blue indigo violet pink brown black",
      13L -> "red orange yellow green blue indigo violet pink brown black")
    val got = incremental(corpus, storeIds = Set(2L), t = 0.6)
    // 7 and 9 die via the store component; 5 untouched; 11 beats 13
    assert(got === Set(5L, 11L))
  }

  /** The fixture corpus has a narrow near-dup structure (template
    * copies). This fuzz builds corpora with a Zipfian vocabulary,
    * doc lengths 3–40 tokens, planted copies with 0–3 token edits
    * (straddling the 0.6 threshold both ways), and a RANDOM
    * store/delta split — so chains cross the split boundary in every
    * direction — and asserts the incremental path keeps exactly the
    * delta docs the independent batch reference keeps. Seeded —
    * failures reproduce. */
  test("randomized corpora + random store split: incremental equals batch (3 seeds)") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(11, 271, 9001)) {
      val rnd = new scala.util.Random(seed)
      val vocabN = 300
      def word(): String = { // Zipf-ish: rank r with weight ~ 1/(r+1)
        val u = rnd.nextDouble()
        val r = ((math.exp(u * math.log(vocabN + 1.0)) - 1.0)).toInt.min(vocabN - 1)
        s"w$r"
      }
      val base = (0 until 100).map { i =>
        val len = 3 + rnd.nextInt(38)
        (i.toLong, Seq.fill(len)(word()))
      }
      val editedCopies = base.filter(_ => rnd.nextDouble() < 0.35).map {
        case (id, toks) =>
          val edits = rnd.nextInt(4)
          val mutated = (0 until edits).foldLeft(toks) { (t, _) =>
            if (t.size > 3 && rnd.nextBoolean()) t.patch(rnd.nextInt(t.size), Nil, 1)
            else t.updated(rnd.nextInt(t.size), word())
          }
          (1000L + id, mutated)
      }
      val corpus = (base ++ editedCopies)
        .map { case (id, toks) => (id, toks.mkString(" ")) }
      val all = corpus.toDF("doc_id", "text")
      val storeIds = corpus.map(_._1).filter(_ => rnd.nextDouble() < 0.4).toSet
      val got = incremental(all, storeIds, t = 0.6)
      val want = referenceSurvivors(all, storeIds, t = 0.6)
      val deltaIds = corpus.map(_._1).toSet -- storeIds
      assert(want.nonEmpty && want.size < deltaIds.size,
        s"seed $seed planted no cross-split suppression — weaken edits")
      assert(got === want,
        s"seed $seed: incremental != batch reference " +
          s"(missing=${want -- got}, extra=${got -- want})")
    }
  }

  test("empty store degenerates to within-batch dedup; untouched docs survive") {
    val corpus = docs(
      1L -> "a b c d e f g h i j",
      3L -> "a b c d e f g h i j",
      5L -> "k l m n o p q r s t")
    val s = spark
    import s.implicits._
    val emptyStore = docs().limit(0)
    val got = IncrementalNearDedup.survivors(corpus,
        IncrementalNearDedup.bandTable(emptyStore),
        IncrementalNearDedup.shingleSets(emptyStore))
      .select($"doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 5L))
  }

  test("materializeDir spill path decides identically to the cache path") {
    val s = spark
    import s.implicits._
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf absent — skipping")
    val all = Tables.documents(spark, sf).select($"doc_id", $"text")
    val store = all.filter($"doc_id" % 2 === 0)
    val delta = all.filter($"doc_id" % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("ind-spill").toString
    def run(mat: Option[String]): Set[Long] =
      IncrementalNearDedup.survivors(delta,
          IncrementalNearDedup.bandTable(store),
          IncrementalNearDedup.shingleSets(store),
          materializeDir = mat)
        .select($"doc_id").as[Long].collect().toSet
    val spilled = run(Some(dir))
    // the tables actually landed on disk, under a per-invocation
    // run-<token>/ subdir (two runs sharing the dir must not collide)
    val runDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("run-"))
    assert(runDirs.length === 1)
    assert(new java.io.File(runDirs.head, "bands").exists()
      && new java.io.File(runDirs.head, "sets").exists())
    assert(spilled === run(None))
    // a second spilled invocation gets its OWN subdir — no overwrite
    assert(spilled === run(Some(dir)))
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("run-")) === 2)
  }
}
