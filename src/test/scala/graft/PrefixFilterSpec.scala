package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 guarantee for the shared near-dup pair pipeline
  * (q41/q72/q77/q78): candidate generation is the PPJoin prefix
  * filter, not a naive postings self-join — and loses nothing.
  *
  *  - result parity: the prefix-filtered pipeline emits exactly the
  *    pairs of the naive full inverted-index formulation (the
  *    prefix-filtering theorem: J ≥ t ⇒ the two docs share an element
  *    of each other's rarity-ordered prefix);
  *  - candidate-count bound: the pair join consumes only prefix
  *    postings, so its candidate set is strictly smaller than the
  *    naive all-shared-shingle pair set on this fixture (on real web
  *    text the gap is the difference between Σ|prefix|·df and Σdf²);
  *  - plan shape: q41's plan carries the rarity-ranking Window — the
  *    naive pipeline had none, so its presence pins that the prefix
  *    projection feeds the join.
  */
class PrefixFilterSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"

  private def fixture(): Unit =
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf absent — skipping")

  /** The pre-round-4 naive pipeline, kept here as the spec reference:
    * postings self-join on every shingle (Σdf² work). */
  private def naivePairs(dir: String = sf): DataFrame = {
    import spark.implicits._
    GraftExtensions.ensureRegistered(spark)
    val ex = Tables.documents(spark, dir)
      .filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id", expr("word_shingles(text, 3)").as("sset"))
      .select($"doc_id", size($"sset").as("n"), explode($"sset").as("sh0"))
      .select($"doc_id", $"n", xxhash64($"sh0").as("sh"))
    ex.as("a").join(ex.as("b"),
        $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.n".as("na"), $"b.n".as("nb"))
      .agg(count(lit(1)).as("c"))
      .select($"doc_a", $"doc_b",
        ($"c".cast("double") / ($"na" + $"nb" - $"c")).as("jaccard"))
      .filter($"jaccard" >= 0.6)
  }

  test("prefix-filtered jaccardPairs equals the naive inverted-index result") {
    import spark.implicits._
    fixture()
    val got = queries.DedupQueries.jaccardPairs(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    val want = naivePairs().as[(Long, Long, Double)].collect().toSet
    assert(want.nonEmpty, "fixture should contain Jaccard near-dups")
    assert(got === want, "prefix filtering must lose (and invent) nothing")
  }

  /** The fixture corpus is PPJoin's WORST case (31-word vocabulary,
    * every shingle df ≥ 2, near-uniform lengths) — the pruning math
    * (plen, the df=1 global-rank offset `(n − n2) + r2`, positional
    * upper bounds) barely fires there. This fuzz builds corpora the
    * pruning actually cuts: Zipfian vocabulary (a genuine df=1 rare
    * tail), doc lengths 3–40 tokens, planted near-dup copies with
    * 0–3 token edits (straddling the 0.6 threshold both ways), and
    * asserts exact pair parity against the naive Σdf² reference.
    * Seeded — failures reproduce. */
  test("randomized corpora: prefix-filtered pairs equal naive pairs (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(7, 41, 1013)) {
      val rnd = new scala.util.Random(seed)
      val vocabN = 300
      def word(): String = { // Zipf-ish: rank r with weight ~ 1/(r+1)
        val u = rnd.nextDouble()
        val r = ((math.exp(u * math.log(vocabN + 1.0)) - 1.0)).toInt.min(vocabN - 1)
        s"w$r"
      }
      val base = (0 until 120).map { i =>
        val len = 3 + rnd.nextInt(38)
        (i.toLong, Seq.fill(len)(word()))
      }
      val editedCopies = base.filter(_ => rnd.nextDouble() < 0.3).map {
        case (id, toks) =>
          val edits = rnd.nextInt(4)
          val mutated = (0 until edits).foldLeft(toks) { (t, _) =>
            if (t.size > 3 && rnd.nextBoolean()) t.patch(rnd.nextInt(t.size), Nil, 1)
            else t.updated(rnd.nextInt(t.size), word())
          }
          (1000L + id, mutated)
      }
      val docs = (base ++ editedCopies).map { case (id, toks) =>
        val text = toks.mkString(" ")
        (id, text, "en", "fuzz", text.length.toLong)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"ppfuzz$seed").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = queries.DedupQueries.jaccardPairs(spark, dir)
        .as[(Long, Long, Double)].collect().toSet
      val want = naivePairs(dir).as[(Long, Long, Double)].collect().toSet
      assert(want.nonEmpty, s"seed $seed planted no near-dup pairs — weaken edits")
      assert(got === want,
        s"seed $seed: prefix filtering lost or invented pairs " +
          s"(got ${got.size}, want ${want.size})")
    }
  }

  test("prefix candidates are a strict subset of naive shared-shingle candidates") {
    import spark.implicits._
    fixture()
    val ex = Tables.documents(spark, sf)
      .filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id", expr("word_shingles(text, 3)").as("sset"))
      .select($"doc_id", size($"sset").as("n"), explode($"sset").as("sh0"))
      .select($"doc_id", $"n", xxhash64($"sh0").as("sh"))
      .cache()
    val naiveCand = ex.as("a").join(ex.as("b"),
        $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    val t = 0.6
    val dfreq = ex.groupBy($"sh").agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfreq, "sh")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"df".asc, $"sh".asc)))
      .withColumn("plen", $"n" - ceil(lit(t) * $"n").cast("int") + 1)
    val prefix = ranked.filter($"rn" <= $"plen").select($"doc_id", $"sh")
    val prefixCand = prefix.as("a").join(prefix.as("b"),
        $"a.sh" === $"b.sh" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    ex.unpersist()
    assert(prefixCand < naiveCand,
      s"prefix filter should shrink the candidate set ($prefixCand vs $naiveCand)")
    assert(prefixCand > 0)
  }

  test("q41's plan carries the rarity-ranking Window (prefix path, not naive join)") {
    fixture()
    val plan = QueryRegistry.byName("q41_dedup_jaccard").fn(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("row_number"),
      "expected the prefix row_number ranking in q41's plan")
  }
}
