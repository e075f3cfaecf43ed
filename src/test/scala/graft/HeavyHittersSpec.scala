package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters
import graft.operators.HeavyHitters.{MisraGries, Summary}

/** HeavyHitters: the distributed result equals brute force for every
  * theta tried; the Misra–Gries summary's superset guarantee holds
  * under arbitrary stream splits and merge orders (the property the
  * distributed partial/merge execution relies on); edges (empty,
  * all-distinct, single-token) behave. */
class HeavyHittersSpec extends AnyFunSuite with SparkSpec {

  private def bruteForce(tokens: Seq[String], theta: Double): Map[String, Long] = {
    val n = tokens.size
    val t = math.max(1L, math.ceil(theta * n).toLong)
    tokens.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= t).toMap
  }

  private def viaSpark(tokens: Seq[String], theta: Double): Map[String, Long] = {
    val s = spark
    import s.implicits._
    val ds = s.createDataset(tokens).repartition(7) // force multi-partition partials
    HeavyHitters.exactAbove(ds, theta)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  // deterministic corpus: Zipf-ish head + long unique tail
  private def corpus(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.30) "the"
      else if (r < 0.45) "of"
      else if (r < 0.55) "and"
      else if (r < 0.60) s"w${rnd.nextInt(20)}"
      else s"u${rnd.nextInt(1000000)}" // effectively unique tail
    }
  }

  test("exactAbove equals brute force across thetas and corpora") {
    for (seed <- Seq(1, 2); theta <- Seq(0.5, 0.1, 0.02, 0.002)) {
      val toks = corpus(seed, 5000)
      assert(viaSpark(toks, theta) === bruteForce(toks, theta),
        s"seed=$seed theta=$theta")
    }
  }

  test("all-distinct corpus: nothing qualifies once n exceeds 1/theta") {
    val toks = (1 to 3000).map(i => s"tok$i")
    assert(viaSpark(toks, 0.01) === Map.empty)
  }

  test("single repeated token and tiny corpora stay exact") {
    assert(viaSpark(Seq.fill(500)("x"), 0.002) === Map("x" -> 500L))
    assert(viaSpark(Seq("a", "b", "a"), 0.5) === Map("a" -> 2L))
    // n <= k: the summary is exact, every token meets t = ceil(theta*n)
    assert(viaSpark(Seq("a", "b"), 0.002) === Map("a" -> 1L, "b" -> 1L))
  }

  test("null tokens are skipped by the summary, not counted or crashed on") {
    val mg = new MisraGries(4)
    val s = Seq("a", null, "a", null, "b").foldLeft(mg.zero)(mg.reduce)
    assert(s.counts === Map("a" -> 2L, "b" -> 1L))
  }

  test("empty input yields an empty frame with the (tok, cnt) schema") {
    val s = spark
    import s.implicits._
    val out = HeavyHitters.exactAbove(s.emptyDataset[String], 0.01)
    assert(out.columns.toSeq === Seq("tok", "cnt"))
    assert(out.count() === 0L)
  }

  test("per-group variant: each group thresholds on its OWN total; null groups excluded") {
    val s = spark
    import s.implicits._
    // group a: 100 tokens, "hot" 40× (40%), tail unique
    // group b: 10 tokens, "warm" 3× (30%) — would miss a corpus-wide
    //          threshold but must clear its own
    val rows =
      (Seq.fill(40)("hot") ++ (1 to 60).map(i => s"ua$i")).map(("a", _)) ++
      (Seq.fill(3)("warm") ++ (1 to 7).map(i => s"ub$i")).map(("b", _)) ++
      Seq((null.asInstanceOf[String], "hot"), (null.asInstanceOf[String], "hot"))
    val df = s.createDataset(rows).toDF("grp", "tok").repartition(5)
    val got = graft.operators.HeavyHitters
      .exactAbovePerGroup(df, "grp", "tok", theta = 0.25)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("a", "hot", 40L), ("b", "warm", 3L)))
  }

  test("MG superset guarantee survives arbitrary splits and merge orders") {
    // pure-JVM check of the law the distributed execution depends on:
    // for ANY partition of the stream into runs and ANY binary merge
    // tree over the run summaries, every token with count > N/(k+1)
    // is present in the final summary
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val k = 1 + rnd.nextInt(12)
      val mg = new MisraGries(k)
      val n = 200 + rnd.nextInt(800)
      val toks = (0 until n).map(_ => s"t${rnd.nextInt(1 + rnd.nextInt(40))}")
      // random split into 1..8 runs
      val runs = toks.grouped(1 + rnd.nextInt(math.max(1, n / 4))).toVector
      val partials = runs.map(_.foldLeft(mg.zero)(mg.reduce))
      // random-order left fold = one arbitrary merge tree
      val merged = rnd.shuffle(partials).foldLeft(mg.zero)(mg.merge)
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val mustSurvive = exact.filter(_._2 > n.toDouble / (k + 1)).keySet
      val missing = mustSurvive -- merged.counts.keySet
      assert(missing.isEmpty,
        s"trial=$trial k=$k n=$n lost guaranteed hitters: $missing")
      assert(merged.counts.size <= k, s"summary exceeded k: ${merged.counts.size} > $k")
      // MG counts never overestimate
      merged.counts.foreach { case (t, c) =>
        assert(c <= exact(t), s"overestimate for $t: $c > ${exact(t)}")
      }
    }
  }

  test("summary stays within k entries under decrement pressure") {
    val mg = new MisraGries(3)
    val stream = (1 to 1000).map(i => s"t${i % 17}")
    val s = stream.foldLeft(mg.zero)(mg.reduce)
    assert(s.counts.size <= 3)
    val merged = mg.merge(s, Summary(Map("a" -> 5L, "b" -> 4L, "c" -> 3L)))
    assert(merged.counts.size <= 3)
  }
}
