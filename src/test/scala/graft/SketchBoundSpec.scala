package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Raw sketch-error measurements behind the q07/q65/q85 bound
  * verdicts (round 4 — those rows went from `no_oracle` to
  * hash-checked by emitting exact anchors + a bound verdict the
  * oracle can assert; this spec keeps the raw sketch values in view
  * so a regression reports the actual error, not just a flipped
  * boolean).
  *
  * Measured on all three fixture SFs when the bounds were chosen:
  *  - q07 HLL++ rel err ≤ 2.7% (bound 5% = the default-rsd envelope)
  *  - q65 GK rel err ≤ 0.27% at accuracy 1000 (bound 1%)
  *  - q85 both sketches EXACT (vocab ≪ coupon threshold / capacity)
  */
class SketchBoundSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"

  private def fixture(): Unit =
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf absent — skipping")

  test("q07: HLL++ estimate within 5% of exact distinct (raw error reported)") {
    import spark.implicits._
    fixture()
    val rows = Tables.lineitem(spark, sf).groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("a"),
        countDistinct($"l_partkey").as("e"))
      .select($"l_returnflag", $"a", $"e",
        (abs($"a" - $"e") / $"e").as("rel"))
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, a, e, rel) =>
      assert(rel <= 0.05, s"flag $flag: hll=$a exact=$e rel=$rel > 5%")
    }
  }

  test("q65: GK approx percentiles within 1% of exact (raw errors reported)") {
    import spark.implicits._
    fixture()
    val rows = Tables.lineitem(spark, sf).groupBy($"l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 1000)").as("a"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.95)").as("e95"),
        expr("percentile(l_extendedprice, 0.99)").as("e99"))
      .select($"l_returnflag",
        (abs($"a" (0) - $"e50") / $"e50").as("r50"),
        (abs($"a" (1) - $"e95") / $"e95").as("r95"),
        (abs($"a" (2) - $"e99") / $"e99").as("r99"))
      .as[(String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, r50, r95, r99) =>
      assert(r50 <= 0.01 && r95 <= 0.01 && r99 <= 0.01,
        s"flag $flag: rel errs ($r50, $r95, $r99) exceed 1%")
    }
  }

  test("q85: HLL and top-k sketches are exact in this capacity regime") {
    import spark.implicits._
    fixture()
    val words = Tables.documents(spark, sf)
      .select($"lang", explode(split(trim($"text"), "\\s+")).as("word"))
    val sketch = words.groupBy($"lang")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(word, 14))").as("hll"),
        countDistinct($"word").as("exact"),
        reverse(array_sort(
          expr("transform(approx_top_k(word, 10, 50000), x -> x.count)"))).as("tkc"))
    val exactTk = words.groupBy($"lang", $"word").agg(count(lit(1)).as("cnt"))
      .groupBy($"lang")
      .agg(slice(reverse(array_sort(collect_list($"cnt"))), 1, 10).as("etk"))
    val rows = sketch.join(exactTk, "lang")
      .as[(String, Long, Long, Seq[Long], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, hll, exact, tkc, etk) =>
      assert(hll === exact, s"lang $lang: hll=$hll exact=$exact")
      assert(tkc === etk, s"lang $lang: sketch top-k counts $tkc != exact $etk")
    }
  }

  test("HLL sketches merge associatively: per-day union == whole-corpus sketch") {
    import spark.implicits._
    fixture()
    // the 100 TB incremental-distinct pattern (q90's monoid law for
    // sketches): persist per-day sketch BYTES, union day over day —
    // history is never recounted. Days = orderkey parity; the merged
    // estimate must equal the single-pass estimate EXACTLY (sketch
    // union is the same register-max fold) and sit within q07's 5%
    // envelope of exact.
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val whole = li
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").as("est"))
      .as[Long].head()
    val perDay = li.withColumn("day", $"l_orderkey" % 2)
      .groupBy($"day").agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
    val merged = perDay
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .as[Long].head()
    assert(merged === whole, s"union-of-days $merged != single-pass $whole")
    val exact = li.select(countDistinct($"l_partkey")).as[Long].head()
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"merged estimate $merged outside 5% of exact $exact")
  }

  test("registered q07/q65 bound verdicts are all true") {
    import spark.implicits._
    fixture()
    val q07 = QueryRegistry.byName("q07_approx_distinct").fn(spark, sf)
    assert(q07.filter(!$"hll_within_5pct").isEmpty)
    val q65 = QueryRegistry.byName("q65_approx_quantiles").fn(spark, sf)
    assert(q65.filter(!$"gk_within_1pct").isEmpty)
  }
}
