package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** q117's automatic exact→approx percentile switch (round 9, VERDICT
  * r8 #7): the exact `percentile` aggregate holds a per-group
  * distinct-value count map — right for per-source profiling, a
  * memory foot-gun if one source grows corpus-sized. The query now
  * sizes the largest group first and flips to the bounded
  * `approx_percentile` sketch past `graft.exactPercentileMaxGroup`.
  * Pins: which aggregate each mode plans, schema stability across the
  * flip, and exact-mode parity at gate scale (the oracle is only ever
  * compared against the exact path).
  */
class Q117FallbackSpec extends AnyFunSuite with SparkSpec {

  private lazy val sfDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("q117-sf").toString
    val rows = (1 to 40).map { i =>
      val t = (1 to (i % 7) + 2).map(j => s"w$j").mkString(" ")
      Row(i.toLong, t, "en", if (i % 2 == 0) "web" else "books", t.length.toLong)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def planOf(cap: Option[String]): (String, org.apache.spark.sql.DataFrame) = {
    cap.foreach(spark.conf.set("graft.exactPercentileMaxGroup", _))
    try {
      val df = QueryRegistry.byName("q117_slice_length_profile").fn(spark, sfDir)
      (df.queryExecution.analyzed.toString, df)
    } finally spark.conf.unset("graft.exactPercentileMaxGroup")
  }

  test("default cap plans the exact percentile") {
    val (plan, df) = planOf(None)
    assert(plan.contains("percentile(") && !plan.contains("approx_percentile"),
      s"expected exact percentile in:\n$plan")
    assert(df.count() === 2)
  }

  test("a group past the cap flips to approx_percentile, schema unchanged") {
    val (exactPlan, exactDf) = planOf(None)
    val (plan, df) = planOf(Some("10")) // both sources hold 20 docs > 10
    assert(plan.contains("approx_percentile"),
      s"expected approx_percentile in:\n$plan")
    assert(df.schema === exactDf.schema,
      "the mode flip must not drift the output schema")
    val rows = df.collect()
    assert(rows.length === 2)
    // sketch answers are real data values — sane, not garbage
    rows.foreach { r =>
      val p50 = r.getAs[Double]("p50_tokens")
      val p90 = r.getAs[Double]("p90_tokens")
      assert(p50 >= 2.0 && p90 <= 8.0 && p50 <= p90, r.toString)
    }
    assert(exactPlan.contains("percentile(") && !exactPlan.contains("approx_percentile"))
  }

  test("empty corpus takes the exact path without throwing") {
    val dir = java.nio.file.Files.createTempDirectory("q117-empty").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = QueryRegistry.byName("q117_slice_length_profile").fn(spark, dir)
    assert(df.count() === 0)
  }
}
