package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.BroadcastGuard]] and its q78/q110 wiring — the
  * VERDICT-r8 #1 hardening: survivor selection used to FORCE-broadcast
  * the near-dup cluster slice on the documented assumption that dups
  * are a sliver of the corpus. This spec plants the corpus that breaks
  * that assumption (majority of docs in one near-dup family — the raw
  * web-crawl regime) and proves, with the auto-broadcast thresholds
  * disabled so the planner can't mask a dropped hint:
  *
  *  - under a cap smaller than the cluster table, NO broadcast appears
  *    in the executed plan (the shuffled-join fallback fired);
  *  - with the default cap, the broadcast plan is back;
  *  - both plans return IDENTICAL rows — the guard changes join
  *    physics, never results.
  */
class SurvivorGuardSpec extends AnyFunSuite with SparkSpec {

  /** 30 of 40 docs are one exact-dup family (Jaccard 1 ≥ 0.6 → one
    * 30-member cluster); 10 are unique singletons. */
  private lazy val sfDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("guard-sf").toString
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = (1 to 30).map { i =>
      Row(i.toLong, dupText, "en", "crawl", dupText.length.toLong)
    } ++ (31 to 40).map { i =>
      val t = s"unique$i solitary$i word$i token$i extra$i tail$i"
      Row(i.toLong, t, "en", "crawl", t.length.toLong)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Run a registered query over the planted corpus and return
    * (sorted result rows, executed-plan string AFTER execution — the
    * AQE-final plan, so a runtime broadcast conversion would show). */
  private def run(name: String): (Seq[String], String) = {
    val df = QueryRegistry.byName(name).fn(spark, sfDir)
    val rows = df.collect().map(_.toString).sorted.toSeq
    (rows, df.queryExecution.executedPlan.toString)
  }

  private def check(name: String): Unit = {
    // disable planner/AQE auto-broadcast so the ONLY possible source
    // of a broadcast join is the guard's explicit hint
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val (big, bigPlan) = withCapped("1000000")(run(name))
      assert(bigPlan.contains("BroadcastExchange"),
        s"$name under the default cap must broadcast the cluster slice:\n$bigPlan")
      val (small, smallPlan) = withCapped("10")(run(name))
      assert(!smallPlan.contains("BroadcastExchange"),
        s"$name past the cap must fall back to shuffled joins:\n$smallPlan")
      assert(small === big,
        s"$name: guard fallback changed the result")
      assert(big.size === 11, // 1 family winner + 10 singletons
        s"$name: expected 11 survivors, got ${big.size}")
    }
  }

  private def withCapped[A](cap: String)(body: => A): A = {
    spark.conf.set("graft.maxBroadcastRows", cap)
    try body finally spark.conf.unset("graft.maxBroadcastRows")
  }

  test("q78: majority-dup corpus trips the fallback; results unchanged") {
    check("q78_dedup_prune")
  }

  test("q110: majority-dup corpus trips the fallback; results unchanged") {
    check("q110_dedup_keep_longest")
  }

  test("maybeBroadcast hints under the cap, passes through past it") {
    import graft.operators.BroadcastGuard
    val df = spark.range(100).toDF("id")
    withCapped("1000") {
      val hinted = BroadcastGuard.maybeBroadcast(df, "small side")
      assert(hinted.queryExecution.logical.toString.contains("broadcast"),
        "under the cap the frame must carry the broadcast hint")
    }
    withCapped("10") {
      val plain = BroadcastGuard.maybeBroadcast(df, "big side")
      assert(!plain.queryExecution.logical.toString.contains("broadcast"),
        "past the cap the frame must be unhinted")
    }
  }
}
