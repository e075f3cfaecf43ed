package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout behavior: hive-style partitioned writes, static
  * partition pruning (filters become PartitionFilters, non-matching
  * directories never read), and dynamic partition pruning from a
  * selective dim-side filter. */
class LayoutSpec extends AnyFunSuite with SparkSpec {

  private val sf =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata") + "/sf0.001"

  test("partitionBy write + static partition pruning") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)

    val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("event_type=")))

    val q = spark.read.parquet(tmp).filter($"event_type" === "click")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"),
      s"partition filter must be pushed:\n$scan")
    val expected = Tables.events(spark, sf)
      .filter($"event_type" === "click").count()
    assert(q.count() == expected)
  }

  test("dynamic partition pruning from a dim-side filter") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    // fact partitioned by k, dim maps k -> name; filter on dim.name.
    // Identical key types on both sides — a cast around the partition
    // key blocks the PartitionPruning rule.
    (1 to 10000).map(i => (i.toLong, s"k${i % 20}")).toDF("v", "k")
      .write.mode("overwrite").partitionBy("k").parquet(s"$tmp/fact")
    // dim must be file-backed: a LocalRelation would constant-fold the
    // selective filter away and PartitionPruning would not see it
    (0 until 20).map(i => (s"k$i", s"name$i")).toDF("k", "name")
      .write.mode("overwrite").parquet(s"$tmp/dim")
    val dim = spark.read.parquet(s"$tmp/dim")

    // at test sizes the cost heuristic would skip DPP; force the
    // benefit estimate to rely on the fallback ratio
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    try {
      val fact = spark.read.parquet(s"$tmp/fact")
      val q = fact.join(dim, Seq("k")).filter($"name" === "name3")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected dynamic partition pruning:\n$plan")
      assert(q.count() == 500) // 10000 / 20
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }
}
