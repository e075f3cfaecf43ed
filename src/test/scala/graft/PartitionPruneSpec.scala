package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PartitionedLayout

/** PartitionedLayout: static partition pruning measured by FILES READ
  * (not just the plan string), dynamic partition overwrite leaving
  * sibling partitions byte-untouched, and day-zero totality. */
class PartitionPruneSpec extends AnyFunSuite with SparkSpec {

  private def layoutDf = {
    val s = spark
    import s.implicits._
    Seq(
      ("2024-01-01", "click", 1.0), ("2024-01-01", "view", 2.0),
      ("2024-01-02", "click", 3.0), ("2024-01-02", "buy", 4.0),
      ("2024-01-03", "view", 5.0))
      .toDF("dt", "event_type", "value")
      .withColumn("dt", to_date($"dt"))
  }

  private def partFiles(dir: String, dt: String): Seq[java.io.File] = {
    val d = new java.io.File(s"$dir/dt=$dt")
    if (!d.isDirectory) Nil
    else d.listFiles().filter(f => f.getName.startsWith("part-")).toSeq
  }

  test("a literal dt filter prunes other partitions' files out of the scan") {
    val out = Files.createTempDirectory("ppl-prune").toString
    PartitionedLayout.writePartitioned(layoutDf, out, Seq("dt"))
    val day = PartitionedLayout.read(spark, out, layoutDf.schema)
      .filter(col("dt") === lit("2024-01-02").cast("date"))
    val rows = day.collect() // execute so scan metrics are populated
    assert(rows.map(_.getAs[Double]("value")).sorted.toSeq === Seq(3.0, 4.0))
    val scans = day.queryExecution.executedPlan.collectLeaves()
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "dt predicate did not reach the file index as a partition filter")
    val expected = partFiles(out, "2024-01-02").size
    val total = Seq("2024-01-01", "2024-01-02", "2024-01-03")
      .map(partFiles(out, _).size).sum
    val read = scan.metrics("numFiles").value
    assert(read === expected.toLong,
      s"scan read $read files; the dt=2024-01-02 partition holds $expected")
    assert(expected < total, "fixture degenerate: only one partition materialized")
  }

  test("dynamic overwrite replaces exactly the incoming partitions") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("ppl-dyn").toString
    PartitionedLayout.writePartitioned(layoutDf, out, Seq("dt"))
    val day1Before = partFiles(out, "2024-01-01")
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    // backfill re-run of day 2 only
    val day2New = Seq(("2024-01-02", "click", 30.0))
      .toDF("dt", "event_type", "value").withColumn("dt", to_date($"dt"))
    PartitionedLayout.overwritePartitions(day2New, out, Seq("dt"))
    val day1After = partFiles(out, "2024-01-01")
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    assert(day1After === day1Before, "untouched partition was rewritten")
    val back = PartitionedLayout.read(spark, out, layoutDf.schema)
    assert(back.filter($"dt" === lit("2024-01-02").cast("date"))
      .select($"value").as[Double].collect().toSeq === Seq(30.0))
    assert(back.count() === 4L) // 2 (day1) + 1 (new day2) + 1 (day3)
    // static overwrite for contrast: the whole layout is replaced
    PartitionedLayout.writePartitioned(day2New, out, Seq("dt"))
    assert(PartitionedLayout.read(spark, out, layoutDf.schema).count() === 1L)
  }

  test("day-zero: an empty write yields a readable empty layout") {
    val out = Files.createTempDirectory("ppl-empty").toString
    PartitionedLayout.writePartitioned(layoutDf.limit(0), out, Seq("dt"))
    assert(PartitionedLayout.read(spark, out, layoutDf.schema).count() === 0L)
  }
}
