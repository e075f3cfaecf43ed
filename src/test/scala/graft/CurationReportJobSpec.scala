package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.CurationReportJob

/** CurationReportJob: the dashboard outputs exist, read back, and
  * CROSS-CHECK the gated queries they claim to package — the job
  * reuses the registry functions, so any drift here means the
  * write/rollup seam broke, not the queries. */
class CurationReportJobSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every report lands, row counts match the registry queries, rollups are sane") {
    assume(new java.io.File(sf).isDirectory, s"fixture dir $sf absent")
    val out = Files.createTempDirectory("curation-report").toString
    val counts = CurationReportJob.run(spark, sf, out)

    val expectedDirect = Seq(
      "cluster_sizes" -> "q115_cluster_size_dist",
      "length_drift" -> "q117_slice_length_profile",
      "quality_cut_curve" -> "q124_quality_cut_curve",
      "dup_source_matrix" -> "q125_dup_source_matrix",
      "split_leakage" -> "q127_split_leakage")
    expectedDirect.foreach { case (report, qname) =>
      val direct = QueryRegistry.byName(qname).fn(spark, sf).count()
      assert(counts(report) === direct, report)
      val disk = spark.read.parquet(s"$out/$report").count()
      assert(disk === direct, s"$report read-back")
    }

    // gopher rollup: one row per source, pass counts bounded by docs
    val gp = spark.read.parquet(s"$out/gopher_pass")
    val nSources = Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(gp.count() === nSources)
    import org.apache.spark.sql.functions._
    val bad = gp.filter(col("n_pass") > col("n_docs") ||
      col("pass_rate") < 0 || col("pass_rate") > 1).count()
    assert(bad === 0L)
    // doc mass is conserved through the rollup
    val totalDocs = Tables.documents(spark, sf).count()
    assert(gp.agg(sum("n_docs")).head().getLong(0) === totalDocs)

    // compression histogram: conserves docs and raw byte mass
    val ch = spark.read.parquet(s"$out/compression_hist")
    assert(ch.agg(sum("n_docs")).head().getLong(0) === totalDocs)
    val rawDirect = QueryRegistry.byName("q128_compression_ratio").fn(spark, sf)
      .agg(sum("raw_bytes")).head().getLong(0)
    assert(ch.agg(sum("raw_bytes")).head().getLong(0) === rawDirect)
  }
}
