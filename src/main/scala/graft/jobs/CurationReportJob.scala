package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The corpus data-quality DASHBOARD as one runnable unit
  * (`--job=curationReportJob`): every curation-policy report the
  * registry gates individually, computed over one corpus dir and
  * landed as one parquet dir per report —
  *
  *   cluster_sizes      q115  near-dup cluster histogram
  *   length_drift       q117  per-source token-length profile
  *   quality_cut_curve  q124  decile cost of each quality threshold
  *   dup_source_matrix  q125  who-mirrors-whom attribution
  *   split_leakage      q127  near-dup pairs straddling train/test
  *   gopher_pass        rollup of q120 (per-source pass rate)
  *   compression_hist   rollup of q128 (deflate-ratio histogram)
  *
  * The per-doc batteries (q120, q128) are rolled up HERE rather than
  * dumped raw: a dashboard reads O(sources)/O(buckets) rows, and the
  * corpus-sized per-doc frames already exist as gated queries for
  * anyone who wants them. Reports reuse the REGISTRY functions
  * directly (one code path — the job cannot drift from what the
  * gate checks), so `inputDir` follows the same contract: a dir
  * holding `documents.parquet`.
  *
  * Scale shape: each report is its gated query's plan (all
  * individually plan-audited); every output is ≤ O(sources + buckets
  * + sources²) rows, so the single-file coalesce on the WRITE side
  * is a convenience, not a bottleneck — the corpus never funnels
  * through one task. Returns report → row count (the scalar summary
  * the caller logs/asserts). */
object CurationReportJob {

  def run(spark: SparkSession, inputDir: String, outDir: String): Map[String, Long] = {
    import graft.queries.{DedupQueries => DQ, SplitRule}
    def q(name: String): DataFrame =
      graft.QueryRegistry.byName(name).fn(spark, inputDir)

    // The near-dup PAIR table is the dominant cost of three reports
    // (cluster_sizes / dup_source_matrix / split_leakage all consume
    // it). Build the shared jaccardPairs pipeline ONCE, materialize
    // it (the pair table is bounded by the true dup population —
    // small; the pipeline behind it is shingle-join-sized — big), and
    // feed all three rollups from the cache: the shingle pipeline
    // runs 1×, not 3×. The rollup fns are the registry queries' own
    // (`DQ.clusterSizesFrom` etc.), so job and gate cannot drift.
    val pairs = DQ.jaccardPairs(spark, inputDir).cache()

    val gopherPass = {
      val src = graft.Tables.documents(spark, inputDir)
        .select(col("doc_id"), col("source"))
      q("q120_gopher_rules").join(src, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("passes_gopher"), 1L).otherwise(0L)).as("n_pass"),
          avg(col("mean_word_len")).as("avg_mean_word_len"),
          avg(col("alpha_word_frac")).as("avg_alpha_word_frac"))
        .withColumn("pass_rate",
          col("n_pass").cast("double") / col("n_docs"))
    }
    val compressionHist = q("q128_compression_ratio")
      .withColumn("bucket", expr("width_bucket(ratio, 0D, 1.5D, 15)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("ratio")).as("mean_ratio"),
        sum(col("raw_bytes")).as("raw_bytes"),
        sum(col("deflated_bytes")).as("deflated_bytes"))

    val docMeta = graft.Tables.documents(spark, inputDir)
    val reports: Seq[(String, DataFrame)] = Seq(
      "cluster_sizes" -> DQ.clusterSizesFrom(pairs),
      "length_drift" -> q("q117_slice_length_profile"),
      "quality_cut_curve" -> q("q124_quality_cut_curve"),
      "dup_source_matrix" -> DQ.dupSourceMatrixFrom(pairs,
        docMeta.select(col("doc_id"), col("source"))),
      "split_leakage" -> DQ.splitLeakageFrom(pairs,
        docMeta.select(col("doc_id"),
          SplitRule.assign(col("doc_id")).as("split"))),
      "gopher_pass" -> gopherPass,
      "compression_hist" -> compressionHist)

    try reports.map { case (name, df) =>
      val out = df.cache()
      try {
        out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        name -> out.count()
      } finally out.unpersist()
    }.toMap
    finally pairs.unpersist()
  }
}
