package graft

/** PLANS.md generator: formatted physical plans of the representative
  * query set, via the shared audit harness (GRAFT_TESTDATA_DIR
  * honored). q100's plan embeds its Bloom bitset as a BinaryType
  * literal — the snapshot stays text-clean by collapsing
  * non-printables. */
object PlanAudit {
  private val snapshotSet = Seq(
    "q01_pricing_summary", "q12_star_join_revenue", "q09_semi_join",
    "q02_validity_filter", "q27_asof_join", "q45_ann_bruteforce",
    "q05_distinct_counts", "q26_interval_join", "q42_dedup_minhash_lsh",
    "q67_tfidf", "q66_grouping_sets", "q74_session_window",
    "q32_distribution_ranks",
    "q41_dedup_jaccard", "q43_dedup_simhash", "q44_dedup_cosine",
    "q71_repeated_spans", "q88_skewed_enrich",
    "q89_bucketed_distinct_counts", "q100_incremental_dedup",
    "q101_shuffle_index", "q102_snapshot_diff",
    "q103_partition_pruned_daily", "q105_heavy_hitters",
    "q107_temperature_mix", "q110_dedup_keep_longest",
    "q111_token_budget_pack", "q112_decontam_report",
    "q113_embedding_center_stats", "q114_dataset_card",
    "q116_containment_dedup", "q118_incremental_containment",
    "q143_incremental_containment_dfguard",
    "q140_mm_phash_neardup", "q142_mm_phash_incremental",
    "q144_cos_incremental")
  // q145/q146 are deliberately NOT snapshotted: both execute eagerly
  // (the CC label loop / the store build) and their registered frames
  // are checkpoint scans — the interesting plans are q44's pair join
  // (snapshotted) and IvfIndex.probeCells' pruned scan
  // (numFiles-asserted in IvfStoreSpec, which beats a plan string).

  def main(args: Array[String]): Unit =
    graft.tools.AuditRunner.run({ (q, qe) =>
      val plan = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      Seq(s"===== ${q.name}",
        plan.replaceAll("[^\\x09\\x0A\\x20-\\x7E]+", "·")
          .replaceAll("(·.{0,2}){8,}", "·<binary literal elided>·"))
    }, names = snapshotSet)
}
