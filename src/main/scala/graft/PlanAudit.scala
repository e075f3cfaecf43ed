package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- Seq("q01_pricing_summary", "q12_star_join_revenue", "q09_semi_join",
        "q02_validity_filter", "q27_asof_join", "q45_ann_bruteforce",
        "q05_distinct_counts", "q26_interval_join", "q42_dedup_minhash_lsh",
        "q67_tfidf", "q66_grouping_sets", "q74_session_window",
        "q32_distribution_ranks",
        "q41_dedup_jaccard", "q43_dedup_simhash", "q44_dedup_cosine",
        "q71_repeated_spans", "q88_skewed_enrich",
        "q89_bucketed_distinct_counts", "q100_incremental_dedup")) {
      println(s"===== $name")
      val plan = QueryRegistry.byName(name).fn(s, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // q100's plan embeds the Bloom bitset as a BinaryType literal —
      // keep the snapshot text-clean: non-printables → '·', runs collapsed
      println(plan.replaceAll("[^\\x09\\x0A\\x20-\\x7E]+", "·")
        .replaceAll("(·.{0,2}){8,}", "·<binary literal elided>·"))
    }
    s.stop()
  }
}
