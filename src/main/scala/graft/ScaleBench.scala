package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling measurement harness: materializes a ×10 replica of an SF
  * dir (key-shifted copies, so joins/groupings see 10× keys, not 10×
  * rows per key) and times representative queries at both scales.
  * Converts the plan-level "should scale" claims into measured data —
  * a query whose runtime grows ≫ 10× when the data grows 10× has a
  * super-linear stage to explain.
  *
  * Replication semantics (the point is REALISTIC growth):
  *  - every entity key (custkey/orderkey/partkey/suppkey/user_id/
  *    doc_id/vec_id and the FKs that reference them) shifts by
  *    copy·10⁹, so copy i is a disjoint universe — key cardinality
  *    grows 10×, per-key row counts stay fixed (what real corpus
  *    growth looks like for these tables);
  *  - every TOKEN of `documents.text` gets a copy-marker prefix
  *    (an injective per-copy renaming), so copies share NO shingles:
  *    within-copy near-dup structure is preserved exactly (pairs
  *    grow ~10×) and per-shingle document frequency matches the
  *    original corpus. A single prefixed marker token was tried
  *    first and is NOT enough — it leaves cross-copy Jaccard at
  *    s/(s+2) ≥ 0.6, which silently measures duplication-factor
  *    growth (quadratic pairs, ~10× df) instead of corpus growth;
  *  - dims `nation`/`region` stay fixed (genuinely bounded tables).
  *
  * Usage: `runMain graft.ScaleBench` (env `SPARK_GRAFT_SF_DIR`
  * defaults to /root/testdata/sf0.1; the replica lands under
  * target/scale10 and is reused if present). Prints one JSON line
  * per query with both times and the ratio; SCALING.md records the
  * analyzed results.
  */
object ScaleBench {

  private val Shift = 1000000000L

  /** Materialize a ×`copies` replica of `src` under `dst` (also used
    * by ScaleCheckSpec's CI growth guard). `tables` restricts the
    * build to a subset (plus the fixed dims when they're requested) —
    * the ×100 family runs need only `documents`, and replicating
    * lineitem ×100 alongside would dominate the build for nothing. */
  private[graft] def replicate(spark: SparkSession, src: String, dst: String,
      copies: Int, tables: Option[Set[String]] = None): Unit = {
    require(copies >= 1 && copies.toLong * Shift < Long.MaxValue / 4,
      s"copies out of range: $copies")
    val shifted: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    for ((table, keys) <- shifted if tables.forall(_.contains(table))) {
      val base =
        if (table == "events") {
          // copy the ts column in its source encoding untouched: with
          // nanosAsLong a TIMESTAMP(NANOS) column reads as plain long
          // and writes back as int64 (avoiding a lossy micros
          // round-trip), while a TIMESTAMP(MICROS) column reads and
          // writes natively — Tables.events handles either encoding
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$src/events.parquet")
        } else spark.read.parquet(s"$src/$table.parquet")
      val allCopies = (0 until copies).map { i =>
        val k = keys.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(i * Shift)))
        if (table == "documents")
          k.withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"c$i$$1"))
            // keep the byte-stats column faithful to the renamed text
            .withColumn("n_chars", length(col("text")).cast("long"))
        else k
      }
      allCopies.reduce(_ union _).write.mode("overwrite")
        .parquet(s"$dst/$table.parquet")
      println(s"SCALE replicated $table x$copies")
    }
    for (t <- Seq("nation", "region") if tables.forall(_.contains(t)))
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
  }

  /** Linear-expectation probe set: the relational/window/text core
    * plus the dedup candidates. Excluded by design: q45/q46/q47 (the
    * ANN query SET is defined as 2% of the corpus, so total work is
    * quadratic in corpus size by construction — scaling them means
    * fixing |Q|, a different experiment), the cosine family
    * q44/q144/q145 (fixed-config SRP banding carries an n²/2^bits
    * chance-candidate term by construction; its scale path is the
    * `graft.cos.bits`/`graft.cos.tables` conf pair sized from the
    * executable miss budget — SCALING.md's round-11 section and
    * DedupPairsSpec pin that instead of a growth ratio), and
    * sub-second queries whose times are all scheduling overhead. */
  private val probes = Seq(
    "q01_pricing_summary", "q03_profile_merge", "q05_distinct_counts",
    "q12_star_join_revenue", "q21_window_running", "q26_interval_join",
    "q27_asof_join", "q30_sessionize", "q40_dedup_exact",
    "q41_dedup_jaccard", "q42_dedup_minhash_lsh", "q53_fingerprint",
    "q58_batched_inference", "q67_tfidf", "q71_repeated_spans",
    "q95_boilerplate_fraction", "q100_incremental_dedup",
    "q105_heavy_hitters", "q107_temperature_mix",
    "q110_dedup_keep_longest", "q111_token_budget_pack",
    "q112_decontam_report", "q113_embedding_center_stats",
    "q114_dataset_card", "q116_containment_dedup",
    // round 11: the third-decade (~sf10) family runs — incremental
    // containment + the multimodal phash pipeline
    "q118_incremental_containment", "q139_mm_phash_sig",
    "q140_mm_phash_neardup", "q142_mm_phash_incremental",
    // round 14: the text-index lifecycle (append is the linear
    // tokenize pass; the probe reads the 3 derived terms' postings).
    // q147/q148 are EXCLUDED for the q44-oracle reason: their sampled
    // codebook is a corpus slice (vec_id % 25), so encode work grows
    // n²/25 BY CONSTRUCTION — measured ratio 14.6 on ×10 data, the
    // honest cost of a DuckDB-reproducible codebook, not of PQ. The
    // production path (ProductQuantizer.train) fixes |codebook|, so
    // encode/ADC are linear in the corpus; PLANS.md pins the bounded
    // rank exchange (WindowGroupLimit) that keeps the probe's only
    // shuffle at ≤ |Q|·topK·partitions rows.
    "q149_bm25_store_topk")

  private def time(spark: SparkSession, name: String, d: String): Double = {
    val t0 = System.nanoTime
    QueryRegistry.byName(name).fn(spark, d).write
      .mode("overwrite").format("noop").save()
    (System.nanoTime - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scalebench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.ensureRegistered(spark)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val big = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", s"target/scale$copies")
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").toSet)
    val run = only.fold(probes)(f => probes.filter(f))
    // fail BEFORE the (expensive) replica build, naming the valid set
    // — a typo'd filter would otherwise burn the build and then crash
    // the median index on an empty run
    require(run.nonEmpty, "SPARK_GRAFT_SCALE_ONLY matched no probe query; " +
      s"valid names: ${probes.mkString(", ")}")
    // SPARK_GRAFT_SCALE_TABLES=documents[,…] builds a family-scoped
    // replica; presence is checked for EVERY requested table — a
    // later run that widens the list must trigger a (re)build, not
    // skip on the first table's leftovers and crash mid-probe
    val tableList = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).toSeq)
    val tableFilter = tableList.map(_.toSet)
    val needed = tableList.getOrElse(Seq("lineitem"))
    if (!needed.forall(t => new java.io.File(s"$big/$t.parquet").exists()))
      replicate(spark, base, big, copies, tableFilter)
    // warm-up pass at the small scale (JIT + file listing)
    run.foreach(q => time(spark, q, base))
    val rows = run.map { q =>
      val tSmall = (1 to 3).map(_ => time(spark, q, base)).min
      val tBig = (1 to 3).map(_ => time(spark, q, big)).min
      val r = tBig / tSmall
      println(f"""{"query":"$q","small_s":$tSmall%.2f,"x${copies}_s":$tBig%.2f,"ratio":$r%.1f}""")
      (q, tSmall, tBig, r)
    }
    val med = rows.map(_._4).sorted.apply(rows.size / 2)
    println(f"""{"metric":"scale${copies}_median_ratio","value":$med%.2f,"queries":${rows.size}}""")
    spark.stop()
  }
}
