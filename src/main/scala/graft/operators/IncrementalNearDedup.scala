package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental NEAR-dup dedup — the day-over-day counterpart of the
  * full MinHash+LSH recompute (q42), completing the incremental
  * quadrant: exact/batch (q40), exact/incremental (q100 +
  * [[BloomAntiJoin]]), near-dup/streaming (the banded SimHash
  * suppressor in `streaming/StreamingOps`), near-dup/batch-incremental
  * (this). The production shape at 100 TB: each crawl snapshot checks
  * against the HISTORICAL index's slim LSH band store instead of
  * re-clustering all history (reference has no dedup at all — its only
  * dup handling is an assertion, `transforms/AppProfiles.java:50-56`;
  * this is the standard re-ingest pipeline from public MinHashLSH
  * practice).
  *
  * Store = two slim tables the caller persists and appends to after
  * each ingest:
  *  - [[bandTable]] `(id, band, bv)` — 8 LSH band digests per doc
  *    (identical banding to q42: b=8 × r=3 over the k=24
  *    `minhash_sig`), ~50 bytes/doc/band;
  *  - [[shingleSets]] `(id, n, hset)` — hashed 3-shingle arrays for
  *    exact verification (only candidate-matched store docs' rows
  *    ever move — fetched by id equi-join, never scanned whole).
  *
  * Contract (batch-equivalent, transitive): a delta doc survives iff
  * its connected component in the verified near-dup pair graph
  * (delta↔delta and delta↔store edges, exact Jaccard ≥ t over
  * distinct 3-word shingles) contains NO store doc, and it is the
  * minimum-id delta doc of that component. This matches what the
  * full-batch pipeline (pairs → [[ConnectedComponents]] → min-id
  * canonical) would decide for the delta docs, including chains: if
  * d₁ ~ d₂ and d₂ ~ store, BOTH are suppressed — a direct-match-only
  * rule would wrongly keep d₁. Store↔store edges are irrelevant (the
  * store is already deduped; its docs are canonical by definition).
  *
  * Ids must be unique across store ∪ delta (distinct ingest batches
  * have distinct ids by construction). Docs under 3 words carry no
  * shingles, generate no candidates, and trivially survive — exact
  * short-text dups are q100's job.
  *
  * 100 TB plan shape: candidates come from `(band, bv)` equi-joins
  * (per-bucket shuffle, never per-pair); verification joins move only
  * candidate ids + their two hset arrays; component labeling is
  * O(log diameter) rounds over the verified PAIRS (bounded by the
  * near-dup structure, not the corpus). No cartesian, no driver-side
  * data. */
object IncrementalNearDedup {

  /** q42's banding, factored: 8 digests over consecutive r=3 slices
    * of the k=24 minhash signature. */
  private[graft] def bandDigests(sig: Column): Column =
    transform(sequence(lit(0), lit(7)), b =>
      md5(concat_ws(",", transform(slice(sig, b * 3 + 1, lit(3)),
        x => x.cast("string")))))

  private def shingled(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    docs.filter(size(split(trim(col(textCol)), "\\s+")) >= 3)
      .select(col(idCol).as("id"),
        expr(s"word_shingles($textCol, 3)").as("sset"),
        expr(s"word_shingle_hashes($textCol, 3)").as("hset"))
  }

  /** `(id, band, bv)` — the persistable LSH band-bucket table. */
  def bandTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    shingled(docs, idCol, textCol)
      .select(col("id"), posexplode(bandDigests(expr("minhash_sig(sset)"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")

  /** `(id, n, hset)` — the persistable verification table. */
  def shingleSets(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    shingled(docs, idCol, textCol)
      .select(col("id"), size(col("hset")).as("n"), col("hset"))

  /** Exact-Jaccard verification of candidate id pairs against the two
    * sets tables: row-local `array_intersect`, candidates + two
    * id-keyed fetches — nothing re-explodes. */
  private def verified(cand: DataFrame, leftSets: DataFrame,
      rightSets: DataFrame, t: Double): DataFrame =
    cand
      .join(leftSets.select(col("id").as("lid"), col("n").as("nl"),
        col("hset").as("hl")), Seq("lid"))
      .join(rightSets.select(col("id").as("rid"), col("n").as("nr"),
        col("hset").as("hr")), Seq("rid"))
      .withColumn("c", size(array_intersect(col("hl"), col("hr"))))
      .filter(col("c").cast("double") / (col("nl") + col("nr") - col("c")) >= t)
      .select(col("lid"), col("rid"))

  /** Delta rows that survive near-dup suppression against the store
    * and within the delta (see object scaladoc for the contract).
    *
    * Hot-bucket guard (round 6): a (band, bv) bucket whose COMBINED
    * delta + store occupancy exceeds `maxBucket` is skipped by both
    * candidate joins — what detonates the delta↔store join is the
    * product of the two sides' widths, so the guard caps their sum
    * (which bounds the product at (cap/2)²). Recall contract — a pair
    * is lost only when every shared band is hot, i.e. only inside
    * ≥ cap-sized boilerplate families — and the division of labor
    * with exact dedup / boilerplate detection: [[LshGuard]].
    *
    * `materializeDir` (round 6): the band and shingle-set tables are
    * read by several joins, so by default they `cache()` in executor
    * storage — right for the day-over-day DELTA this operator is named
    * for, wrong when a caller (e.g. [[graft.jobs.CurationJob]]'s
    * full-corpus pass) hands it the whole corpus: corpus-scale shingle
    * sets would pin/spill executor storage. Passing a directory
    * materializes both tables as parquet there instead (the CsvSource
    * spill precedent): distributed-FS-backed, O(1) executor memory at
    * any corpus size, re-read per join with scan-time pruning. The
    * caller owns the directory's lifecycle; each invocation spills
    * under its own `run-<unique>/` subdirectory, so two concurrent
    * runs (or a retry racing a straggling consumer scan of the prior
    * attempt) sharing `materializeDir` can never overwrite each
    * other's parquet between a downstream join's scans. */
  def survivors(delta: DataFrame, storeBands: DataFrame, storeSets: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      t: Double = 0.6,
      maxBucket: Int = LshGuard.DefaultMaxBucket,
      materializeDir: Option[String] = None): DataFrame = {
    val spark = delta.sparkSession
    val persist: (DataFrame, String) => DataFrame = materializeDir match {
      case Some(dir) =>
        // per-invocation token: the spilled tables are re-read LAZILY
        // by several downstream joins, so a fixed subpath would let a
        // second run's overwrite change this run's parquet between two
        // consumers' scans — silently altering survivors
        val run = java.util.UUID.randomUUID().toString.take(8)
        (df, name) => {
          val path = s"$dir/run-$run/$name"
          df.write.mode("overwrite").parquet(path)
          spark.read.parquet(path)
        }
      case None => (df, _) => df.cache()
    }
    val dBands0 = bandTable(delta, idCol, textCol)
    val sBands = storeBands.select(col("band"), col("bv"), col("id"))
    val hot = LshGuard.hotBuckets(
      dBands0.select(col("band"), col("bv"))
        .unionByName(sBands.select(col("band"), col("bv"))), maxBucket)
    val dBands = persist(LshGuard.prune(dBands0, hot), "bands")
    val dSets = persist(shingleSets(delta, idCol, textCol), "sets")

    val candStore = dBands
      .join(LshGuard.prune(sBands, hot).withColumnRenamed("id", "rid"),
        Seq("band", "bv"))
      .select(col("id").as("lid"), col("rid")).distinct()
    val candDelta = dBands.as("a")
      .join(dBands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("lid"), col("b.id").as("rid")).distinct()

    val storeEdges = verified(candStore, dSets, storeSets, t)
    val deltaEdges = verified(candDelta, dSets, dSets, t)
    val edges = storeEdges.unionByName(deltaEdges).cache()

    // transitive closure over the verified pairs; a component is
    // poisoned iff any member id belongs to the store. label() is
    // EAGER (its rounds run now) and returns a localCheckpoint-backed
    // frame, so once it returns the three caches above have served
    // every reader — unpersist here, not at session end: the
    // documented shape is a day-over-day re-ingest LOOP, and leaked
    // per-call caches would accumulate in executor storage across it.
    // (labels' ids are exactly the edge-touched nodes, so edges isn't
    // needed again either.)
    val labels = ConnectedComponents.label(edges)
    edges.unpersist(); dBands.unpersist(); dSets.unpersist()
    val storeIds = storeSets.select(col("id"))
    val poisoned = labels.join(storeIds, Seq("id"), "left_semi")
      .select(col("component")).distinct()
    val deltaLabels = labels.join(storeIds, Seq("id"), "left_anti")
    val keptClustered = deltaLabels
      .join(poisoned, Seq("component"), "left_anti")
      .groupBy(col("component")).agg(min(col("id")).as("id"))
      .select(col("id"))
    // docs in no verified pair never enter the graph — they survive
    // (labels holds every edge-touched id, checkpoint-backed — using
    // it instead of edges lets the edge cache release above)
    val edgeIds = labels.select(col("id"))
    val untouched = delta.select(col(idCol).as("id"))
      .join(edgeIds, Seq("id"), "left_anti")

    val kept = untouched.unionByName(keptClustered)
      .withColumnRenamed("id", idCol)
    delta.join(kept, Seq(idCol), "left_semi")
  }
}
