package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental ASYMMETRIC-containment dedup — q116's day-over-day
  * counterpart, closing the last cell of the incremental dedup matrix
  * (exact/batch q40, exact/incremental q100+[[BloomAntiJoin]],
  * near-dup/batch q41-q44, near-dup/incremental
  * [[IncrementalNearDedup]], containment/batch q116,
  * containment/incremental THIS). The case it exists for: a new
  * ingest quoting an archived doc whole — symmetric Jaccard misses it
  * structurally (a doc quoted inside a 10× host has J ≈ 0.1 at
  * containment 1.0), and a daily pipeline must catch it without
  * re-running the batch join over all history. (No analogue in the
  * reference — its only dup handling is an assertion,
  * `transforms/AppProfiles.java:50-56`; containment dedup is standard
  * large-corpus curation practice, generalized here from q116.)
  *
  * Definition: A is contained in B when |A∩B|/|A| ≥ t over distinct
  * 3-word shingle hashes (q116's statistic exactly).
  *
  * [[containedPairs]] returns EVERY containment pair touching the
  * delta, in both orientations:
  *  - delta doc contained in a store or delta doc (the new doc is
  *    redundant — candidate for suppression), and
  *  - store doc contained in a delta doc (the new doc swallowed an
  *    archived one — the archive entry is now the redundant copy;
  *    reported, never deleted here: the store is immutable history).
  * Store↔store pairs are deliberately absent — prior ingests already
  * reported them. That yields the exact-batch equivalence contract
  * (IncrementalContainmentSpec fuzzes it): containedPairs(delta,
  * store) ≡ the q116 batch join over store ∪ delta restricted to
  * pairs with a delta member.
  *
  * Candidate generation is q116's ONE-SIDED prefix filter
  * (`queries/DedupQueries.scala` q116): containment ≥ t means at most
  * ⌊(1−t)·n⌋ of the contained doc's n shingles miss the container, so
  * ANY fixed (⌊(1−t)·n⌋+1)-subset must pigeonhole a witness into the
  * container — the contained side carries only that prefix, the
  * container side full postings. Two deltas from the batch query,
  * both deliberate:
  *  - prefix order is the HASH order (`array_sort(hset)` head), not
  *    q116's global-rarity order: correctness needs any FIXED subset
  *    (rarity is purely a cost heuristic), and a rarity order would
  *    need a corpus-wide df aggregate per ingest — O(store) shuffle
  *    work for a constant-factor join saving;
  *  - no df ≥ 2 slice: that optimization also prices a full-store df
  *    count; recall is unaffected either way.
  *
  * 100 TB shape per ingest: the delta's postings/prefix explode is
  * O(delta shingles); the store side moves ONLY its prefix rows
  * (~(1−t)·n+1 per doc) into the store-contained-in-delta join and
  * its postings into the sh-keyed delta-prefix join — both keyed
  * equi-joins, never pair-shaped; verification fetches candidate ids'
  * hset arrays by id. Nothing driver-side, no cartesian. The
  * per-ingest floor is one scan of the store sets table (same regime
  * as [[IncrementalNearDedup]]'s band-store scan — the price of exact
  * recall without a resident index; a deployment chasing the
  * constant could persist the prefix slice as its own table and cut
  * the scan ~3×, trading storage duplication).
  */
object IncrementalContainment {

  /** Default containment threshold — q116's. */
  val DefaultT = 0.7

  /** `(__ca, na, sh)`: each doc's fixed witness prefix — the
    * ⌊(1−t)·n⌋+1 smallest shingle hashes. */
  private def prefixRows(sets: DataFrame, t: Double): DataFrame =
    sets.select(col("id").as("__ca"), col("n").as("na"),
      explode(slice(array_sort(col("hset")), lit(1),
        col("n") - ceil(lit(t) * col("n")).cast("int") + 1)).as("sh"))

  /** `(__cb, nb, sh)`: full postings — any shingle can witness on the
    * container side. */
  private def postingRows(sets: DataFrame): DataFrame =
    sets.select(col("id").as("__cb"), col("n").as("nb"),
      explode(col("hset")).as("sh"))

  /** All containment pairs (contained, container, containment ≥ `t`)
    * over `delta` docs and a persisted store, EXCLUDING store↔store
    * pairs (prior ingests own those). `storeSets` is
    * [[IncrementalNearDedup.shingleSets]]-shaped `(id, n, hset)`; ids
    * must be unique across store ∪ delta. Docs under 3 words carry no
    * shingles and never pair (q100's exact path owns short texts). */
  def containedPairs(delta: DataFrame, storeSets: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      t: Double = DefaultT): DataFrame = {
    // cache: the delta's shingle sets feed four joins below; without
    // it word_shingle_hashes replays per consumer. The engine's query
    // convention (q71/q119 precedent): intra-query caches are released
    // by the harness's clearCache between queries. Callers running a
    // LOOP should build the sets themselves and call [[fromSets]]
    // with caller-owned persistence (DedupStore.ingestContained does).
    fromSets(
      IncrementalNearDedup.shingleSets(delta, idCol, textCol).cache(),
      storeSets, t)
  }

  /** [[containedPairs]] over pre-built `(id, n, hset)` delta sets —
    * persistence of `dSets` (read by four joins) is the CALLER's
    * concern. */
  private[graft] def fromSets(dSets: DataFrame, storeSets: DataFrame,
      t: Double = DefaultT): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"containment threshold must be in (0,1], got $t")
    val sSets = storeSets.select(col("id"), col("n"), col("hset"))
    val allSets = dSets.unionByName(sSets)

    // contained=anything, container=delta — covers delta-in-delta and
    // store-in-delta; contained=delta, container=store covers the rest
    val candToDelta = prefixRows(allSets, t).join(postingRows(dSets), "sh")
    val candToStore = prefixRows(dSets, t).join(postingRows(sSets), "sh")
    val cand = candToDelta.unionByName(candToStore)
      // c ≤ min(na, nb) ⇒ containment ≥ t needs nb ≥ t·na
      .filter(col("__ca") =!= col("__cb") && col("nb") >= lit(t) * col("na"))
      .select(col("__ca"), col("__cb")).distinct()

    cand
      .join(allSets.select(col("id").as("__ca"), col("n").as("na"),
        col("hset").as("ha")), "__ca")
      .join(allSets.select(col("id").as("__cb"), col("hset").as("hb")), "__cb")
      .select(col("__ca").as("contained"), col("__cb").as("container"),
        (size(array_intersect(col("ha"), col("hb"))).cast("double") / col("na"))
          .as("containment"))
      .filter(col("containment") >= t)
  }

  /** Delta ids to SUPPRESS under the keep-the-container policy, given
    * [[containedPairs]] output and the store membership:
    *  - contained in any store doc → drop (archive always wins);
    *  - contained in another delta doc → drop, UNLESS the containment
    *    is mutual (≈ equal sets) and this id is the smaller — then the
    *    smaller id is the canonical survivor (the q40/q78 min-id
    *    discipline, bit-stable across engines).
    * Chains (a ⊂ b ⊂ c) drop every inner doc in one pass: each row is
    * judged by its own container regardless of that container's fate —
    * content remains reachable through the chain's outermost survivor. */
  def suppressedDeltaIds(pairs: DataFrame, storeIds: DataFrame,
      deltaIds: DataFrame): DataFrame = {
    val sids = storeIds.select(col("id"))
    val dids = deltaIds.select(col("id"))
    val dropViaStore = pairs
      .join(sids.withColumnRenamed("id", "container"), Seq("container"), "left_semi")
      .join(dids.withColumnRenamed("id", "contained"), Seq("contained"), "left_semi")
      .select(col("contained").as("id"))
    val dd = pairs
      .join(dids.withColumnRenamed("id", "contained"), Seq("contained"), "left_semi")
      .join(dids.withColumnRenamed("id", "container"), Seq("container"), "left_semi")
      .select(col("contained"), col("container"))
    val mutual = dd.select(col("contained").as("container"),
      col("container").as("contained"))
    val dropViaDelta = dd
      .join(mutual, Seq("contained", "container"), "left_semi")
      .filter(col("container") < col("contained"))
      .select(col("contained").as("id"))
      .unionByName(dd
        .join(mutual, Seq("contained", "container"), "left_anti")
        .select(col("contained").as("id")))
    dropViaStore.unionByName(dropViaDelta).distinct()
  }
}
