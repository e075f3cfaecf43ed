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

  /** Default hot-shingle df cap for the candidate join —
    * [[LshGuard]]'s occupancy discipline applied to the containment
    * join key: one shingle shared by k docs (the boilerplate regime —
    * a cookie banner's 3-gram in 30% of a crawl) emits
    * O(k·prefix-fraction × k) candidate pairs through the
    * prefix ⋈ postings join; capping the key's df bounds that at
    * cap²-ish while the gate corpus never comes close (measured max
    * 3-shingle df: 25 at sf0.1, ~250 at the ×10 replica — 4×+
    * headroom).
    *
    * RECALL CONTRACT (deliberate, LshGuard's): a true containment
    * pair is lost only when EVERY witness the pigeonhole guarantees —
    * every prefix shingle of the contained doc that the container
    * shares — has df > cap, i.e. the overlap that makes the pair a
    * pair is itself ≥cap-frequency boilerplate. Those are q95's
    * families (detect and strip the template; per-pair output of a
    * k-wide family is useless), not containment's. Override per
    * session with `graft.contain.maxShingleDf`.
    *
    * Design revision note: this object's scaladoc argues AGAINST a
    * per-ingest corpus-wide df pass (rarity ordering is a cost
    * heuristic not worth O(store) shuffle). The guard is a different
    * trade: without it a single hot key makes the join output
    * QUADRATIC — and its occupancy aggregate keys on `sh`, the
    * join's own shuffle key, so it rides the partitioning the join
    * already pays for. Round 11 then removed most of even that
    * constant: [[graft.operators.DedupStore.ingestContained]]
    * persists per-day [[shingleDf]] counts and hands them to
    * [[candidates]] pre-aggregated, so the recurring guard cost is
    * one delta-sized count plus a slim store-df scan (q118_probe
    * 3.65 → 2.11 s at sf0.1 — cheaper than the unguarded round-9
    * path, which re-shingled the store per ingest anyway). */
  val DefaultMaxShingleDf = 1024

  def maxShingleDf(s: org.apache.spark.sql.SparkSession): Int =
    s.conf.getOption("graft.contain.maxShingleDf").map(_.toInt)
      .getOrElse(DefaultMaxShingleDf)

  /** `(sh, cnt)`: shingle document frequency over a sets frame — the
    * guard's occupancy statistic, factored out so it can be
    * PRE-AGGREGATED and persisted ([[DedupStore]]'s per-day `df`
    * table, round 11): the round-10 guard re-counted occupancy over
    * store ∪ delta postings on EVERY ingest (q118's +50% bench
    * price); with per-day counts committed alongside the sets, an
    * ingest folds only the delta's counts into the stored sums.
    * Counts are additive across disjoint doc sets (each doc
    * contributes ≤ 1 per distinct shingle — `hset` is a set), so
    * day-partitioned frames concatenate and re-sum exactly. */
  def shingleDf(sets: DataFrame): DataFrame =
    postingRows(sets).groupBy(col("sh")).agg(count(lit(1)).as("cnt"))

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

  /** The candidate join, hot-shingle-guarded (see
    * [[DefaultMaxShingleDf]]): shingles with df > cap across
    * store ∪ delta are dropped from the PREFIX side — the equi-join
    * then emits no pair on that key, bounding the output, while the
    * postings side shuffles its (linear) hot rows into a join that
    * matches nothing. Exposed private[graft] so the skew-stress spec
    * can count candidates with and without the guard. */
  private[graft] def candidates(dSets: DataFrame, sSets: DataFrame,
      allSets: DataFrame, t: Double, maxShingleDf: Int,
      storeDf: Option[DataFrame] = None): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"containment threshold must be in (0,1], got $t")
    require(maxShingleDf >= 1, s"maxShingleDf must be >= 1, got $maxShingleDf")
    // occupancy over store ∪ delta, two routes to the same counts:
    //  - storeDf provided: the store side arrives PRE-AGGREGATED
    //    ((sh, cnt) — [[shingleDf]] over exactly the docs in sSets,
    //    the caller's contract); only the delta's counts are built
    //    here, and — once the archive's df outgrows the delta's (the
    //    daily-cadence regime) — the store side is ROUTED through a
    //    Bloom filter of the delta's keys before it ever shuffles.
    //    That routing is
    //    EXACT, not approximate: both candidate orientations join
    //    through a delta-side `sh` (postings of dSets in one, prefix
    //    of dSets in the other), so a store key ABSENT from the delta
    //    can never form a candidate pair — whether the guard marks it
    //    hot is irrelevant — and Bloom false positives only admit
    //    store rows whose hotness then prunes nothing. Per-ingest
    //    guard shuffle: O(delta shingles + delta-matching store rows),
    //    independent of archive width (the round-11 reclaim of q118's
    //    guard price, completed: without the route the store df —
    //    every distinct shingle the archive ever kept — re-shuffled
    //    through this aggregate on every ingest);
    //  - no storeDf: count over allSets postings directly (the
    //    self-contained batch path — q118's gate query). The second
    //    groupBy over already-distinct (sh, cnt) rows is a no-op-ish
    //    re-sum kept for one shared shape.
    val occ = storeDf match {
      case Some(sdf) =>
        // the filter is built from the delta's RAW posting rows, not
        // the aggregated df: a Bloom insert is idempotent, so feeding
        // duplicates costs nothing and the build is one map-side
        // treeAggregate pass over the (caller-cached) delta sets —
        // zero shuffle, no recomputation of the df aggregate. Sizing
        // uses Σn (total shingle occurrences, a cheap row-local agg)
        // — an overestimate of the distinct count, which only widens
        // the bitset. ADAPTIVE: the build costs ~two delta-sized jobs,
        // worth paying only when the avoided store-side shuffle
        // dominates — i.e. at daily cadence, where the archive's df
        // is many× the day's (measured: at the bench's adversarial
        // 50/50 split the route is a ~0.4 s wash; the count that
        // decides is footer-stats-cheap on a parquet df table).
        val nEst = Option(dSets.agg(sum(col("n"))).head.get(0))
          .fold(0L)(_.asInstanceOf[Long])
        val relevant =
          if (nEst <= 0) sdf.limit(0) // shingle-less delta: no candidates
          else if (sdf.count() <= 4 * nEst) sdf.select(col("sh"), col("cnt"))
          else sdf.filter(BloomAntiJoin.mightContainCol(
            postingRows(dSets).select(col("sh")), "sh",
            fpp = 0.03, expectedKeys = Some(nEst)).get)
        shingleDf(dSets).unionByName(relevant.select(col("sh"), col("cnt")))
      case None => shingleDf(allSets)
    }
    // Deliberately LAZY (round 13, reverting round 12's
    // localCheckpoint): both cool() consumers anti-join against `hot`,
    // which on paper evaluates the occupancy subtree twice — but the
    // round-13 idle reps=7 A/B at the ~sf1 replica measured the
    // materialized variant at 7.40 s vs 4.39 s lazy for the full q118
    // ingest+probe cycle (gate SF: a wash, as round 12 recorded).
    // Eager localCheckpoint runs the store-df scan as a standalone
    // blocking job with no overlap, once per candidates() call whether
    // or not both orientations are consumed; lazily the tiny hot frame
    // broadcasts inside the surrounding jobs where the scan overlaps
    // other stage work (and the second evaluation hits page-cached
    // parquet). Measured, not guessed — see SCALING.md round 13.
    val hot = occ.groupBy(col("sh"))
      .agg(sum(col("cnt")).as("__w"))
      .filter(col("__w") > maxShingleDf)
      .select(col("sh"))
    // round 17 re-test of the round-13 materialization question, now
    // with lazy .cache() instead of eager localCheckpoint: at sf0.1
    // the cache dedupes the double occupancy evaluation and wins big
    // (q118 4.35→3.65, q143 5.17→3.81, probe 3.17→2.04 focused A/B),
    // but at the ×10 replica it LOSES (q118 6.38→6.86, q143
    // 11.14→12.48, probe 6.51→7.68 — the cache is a serialization
    // point the two lazily-overlapping evaluations don't have, the
    // same direction as round 13's localCheckpoint numbers). The
    // scale regime decides: stays lazy.
    def cool(rows: DataFrame): DataFrame = rows.join(hot, Seq("sh"), "left_anti")
    // contained=anything, container=delta — covers delta-in-delta and
    // store-in-delta; contained=delta, container=store covers the rest
    val candToDelta = cool(prefixRows(allSets, t)).join(postingRows(dSets), "sh")
    val candToStore = cool(prefixRows(dSets, t)).join(postingRows(sSets), "sh")
    candToDelta.unionByName(candToStore)
      // c ≤ min(na, nb) ⇒ containment ≥ t needs nb ≥ t·na
      .filter(col("__ca") =!= col("__cb") && col("nb") >= lit(t) * col("na"))
      .select(col("__ca"), col("__cb")).distinct()
  }

  /** All containment pairs (contained, container, containment ≥ `t`)
    * over `delta` docs and a persisted store, EXCLUDING store↔store
    * pairs (prior ingests own those). `storeSets` is
    * [[IncrementalNearDedup.shingleSets]]-shaped `(id, n, hset)`; ids
    * must be unique across store ∪ delta. Docs under 3 words carry no
    * shingles and never pair (q100's exact path owns short texts). */
  def containedPairs(delta: DataFrame, storeSets: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      t: Double = DefaultT, storeDf: Option[DataFrame] = None): DataFrame = {
    // cache: the delta's shingle sets feed four joins below; without
    // it word_shingle_hashes replays per consumer. The engine's query
    // convention (q71/q119 precedent): intra-query caches are released
    // by the harness's clearCache between queries. Callers running a
    // LOOP should build the sets themselves and call [[fromSets]]
    // with caller-owned persistence (DedupStore.ingestContained does).
    fromSets(
      IncrementalNearDedup.shingleSets(delta, idCol, textCol).cache(),
      storeSets, t, maxShingleDf(delta.sparkSession), storeDf)
  }

  /** [[containedPairs]] over pre-built `(id, n, hset)` delta sets —
    * persistence of `dSets` (read by four joins) is the CALLER's
    * concern. `storeDf`, when given, must be [[shingleDf]] over
    * exactly the docs in `storeSets` (see [[candidates]]). */
  private[graft] def fromSets(dSets: DataFrame, storeSets: DataFrame,
      t: Double = DefaultT,
      maxShingleDf: Int = DefaultMaxShingleDf,
      storeDf: Option[DataFrame] = None): DataFrame = {
    val sSets = storeSets.select(col("id"), col("n"), col("hset"))
    val allSets = dSets.unionByName(sSets)
    val cand = candidates(dSets, sSets, allSets, t, maxShingleDf, storeDf)
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
