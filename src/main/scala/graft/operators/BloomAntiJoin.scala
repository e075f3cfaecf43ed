package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Exact left-anti join accelerated by a Bloom pre-filter — the scale
  * path for "new data vs. historical fingerprint store" checks
  * (q100's incremental dedup; reference: the day-over-day re-ingest
  * described by `java/dataflow/src/main/java/edu/usfca/dataflow`'s
  * job-2 re-run discipline, which recomputes from scratch).
  *
  * Semantics: EXACTLY `left.join(right, Seq(key), "left_anti")`.
  * The Bloom filter only routes rows; it never decides membership:
  *
  *  - build: `right.stat.bloomFilter` over `xxhash64(key)` — an RDD
  *    treeAggregate whose per-partition partial filters merge on
  *    executors, only merged bitsets reaching the driver. NOT the
  *    Catalyst `BloomFilterAggregate` behind AQE runtime filters:
  *    that expression silently clamps to
  *    `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
  *    2²⁶ bits = 8 MiB) and `...maxNumItems` (default 4×10⁶), so past
  *    ~10⁷ keys the filter saturates and every probe answers "maybe"
  *    — defeating the routing at exactly the store sizes this
  *    operator exists for. The sketch builder sizes the bitset from
  *    (n, fpp) with no cap (BloomAntiJoinSpec pins an 8M-key filter
  *    past the Catalyst clamp). The serialized format and the
  *    putLong/mightContainLong hashing are the same classes the
  *    Catalyst probe expression deserializes, so the codegen'd
  *    `might_contain` probe works unchanged;
  *  - route: left rows whose key the filter rejects are DEFINITE
  *    non-members (a Bloom filter has no false negatives over the
  *    inserted hashes) and are kept without ever shuffling; only the
  *    accepting sliver — true matches plus the fpp — pays the exact
  *    anti-join that removes true matches and restores exactness.
  *
  * Null keys need no special case: a null never equi-matches, so
  * left-anti keeps it. `xxhash64` folds a null child to its seed, so
  * a null-keyed left row either misses the filter (kept, correct) or
  * hits it and flows to the exact anti-join (null ≠ anything — kept,
  * correct).
  *
  * Build cost: TWO jobs over `right` — a count to size the filter,
  * then the aggregate — unless the caller passes `expectedKeys` (a
  * store that maintains its own row count skips the count scan; an
  * OVERestimate only widens the bitset, an underestimate only raises
  * the realized fpp — exactness never depends on it).
  *
  * At 100 TB: the store has ~10⁹ fingerprints; at the default 3% fpp
  * the bitset is ~0.9 GiB — it rides the stage's task-binary torrent
  * broadcast as a plan literal (one transfer per executor, same
  * mechanism as an explicit broadcast variable), while the anti-join
  * shuffle shrinks from |delta| rows to ~(dupes + 0.03·|delta|).
  *
  * CALLER CONTRACT — `left` is evaluated TWICE (once per route, miss
  * and sliver). For a file-backed delta that is the right trade: two
  * parquet scans beat one scan plus a full-corpus shuffle whenever
  * the store outgrows broadcast range. But if `left` is an EXPENSIVE
  * DERIVED frame (joins, aggregations, UDF-heavy projections), the
  * whole lineage recomputes per route — either `.cache()` it before
  * calling, or pass `eagerRoute = true`: that variant materializes
  * the routed frame `(left.*, maybe)` ONCE via `localCheckpoint`
  * (executor-local MEMORY_AND_DISK blocks, lineage-GC'd — no caller
  * unpersist to forget in a day-over-day loop), so both routes read
  * blocks instead of recomputing. The costs: eagerness (a job runs
  * at call time), storage for one copy of the delta, and — the
  * fault-tolerance trade vs `.cache()` — `localCheckpoint` blocks
  * are UNREPLICATED and TRUNCATE LINEAGE, so losing any executor
  * after the checkpoint makes the routed frame unrecoverable and
  * FAILS the query rather than recomputing. On long multi-hour jobs
  * or preemptible/spot executors where that risk is real, prefer
  * caller-side `.cache()` (recomputes lost blocks from lineage) or a
  * reliable `checkpoint()` to a distributed FS. eagerRoute is for
  * the short day-over-day delta pass where a retry of the whole call
  * is cheaper than replicated storage. BloomAntiJoinSpec counts
  * scans over an instrumented source for both settings.
  *
  * For stores that still fit Spark's 8 GB broadcast limit as
  * plain rows, a broadcast anti-join may win — this operator is for
  * the store sizes past that.
  */
object BloomAntiJoin {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Serialized sketch Bloom filter over `xxhash64(right.key)`, sized
    * for `n` keys at `fpp`. Exposed for specs (clamp regression). */
  private[graft] def filterBytes(right: DataFrame, key: String,
      fpp: Double, n: Long): Array[Byte] = {
    val bf = right.stat.bloomFilter(xxhash64(col(key)), n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(bloom-of-right[key], xxhash64(key))` as a Column,
    * with the filter built eagerly. Returns None when `right` is
    * empty — no filter needed, nothing matches. Exposed for specs to
    * measure the routing split directly. */
  private[graft] def mightContainCol(right: DataFrame, key: String,
      fpp: Double, expectedKeys: Option[Long] = None): Option[Column] = {
    // expectedKeys is a SIZING estimate, never an emptiness verdict:
    // the None return skips the anti-join entirely ("nothing can
    // match"), and only a real count may conclude that — a stale
    // zero from a store counter aliasing that path would silently
    // keep every true duplicate. Non-positive estimates therefore
    // fall back to counting (which also makes the legitimate
    // first-batch empty-store case exact instead of an error).
    val n = expectedKeys.filter(_ > 0).getOrElse(right.count())
    if (n <= 0L) return None
    val bits = filterBytes(right, key, fpp, n)
    log.info(s"BloomAntiJoin: $n store keys, ${bits.length} filter bytes (fpp target $fpp)")
    Some(ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bits, BinaryType),
      ColumnBridge.expression(xxhash64(col(key))))))
  }

  /** @param expectedKeys skip the sizing `count()` over `right` when
    *        the caller already knows (approximately) how many keys the
    *        store holds; see the build-cost note above. Non-positive
    *        values are treated as "unknown" and counted — the
    *        estimate sizes the filter, it never decides emptiness.
    * @param eagerRoute materialize `(left.*, maybe)` once instead of
    *        evaluating `left` per route — for expensive derived
    *        lineages. Uses `localCheckpoint`: executor-local,
    *        unreplicated, lineage-truncating — an executor loss after
    *        the checkpoint fails the query instead of recomputing;
    *        see the caller contract above for when to `.cache()`
    *        instead. */
  def apply(left: DataFrame, right: DataFrame, key: String,
      fpp: Double = 0.03, expectedKeys: Option[Long] = None,
      eagerRoute: Boolean = false): DataFrame =
    mightContainCol(right, key, fpp, expectedKeys) match {
      case None => left // empty store: anti-join keeps everything
      case Some(mc) =>
        // unknown → exact path: conservative routing can only cost
        // work, never correctness (the exact join re-decides it)
        val flag = "__graft_bloom_maybe"
        val flagged = left.withColumn(flag, coalesce(mc, lit(true)))
        val routed = if (eagerRoute) flagged.localCheckpoint() else flagged
        val definiteMiss = routed.filter(!col(flag)).drop(flag)
        val sliver = routed.filter(col(flag)).drop(flag)
          .join(right, Seq(key), "left_anti")
        definiteMiss.unionByName(sliver)
    }
}
