package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Exact left-anti join accelerated by a Bloom pre-filter — the scale
  * path for "new data vs. historical fingerprint store" checks
  * (q100's incremental dedup; reference: the day-over-day re-ingest
  * described by `java/dataflow/src/main/java/edu/usfca/dataflow`'s
  * job-2 re-run discipline, which recomputes from scratch).
  *
  * Semantics: EXACTLY `left.join(right, Seq(key), "left_anti")`.
  * The Bloom filter only routes rows; it never decides membership:
  *
  *  - build: one aggregate scan of `right` folds `xxhash64(key)`
  *    into a Bloom filter (Spark's own `BloomFilterAggregate`, the
  *    expression behind AQE runtime filters — partial filters merge
  *    associatively on executors, only the final bitset reaches the
  *    driver);
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
  * At 100 TB: the store has ~10⁹ fingerprints; at the default 3% fpp
  * the bitset is ~0.9 GiB — it rides the stage's task-binary torrent
  * broadcast as a plan literal (one transfer per executor, same
  * mechanism as an explicit broadcast variable), while the anti-join
  * shuffle shrinks from |delta| rows to ~(dupes + 0.03·|delta|).
  * `left` is scanned twice (once per route); two scans beat one scan
  * plus a full-corpus shuffle whenever the store outgrows broadcast
  * range. For stores that still fit Spark's 8 GB broadcast limit as
  * plain rows, a broadcast anti-join may win — this operator is for
  * the store sizes past that.
  */
object BloomAntiJoin {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** `might_contain(bloom-of-right[key], xxhash64(key))` as a Column,
    * with the filter built eagerly (one job over `right`). Returns
    * None when `right` is empty — no filter needed, nothing matches.
    * Exposed for specs to measure the routing split directly. */
  private[graft] def mightContainCol(right: DataFrame, key: String,
      fpp: Double): Option[Column] = {
    val n = right.count()
    if (n == 0L) return None
    val numBits = math.max(64L, BloomFilter.optimalNumOfBits(n, fpp))
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(key))),
        Literal(n), Literal(numBits)).toAggregateExpression())
    val bits = right.select(bloomAgg).head.getAs[Array[Byte]](0)
    log.info(s"BloomAntiJoin: $n store keys, ${bits.length} filter bytes (fpp target $fpp)")
    Some(ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bits, BinaryType),
      ColumnBridge.expression(xxhash64(col(key))))))
  }

  def apply(left: DataFrame, right: DataFrame, key: String,
      fpp: Double = 0.03): DataFrame =
    mightContainCol(right, key, fpp) match {
      case None => left // empty store: anti-join keeps everything
      case Some(mc) =>
        // unknown → exact path: conservative routing can only cost
        // work, never correctness (the exact join re-decides it)
        val maybe = coalesce(mc, lit(true))
        val definiteMiss = left.filter(!maybe)
        val sliver = left.filter(maybe).join(right, Seq(key), "left_anti")
        definiteMiss.unionByName(sliver)
    }
}
