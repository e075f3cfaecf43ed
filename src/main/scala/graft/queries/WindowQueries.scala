package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (ranking / analytic / frames). The reference
  * has none (SURVEY.md §2.6: only Beam GlobalWindow); the generalized
  * engine exposes Spark's full `Window` spec. All orderings carry a
  * unique tie-break column so results are deterministic across engines.
  */
object WindowQueries {

  private val rankInGroup = Q(
    "q20_window_rank",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      T.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("rk", rank().over(
          Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc))
          .cast("long"))
        .filter($"rn" <= 10)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice", $"rn", $"rk")
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice, rn, rk FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
          rank()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rk
        FROM orders) WHERE rn <= 10"""))

  /** Running sum + lag/lead over a per-customer order history. */
  private val runningTotals = Q(
    "q21_window_running",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      T.orders(s, d).select(
        $"o_custkey", $"o_orderkey",
        sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_spend"),
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      sum(o_totalprice) OVER w AS running_spend,
      lag(o_totalprice)  OVER w AS prev_price,
      lead(o_totalprice) OVER w AS next_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""),
    bench = true)

  /** Top-k per group via row_number (the distributed replacement for the
    * reference's absent ORDER BY+LIMIT; SURVEY §2.6 "limits: none"). */
  private val topkPerGroup = Q(
    "q22_topk_per_group",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      T.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) WHERE rn <= 3"""))

  /** Sliding frame: 7-row centered moving average of daily revenue.
    * The global-order window here runs AFTER the day-level aggregate,
    * so its input is bounded by |distinct days| (a few thousand for
    * any calendar span) no matter the corpus size — single-partition
    * is the right plan for a global time series that small, unlike a
    * raw-table global rank (see q32's distributed formulation). */
  private val movingAvg = Q(
    "q31_moving_avg",
    (s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy(date_trunc("day", $"o_orderdate").as("day"))
        .agg(sum($"o_totalprice").as("revenue"))
      val w = Window.orderBy($"day").rowsBetween(-3, 3)
      daily.select(unix_micros($"day").as("day_us"), $"revenue",
        avg($"revenue").over(w).as("ma7"),
        count(lit(1)).over(w).as("n_in_frame"))
    },
    Some("""WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day, sum(o_totalprice) AS revenue
        FROM orders GROUP BY 1)
      SELECT epoch_us(day) AS day_us, revenue,
        avg(revenue) OVER w AS ma7, count(*) OVER w AS n_in_frame
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"""))

  /** ntile + percent_rank + cumulative distribution — computed
    * DISTRIBUTED: the naive `Window.orderBy(...)` (no partition) that
    * these functions invite plans a single-partition WindowExec — the
    * whole table through one task, the classic global-rank scale
    * killer. Instead: range-partition on the order key (partition i's
    * keys all precede partition i+1's), rank locally in parallel,
    * then add each partition's starting offset — an exclusive prefix
    * sum over the per-partition COUNTS, ≤ one row per partition, the
    * only place a global-order window remains (bounded by cluster
    * width, like q31's bounded day count). The order key is UNIQUE
    * (c_custkey tie-break), so rank = row_number and all three
    * outputs are exact integer/IEEE arithmetic on (rn, n):
    * percent_rank = (rn−1)/(n−1), cume_dist = rn/n, and ntile(k) is
    * the standard bucketing (first n mod k buckets get ⌈n/k⌉ rows) —
    * bit-identical to the window-function forms the oracle runs.
    * Range boundary placement (sampling) can vary; the rank algebra
    * doesn't depend on where the cuts fall.
    *
    * The global index comes from `zipWithIndex` on the range-sorted
    * frame's ONE underlying RDD: its per-partition size job and the
    * main pass run against the same RDD object, so the range shuffle's
    * map stage executes once and both see ONE partitioning. (The
    * superficially cleaner all-DataFrame fork — offsets branch +
    * data branch both re-deriving the exchange — is NOT sound:
    * RangePartitioner seeds its boundary sampling from rdd.id, so
    * two physically distinct exchanges can cut different boundaries,
    * and cross-branch consistency would rest on Catalyst exchange
    * reuse, an optimization a conf can switch off. zipWithIndex is
    * Spark's own primitive for exactly this prefix-sum.) A
    * `Window.partitionBy(spark_partition_id())` alternative would
    * plan a SECOND full-table hash Exchange. One big-side shuffle
    * total; the RDD seam is two narrow maps, and the rank arithmetic
    * runs codegen'd after `createDataFrame`. */
  private val distributionRanks = Q(
    "q32_distribution_ranks",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.types.LongType
      val cust = T.customer(s, d).select($"c_custkey", $"c_acctbal")
      val nParts = s.sparkContext.defaultParallelism.max(1)
      val ranged = cust
        .repartitionByRange(nParts, $"c_acctbal".asc, $"c_custkey".asc)
        .sortWithinPartitions($"c_acctbal".asc, $"c_custkey".asc)
      val withRn = s.createDataFrame(
        ranged.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
        },
        ranged.schema.add("rn", LongType, nullable = false))
      // total from the zipped frame: a zero-column count over the
      // already-shuffled result, not another scan of the table
      val tot = withRn.agg(count(lit(1)).as("n"))
      withRn.crossJoin(broadcast(tot))
        // ntile(10): q = n div 10, r = n mod 10; buckets 1..r hold
        // q+1 rows, the rest q (CASE guards the q=0 divide when n<10)
        .selectExpr("c_custkey", "c_acctbal",
          """CASE WHEN rn <= (n % 10) * (n div 10 + 1)
               THEN (rn - 1) div (n div 10 + 1) + 1
               ELSE (n % 10) + (rn - (n % 10) * (n div 10 + 1) - 1) div (n div 10) + 1
             END AS decile""",
          """CASE WHEN n = 1 THEN 0.0
             ELSE CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS pct_rank""",
          "CAST(rn AS DOUBLE) / CAST(n AS DOUBLE) AS cdf")
    },
    Some("""SELECT c_custkey, c_acctbal,
      ntile(10)      OVER w AS decile,
      percent_rank() OVER w AS pct_rank,
      cume_dist()    OVER w AS cdf
      FROM customer
      WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)"""))

  /** Sessionization via the NATIVE `session_window` aggregate (vs
    * q30's gaps-and-islands formulation) — Spark merges overlapping
    * per-event windows [ts, ts+gap) inside the agg, one shuffle by
    * (user, window), no sort-based window pass. Boundary semantics
    * (pinned by ExtendedOpsSpec): windows touching at exactly the gap
    * MERGE — i.e. islands split only on gap STRICTLY greater than
    * 30 min, same as q30's formulation. */
  private val sessionWindowNative = Q(
    "q74_session_window",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id", session_window($"ts", "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros($"ts")).as("sess_start"),
          max(unix_micros($"ts")).as("sess_end"))
        .select($"user_id", $"sess_start", $"sess_end", $"n_events")
    },
    Some("""WITH f AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 30*60*1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM f),
      h AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM g)
      SELECT user_id, min(epoch_us(ts)) AS sess_start, max(epoch_us(ts)) AS sess_end,
             count(*) AS n_events
      FROM h GROUP BY user_id, sid"""))

  def qs: Seq[Q] = Seq(rankInGroup, runningTotals, topkPerGroup, movingAvg,
    distributionRanks, sessionWindowNative)
}
