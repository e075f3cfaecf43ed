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
    * killer. Instead, a VALUE-DERIVED two-level rank:
    *
    *  1. bucket = `width_bucket(c_acctbal, lo, hi, nb)` — a pure,
    *     MONOTONE function of the primary sort key (out-of-range
    *     values clamp to end buckets 0 / nb+1, still ordered), so
    *     bucket order agrees with global order and equal-key rows
    *     share a bucket;
    *  2. local rank: `row_number` over Window.partitionBy(bucket) —
    *     ONE hash exchange on bucket, ranks computed in parallel;
    *  3. bucket offsets: per-bucket counts (map-side-combined
    *     aggregate, ≤ nb+2 rows) prefix-summed by the only global
    *     window left — over that bounded aggregate, like q31 — and
    *     broadcast back; the grand total n is the same tiny frame
    *     summed, no second table scan.
    *
    * Deriving the partition key from row VALUES — never from
    * physical placement — is what makes the two branches of the
    * lineage fork provably consistent: a range-exchange fork is
    * unsound (RangePartitioner seeds boundary sampling from rdd.id,
    * so two exchanges can cut different boundaries and consistency
    * would rest on Catalyst exchange reuse, an optimization a conf
    * can turn off), and a `zipWithIndex`/`spark_partition_id` form
    * is placement-derived too — it additionally runs an eager
    * size job at DataFrame-construction time and hides the shuffle
    * from the SQL plan, blinding the CI plan pins. Here everything
    * is lazy, declarative, codegen'd, and visible to `.explain`.
    *
    * The order key is UNIQUE (c_custkey tie-break), so rank =
    * row_number and all three outputs are exact integer/IEEE
    * arithmetic on (rn, n): percent_rank = (rn−1)/(n−1),
    * cume_dist = rn/n, ntile(k) by the standard bucketing (first
    * n mod k buckets get ⌈n/k⌉ rows) — bit-identical to the
    * window-function forms the oracle runs, PROVIDED the sort key is
    * non-null: a NULL key makes `width_bucket` return NULL and the
    * equi-join on bkt silently drops the row, whereas the
    * window-function form ranks NULLs (NULLS FIRST). Safe here —
    * TPC-H c_acctbal is NOT NULL — but a reuse of this pattern on a
    * nullable key must first map NULL to a sentinel bucket below
    * every real one (e.g. bucket −1) to reproduce NULLS FIRST.
    * Skew caveat: rows
    * concentrated in a narrow value range concentrate in few
    * buckets; size nb (and the bounds) for the expected value
    * distribution — the per-bucket work is what a 100 TB run
    * parallelizes over. */
  private val distributionRanks = Q(
    "q32_distribution_ranks",
    (s, d) => {
      import s.implicits._
      val nb = 1024
      val cust = T.customer(s, d).select($"c_custkey", $"c_acctbal")
        // TPC-H acctbal spans [-999.99, 9999.99]; clamp buckets keep
        // out-of-range values ordered
        .withColumn("bkt", expr(s"width_bucket(c_acctbal, -1000.0, 10000.0, $nb)"))
      val local = cust.withColumn("lrn", row_number().over(
        Window.partitionBy($"bkt").orderBy($"c_acctbal".asc, $"c_custkey".asc)))
      val counts = cust.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
      // exclusive prefix sum + grand total over ≤ nb+2 rows
      val offsets = counts
        .withColumn("off", coalesce(
          sum($"cnt").over(Window.orderBy($"bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val tot = counts.agg(sum($"cnt").as("n"))
      local.join(broadcast(offsets.select($"bkt", $"off")), "bkt")
        .withColumn("rn", $"off" + $"lrn")
        .crossJoin(broadcast(tot))
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
