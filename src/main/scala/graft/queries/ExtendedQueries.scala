package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Relational surface beyond the reference's operator set (SURVEY.md §2
  * marks joins/apps the reference lacks as "absent") — rounding out the
  * engine so a reference user gets the standard analytics toolkit too.
  */
object ExtendedQueries {

  /** Full-outer reconciliation of two keyed aggregates (the reference
    * has only inner/semi/anti shapes). Both sides pre-aggregate before
    * the join, so the shuffle carries one row per nation, not per raw
    * row — at 100 TB the join input is the *aggregate*, never the fact
    * table. USING-column join coalesces the key on both engines. */
  private val fullOuterMerge = Q(
    "q39_full_outer_merge",
    (s, d) => {
      import s.implicits._
      val cust = T.customer(s, d).groupBy($"c_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_cust"), sum($"c_acctbal").as("cust_bal"))
      val supp = T.supplier(s, d).groupBy($"s_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_supp"), sum($"s_acctbal").as("supp_bal"))
      cust.join(supp, Seq("nationkey"), "full_outer")
        .select($"nationkey",
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"cust_bal", lit(0.0)).as("cust_bal"),
          coalesce($"n_supp", lit(0L)).as("n_supp"),
          coalesce($"supp_bal", lit(0.0)).as("supp_bal"))
    },
    Some("""WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust,
               sum(c_acctbal) AS cust_bal FROM customer GROUP BY 1),
      s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp,
               sum(s_acctbal) AS supp_bal FROM supplier GROUP BY 1)
      SELECT nationkey,
        coalesce(n_cust, 0) AS n_cust, coalesce(cust_bal, 0.0) AS cust_bal,
        coalesce(n_supp, 0) AS n_supp, coalesce(supp_bal, 0.0) AS supp_bal
      FROM c FULL OUTER JOIN s USING (nationkey)"""))

  /** Correlation / covariance / dispersion battery per group — one
    * partial+final hash agg pass (Spark merges per-partition moment
    * accumulators; no second scan). Cross-engine float agreement is
    * ~1e-12 relative (merge order differs), inside the gate's
    * tolerance like the other float aggregates. */
  private val statsBattery = Q(
    "q59_stats_battery",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          corr($"l_quantity", $"l_extendedprice").as("qp_corr"),
          covar_samp($"l_quantity", $"l_extendedprice").as("qp_covar"),
          stddev_samp($"l_extendedprice").as("price_sd"),
          var_samp($"l_quantity").as("qty_var"),
          avg($"l_discount").as("avg_disc"),
          expr("regr_slope(l_extendedprice, l_quantity)").as("qp_slope"),
          expr("regr_intercept(l_extendedprice, l_quantity)").as("qp_icept"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT l_returnflag,
      corr(l_quantity, l_extendedprice) AS qp_corr,
      covar_samp(l_quantity, l_extendedprice) AS qp_covar,
      stddev_samp(l_extendedprice) AS price_sd,
      var_samp(l_quantity) AS qty_var,
      avg(l_discount) AS avg_disc,
      regr_slope(l_extendedprice, l_quantity) AS qp_slope,
      regr_intercept(l_extendedprice, l_quantity) AS qp_icept,
      count(*) AS n
      FROM lineitem GROUP BY l_returnflag"""))

  /** Explicit GROUPING SETS + grouping_id (finer control than the
    * cube/rollup pair, q18/q28) — Spark plans one Expand over the
    * selected sets only, not the full 2^n cube lattice. */
  private val groupingSets = Q(
    "q66_grouping_sets",
    (s, d) => {
      T.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
          CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          count(*) AS n, sum(l_quantity) AS qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      count(*) AS n, sum(l_quantity) AS qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"""))

  /** Stratified deterministic sampling: per-stratum rate via the same
    * md5-prefix uniform hash as q14 (seedable, reproducible on any
    * engine — `rand()` is not). Pure filter: pushes to the scan,
    * no shuffle, linear at any scale. */
  private val stratifiedSample = Q(
    "q73_stratified_sample",
    (s, d) => {
      import s.implicits._
      val bucket =
        conv(substring(md5($"c_custkey".cast("string")), 1, 14), 16, 10)
          .cast("long") % 100
      T.customer(s, d)
        .filter(bucket < when($"c_mktsegment" === "AUTOMOBILE", 10).otherwise(30))
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
    },
    Some("""SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
      WHERE CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 14) AS BIGINT) % 100
            < CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 10 ELSE 30 END"""))

  /** Exact money arithmetic: the double columns re-cast to
    * DECIMAL(12,2) and summed exactly (no float drift at any row
    * count — the correctness property a billing pipeline needs at
    * 100 TB, where double summation error grows with scale). Result
    * re-cast to DOUBLE only for the comparison harness; the internal
    * aggregation is decimal-exact in both engines. */
  private val decimalAgg = Q(
    "q79_decimal_agg",
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .select($"l_returnflag",
          $"l_extendedprice".cast("decimal(12,2)").as("price"),
          $"l_discount".cast("decimal(12,2)").as("disc"))
        .groupBy($"l_returnflag")
        .agg(
          sum($"price").cast("double").as("revenue"),
          sum($"price" * $"disc").cast("double").as("discounted"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT l_returnflag,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS discounted,
      count(*) AS n
      FROM lineitem GROUP BY l_returnflag"""))

  /** Time-series gap filling: build the full day calendar per group
    * (sequence + explode — no driver loop), left-join the observed
    * daily aggregate, then zero-fill and forward-fill (last non-null
    * via IGNORE NULLS window). The calendar explode is per-group
    * row-local; the join is keyed — both linear at scale. */
  private val gapFill = Q(
    "q83_gap_fill",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = T.orders(s, d)
        .groupBy($"o_orderpriority".as("prio"),
          date_trunc("day", $"o_orderdate").as("day"))
        .agg(sum($"o_totalprice").as("revenue"))
      val calendar = daily.groupBy($"prio")
        .agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"prio", explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy($"prio").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      calendar.join(daily, Seq("prio", "day"), "left")
        .select($"prio", unix_micros($"day").as("day_us"),
          coalesce($"revenue", lit(0.0)).as("revenue_zf"),
          last($"revenue", ignoreNulls = true).over(w).as("revenue_ff"),
          $"revenue".isNull.as("was_gap"))
    },
    Some("""WITH daily AS (
        SELECT o_orderpriority AS prio, date_trunc('day', o_orderdate) AS day,
               sum(o_totalprice) AS revenue
        FROM orders GROUP BY 1, 2),
      bounds AS (SELECT prio, min(day) d0, max(day) d1 FROM daily GROUP BY 1),
      cal AS (SELECT prio, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
              FROM bounds)
      SELECT c.prio, epoch_us(c.day) AS day_us,
        coalesce(d.revenue, 0.0) AS revenue_zf,
        last_value(d.revenue IGNORE NULLS) OVER (PARTITION BY c.prio ORDER BY c.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_ff,
        d.revenue IS NULL AS was_gap
      FROM cal c LEFT JOIN daily d ON c.prio = d.prio AND c.day = d.day"""))

  /** Fixed-width histogram (binning): floor-divide into 25k-wide price
    * buckets with a terminal catch-all — one partial+final count
    * shuffle over ≤20 groups, the O(1)-output profile at any scale. */
  private val histogram = Q(
    "q84_histogram",
    (s, d) => {
      import s.implicits._
      T.orders(s, d)
        .select(least(floor($"o_totalprice" / 25000), lit(19)).cast("long").as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"))
        .withColumn("lo", ($"bucket" * 25000).cast("double"))
    },
    Some("""WITH b AS (
        SELECT CAST(least(floor(o_totalprice / 25000), 19) AS BIGINT) AS bucket
        FROM orders)
      SELECT bucket, count(*) AS n, CAST(bucket * 25000 AS DOUBLE) AS lo
      FROM b GROUP BY bucket"""))

  /** Sketch family (with q07's HLL++): Apache DataSketches HLL and
    * approx_top_k frequent-items per language. Sketches are the 100 TB
    * answer to distinct/top-k — fixed-size mergeable state through the
    * partial/final agg instead of per-key exact state.
    *
    * Unlike q07 (whose HLL++ runs in its estimating regime), BOTH
    * sketches here are provably in their EXACT regime on this data —
    * the per-language vocabulary (~31 words) is far below the
    * DataSketches lgK=14 coupon threshold and the approx_top_k
    * capacity (50 000 tracked items), so the estimates are not
    * approximations but exact values, and the row hash-checks against
    * a plain-SQL oracle: hll_distinct = count(DISTINCT word), and the
    * sketch's top-10 count list (sorted desc — count MULTISET, so
    * engine-specific tie order between equal-count words can't flip
    * the compare) = the exact top-10 count list. SketchBoundSpec
    * additionally pins sketch-vs-exact equality with the raw values
    * in view. */
  private val sketchTopK = Q(
    "q85_sketch_topk",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .select($"lang", explode(split(trim($"text"), "\\s+")).as("word"))
        .groupBy($"lang")
        .agg(
          to_json(reverse(array_sort(
            expr("transform(approx_top_k(word, 10, 50000), x -> x.count)"))))
            .as("topk_counts"),
          expr("hll_sketch_estimate(hll_sketch_agg(word, 14))").as("hll_distinct"),
          countDistinct($"word").as("exact_distinct"))
    },
    Some("""WITH w AS (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS word
        FROM documents),
      c AS (SELECT lang, word, count(*) AS cnt FROM w GROUP BY lang, word)
      SELECT lang, to_json((list(cnt ORDER BY cnt DESC))[1:10]) AS topk_counts,
        count(*) AS hll_distinct, count(*) AS exact_distinct
      FROM c GROUP BY lang"""))

  /** Ordered funnel (view → click → purchase): per user, the earliest
    * qualifying timestamp of each step STRICTLY AFTER the previous
    * step, then depth = how far the user got. One conditional-
    * aggregation pass per step over the pre-shuffled per-user rows —
    * shuffle once on user_id, never a self-join per step (k-step
    * funnels over event logs are the canonical adtech rollup). */
  private val funnel = Q(
    "q86_funnel",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        .repartition($"user_id").cache()
      val s1 = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"us").as("t1"))
      val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
        .filter($"us" > $"t1")
        .groupBy($"user_id").agg(min($"us").as("t2"), min($"t1").as("t1"))
      val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
        .filter($"us" > $"t2")
        .groupBy($"user_id").agg(min($"us").as("t3"))
      s1.join(s2.select($"user_id", $"t2"), Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select($"user_id", $"t1", $"t2", $"t3",
          (lit(1) + when($"t2".isNotNull, 1).otherwise(0)
            + when($"t3".isNotNull, 1).otherwise(0)).cast("long").as("depth"))
    },
    Some("""WITH s1 AS (
        SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
        GROUP BY e.user_id),
      s3 AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
        GROUP BY e.user_id)
      SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
        CAST(1 + (s2.t2 IS NOT NULL)::INT + (s3.t3 IS NOT NULL)::INT AS BIGINT) AS depth
      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
              LEFT JOIN s3 ON s1.user_id = s3.user_id"""))

  /** Cohort retention: users grouped by first-activity week, then
    * distinct active users per (cohort, weeks-since-cohort) cell —
    * the other canonical log rollup next to q86's funnel. Two
    * aggregations on user_id/cohort keys; the distinct-user count is
    * the q05/q06 dedup-agg shape. */
  private val retention = Q(
    "q87_cohort_retention",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"user_id", unix_micros(date_trunc("week", $"ts")).as("wk"))
      val cohort = ev.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
      ev.join(cohort, "user_id")
        .select($"user_id", $"cohort_wk",
          (($"wk" - $"cohort_wk") / (7L * 86400 * 1000000)).cast("long").as("wk_offset"))
        .distinct()
        .groupBy($"cohort_wk", $"wk_offset")
        .agg(count(lit(1)).as("active_users"))
    },
    Some("""WITH ev AS (
        SELECT user_id, epoch_us(date_trunc('week', ts)) AS wk FROM events),
      cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id),
      cells AS (SELECT DISTINCT e.user_id, c.cohort_wk,
                  CAST((e.wk - c.cohort_wk) // (7::BIGINT * 86400 * 1000000) AS BIGINT) AS wk_offset
                FROM ev e JOIN cohort c ON e.user_id = c.user_id)
      SELECT cohort_wk, wk_offset, count(*) AS active_users
      FROM cells GROUP BY 1, 2"""))

  /** Skew-resistant enrichment join, exercising
    * [[graft.operators.SkewedJoin]] end-to-end against the oracle.
    * events.event_type has 5 values — every join key is a hot key, the
    * worst case for a shuffled equi-join (5 reducer tasks own ALL the
    * data no matter how many run). `innerSalted` spreads each hot key
    * over 8 salt buckets: the big side salts deterministically, the
    * small side replicates ×8, and the shuffle key becomes
    * (event_type, __salt) — 40 evenly-sized tasks. At THIS scale a
    * broadcast would of course win (the dim is 5 rows); the registered
    * query pins the salted shape because it's the one that survives
    * when the enrichment side is itself too big to broadcast and AQE's
    * runtime splitting needs a static escape hatch (SURVEY §4).
    * Salted inner join ≡ plain inner join, so the oracle is plain SQL. */
  private val skewedEnrich = Q(
    "q88_skewed_enrich",
    (s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select($"event_id", $"event_type", $"value")
      val typeStats = T.events(s, d).groupBy($"event_type")
        .agg(avg($"value").as("type_avg"), count(lit(1)).as("type_n"))
      graft.operators.SkewedJoin
        .innerSalted(ev, typeStats, Seq("event_type"), buckets = 8)
        .select($"event_id", $"event_type",
          ($"value" / $"type_avg").as("value_ratio"), $"type_n")
    },
    Some("""WITH ts AS (SELECT event_type, avg(value) AS type_avg,
          count(*) AS type_n FROM events GROUP BY 1)
      SELECT e.event_id, e.event_type, e.value / t.type_avg AS value_ratio,
        t.type_n
      FROM events e JOIN ts t USING (event_type)"""))

  /** Incremental profile maintenance — the pattern that makes a 100 TB
    * pipeline affordable day over day: instead of reprocessing all
    * history, yesterday's pre-aggregated profiles full-outer-merge
    * with today's delta partition. The aggregate state here
    * (min/max/count/sum) is a commutative monoid, so
    * merge(profile(base), profile(delta)) ≡ profile(base ∪ delta) —
    * and the ORACLE enforces exactly that law: the Spark side computes
    * the split-and-merge, the DuckDB side the single-pass batch
    * recompute. Split point: 2024-01-16T00Z (mid-corpus). Same shape
    * as the reference's DeviceProfile merge monoid (A1,
    * `transforms/DeviceProfiles.java`), generalized to event rollups. */
  private val incrementalMerge = Q(
    "q90_incremental_merge",
    (s, d) => {
      import s.implicits._
      val cutoffUs = 1705363200000000L // 2024-01-16T00:00:00Z in epoch µs
      val ev = T.events(s, d)
        .select($"user_id", unix_micros($"ts").as("us"), $"event_type", $"value")
      def prof(df: org.apache.spark.sql.DataFrame) = df.groupBy($"user_id").agg(
        min($"us").as("first_at"), max($"us").as("last_at"),
        count(lit(1)).as("n_events"),
        sum(when($"event_type" === "purchase", $"value").otherwise(0.0))
          .as("purchase_value"))
      val base = prof(ev.filter($"us" < cutoffUs))
      val delta = prof(ev.filter($"us" >= cutoffUs)).select(
        $"user_id", $"first_at".as("d_first"), $"last_at".as("d_last"),
        $"n_events".as("d_n"), $"purchase_value".as("d_pv"))
      base.join(delta, Seq("user_id"), "full")
        .select($"user_id",
          least($"first_at", $"d_first").as("first_at"), // least/greatest skip nulls
          greatest($"last_at", $"d_last").as("last_at"),
          (coalesce($"n_events", lit(0L)) + coalesce($"d_n", lit(0L))).as("n_events"),
          (coalesce($"purchase_value", lit(0.0)) + coalesce($"d_pv", lit(0.0)))
            .as("purchase_value"))
    },
    Some("""SELECT user_id, min(epoch_us(ts)) AS first_at,
        max(epoch_us(ts)) AS last_at, count(*) AS n_events,
        sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS purchase_value
      FROM events GROUP BY user_id"""))

  /** Re-aggregatable sketch store — the pattern that makes distinct
    * counts affordable at 100 TB: per-day HLL sketches are
    * materialized ONCE (a binary column in parquet, ~KB/day), and any
    * date-range question is answered by UNIONING the sketches
    * (`hll_union_agg`) — 30 tiny rows instead of a rescan of 30 days
    * of raw events. The raw-scan exact count here is the ORACLE
    * ANCHOR, not the production path; the hash-checkable output is
    * q07's trick — exact anchor + a bound verdict on the estimate
    * (|est − exact| ≤ 5%·exact, the default-precision envelope), so
    * sketch-register differences between engines can't flake the
    * gate. Day sketches survive a parquet round-trip (write + re-read
    * of the binary column is part of the query — the STORE is real). */
  private val sketchStore = Q(
    "q104_sketch_store",
    (s, d) => {
      import s.implicits._
      val lo = lit("2024-01-10").cast("date")
      val hi = lit("2024-01-20").cast("date")
      val ev = T.events(s, d).select(to_date($"ts").as("dt"), $"user_id")
      val dir = s.conf.get("spark.sql.warehouse.dir") + "/graft_q104_daily_sketches"
      ev.groupBy($"dt").agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
        .write.mode("overwrite").parquet(dir)
      val merged = s.read.schema("dt date, sk binary").parquet(dir)
        .filter($"dt".between(lo, hi))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
          count(lit(1)).as("n_days_merged"))
      val exact = ev.filter($"dt".between(lo, hi))
        .agg(countDistinct($"user_id").as("exact_users"))
      exact.crossJoin(broadcast(merged))
        .select($"exact_users", $"n_days_merged",
          (abs($"est" - $"exact_users") <= lit(0.05) * $"exact_users")
            .as("bound_ok"))
    },
    Some("""SELECT count(DISTINCT user_id) AS exact_users,
      count(DISTINCT CAST(ts AS DATE)) AS n_days_merged,
      true AS bound_ok
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'"""))

  /** Daily ingest-anomaly report: per-day event volume scored
    * against its own TRAILING 7-day window (mean/stddev EXCLUDE the
    * current day — a spike must not normalize itself), |z| > 3
    * flagged — the feed-health monitor that pages before a
    * half-broken scraper poisons a week of corpus. One
    * map-side-combined day aggregate, DENSIFIED against the min→max
    * calendar (q83's gap-fill pattern) so the trailing window is 7
    * CALENDAR days, not 7 days-that-had-events — and so a total
    * outage day exists as an n_events = 0 row the z-score can flag,
    * instead of being invisible to the monitor it most needs to
    * page. Then windows over the ≤ #days aggregated rows (the
    * q31-style post-aggregate global window); nothing event-sized
    * passes the first exchange. Warm-up days (fewer than 3 trailing
    * points) emit NULL z — not-yet-scorable is distinct from
    * normal — but is_anomalous is explicitly FALSE there (a monitor
    * must answer flag/no-flag, never NULL). Zero-variance trailing
    * windows (7 identical days — a constant-zero outage then
    * recovery is the canonical page-worthy case) leave z NULL (the
    * score is undefined) yet flag is_anomalous whenever the day
    * deviates from the constant at all: ANY change after a flat week
    * is infinite sigmas. */
  private val ingestAnomaly = Q(
    "q134_ingest_anomaly",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val counts = T.events(s, d)
        .groupBy(date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val cal = counts.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      // identity day-rollup after the calendar join: days are unique,
      // so max == the value — but it re-roots the trailing windows on
      // an Aggregate over <= #days rows, which is what PlanShapeSpec's
      // bounded-global-window walk (correctly) demands proof of; the
      // join output alone reads as unbounded to the tripwire
      val daily = cal.join(counts, Seq("day"), "left")
        .groupBy($"day")
        .agg(max(coalesce($"n", lit(0L))).as("n_events"))
      val trail = Window.orderBy($"day").rowsBetween(-7, -1)
      daily
        .withColumn("trail_n", count($"n_events").over(trail))
        .withColumn("trail_mean", avg($"n_events").over(trail))
        .withColumn("trail_std", stddev_samp($"n_events").over(trail))
        .withColumn("z", when($"trail_n" >= 3,
          ($"n_events" - $"trail_mean") / nullif($"trail_std", lit(0.0))))
        .select(unix_micros($"day").as("day_us"), $"n_events",
          $"trail_n", $"trail_mean", $"z",
          when($"trail_n" < 3, lit(false))
            .when($"trail_std" === 0.0, $"n_events" =!= $"trail_mean")
            .otherwise(abs($"z") > 3)
            .as("is_anomalous"))
    },
    Some("""WITH counts AS (
        SELECT date_trunc('day', ts) AS day, count(*) AS n
        FROM events GROUP BY 1),
      bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM counts),
      cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
              FROM bounds),
      daily AS (SELECT cal.day, CAST(coalesce(n, 0) AS BIGINT) AS n_events
                FROM cal LEFT JOIN counts ON cal.day = counts.day),
      t AS (SELECT day, n_events,
        count(n_events) OVER w AS trail_n,
        avg(n_events) OVER w AS trail_mean,
        stddev_samp(n_events) OVER w AS trail_std
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT epoch_us(day) AS day_us, n_events, trail_n, trail_mean,
        CASE WHEN trail_n >= 3
             THEN (n_events - trail_mean) / nullif(trail_std, 0) END AS z,
        CASE WHEN trail_n < 3 THEN false
             WHEN trail_std = 0 THEN n_events <> trail_mean
             ELSE abs((n_events - trail_mean) / trail_std) > 3 END
          AS is_anomalous
      FROM t"""))

  /** Per-user behavioral entropy: Shannon entropy (nats) of each
    * user's event-type distribution, plus the dominant type — the
    * statistical complement of the reference's RULE-based suspicious
    * -ID classification (J1, `SuspiciousIDs.java`): a scripted bot
    * hammers one event type (entropy → 0) while organic users mix
    * types; flagging joins thresholds the score instead of
    * hand-tuning count cutoffs. Scale shape: one (user, type)
    * aggregate — the key space is users × ~4 types — then ONE
    * per-user aggregate: the algebraic identity
    * H = ln(n) − (Σ c·ln c)/n removes any need for per-row
    * probabilities, so no window and no second pass over the counts
    * frame (the round-9 review's simplification — the p·ln p
    * formulation forced a per-user window just to get n onto each
    * row). ln is natural log in both engines; the 0·ln 0 limit is
    * handled by construction (a type a user never fires is absent
    * from the group, not a zero row). */
  private val userEntropy = Q(
    "q135_user_entropy",
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("c"))
        .groupBy($"user_id")
        .agg(sum($"c").as("n_events"),
          count(lit(1)).as("n_types"),
          // deterministic dominant type: zero-padded count then type
          // name lexicographically — identical tie-break both engines
          max_by($"event_type",
            concat(lpad($"c".cast("string"), 20, "0"), $"event_type"))
            .as("dominant_type"),
          sum($"c" * log($"c")).as("__clc"))
        .withColumn("entropy",
          log($"n_events") - $"__clc" / $"n_events")
        .withColumn("is_low_entropy", $"entropy" < 0.5)
        .drop("__clc")
    },
    Some("""WITH c AS (SELECT user_id, event_type, count(*) AS c
               FROM events GROUP BY 1, 2),
      g AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
              count(*) AS n_types,
              arg_max(event_type, lpad(CAST(c AS VARCHAR), 20, '0') || event_type)
                AS dominant_type,
              sum(c * ln(c)) AS clc
            FROM c GROUP BY user_id)
      SELECT user_id, n_events, n_types, dominant_type,
        ln(n_events) - clc / n_events AS entropy,
        ln(n_events) - clc / n_events < 0.5 AS is_low_entropy
      FROM g"""))

  def qs: Seq[Q] = Seq(fullOuterMerge, statsBattery, groupingSets,
    stratifiedSample, decimalAgg, gapFill, histogram, sketchTopK, funnel,
    retention, skewedEnrich, incrementalMerge, sketchStore, ingestAnomaly,
    userEntropy)
}
