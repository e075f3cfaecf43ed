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

  def qs: Seq[Q] = Seq(fullOuterMerge, statsBattery, groupingSets,
    stratifiedSample, decimalAgg)
}
